"""The exact-integer-division discipline at 100 TB magnitudes.

Every money/ratio query divides a BIGINT via one of two patterns:
  (a) `_int_div`: (x - x%n) run in DECIMAL(38,0) before the divide;
  (b) inline `(x - x % y) / y` with a DOUBLE divide (safe only while
      the QUOTIENT stays < 2^53).
A plain `x / n` would round the long to the nearest double FIRST and
drift from DuckDB's integer `//` once fixed-point sums pass ~9e15 —
exactly what happens at large scale factors. This battery pins both
patterns against Python's exact floor division right up to the int64
edge, property-style (hypothesis) plus adversarial boundaries.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from gravity_spark.queries import _int_div

import pyspark.sql.functions as F

I64 = 2**63 - 1
BOUNDARIES = [
    (2**53 - 1, 7),
    (2**53, 7),
    (2**53 + 1, 7),          # first double-unrepresentable odd integer
    (9_007_199_254_740_993, 1),
    (10**18, 3),
    (I64 - 1, 2),
    (I64, 1),
    (I64, 999_983),
    (123_456_789_012_345_678, 97),
    (0, 5),
]


def _spark_int_div(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, n long")
    # _int_div takes a literal divisor; evaluate per distinct n
    out = {}
    for n in sorted({n for _, n in pairs}):
        part = df.filter(F.col("n") == n).select(
            "x", _int_div(F.col("x"), n).alias("q")
        )
        for r in part.collect():
            out[(r["x"], n)] = r["q"]
    return out


def test_int_div_boundaries_exact(spark):
    got = _spark_int_div(spark, BOUNDARIES)
    for (x, n), q in got.items():
        assert q == x // n, (x, n, q, x // n)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, I64), st.integers(1, 10**9)),
        min_size=1,
        max_size=8,
    )
)
def test_int_div_property(spark, pairs):
    got = _spark_int_div(spark, pairs)
    for (x, n), q in got.items():
        assert q == x // n, (x, n, q, x // n)


def test_plain_double_division_would_drift(spark):
    """Documents WHY the decimal detour exists: the naive long/long
    double division disagrees with floor division past 2^53."""
    x, n = 2**53 + 1, 1
    row = spark.createDataFrame([(x, n)], "x long, n long").select(
        (F.col("x") / F.col("n")).cast("long").alias("naive"),
        _int_div(F.col("x"), n).alias("exact"),
    ).collect()[0]
    assert row["exact"] == x
    assert row["naive"] != x  # double rounds 2^53+1 to 2^53
