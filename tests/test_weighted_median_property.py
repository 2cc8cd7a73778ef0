"""Property test: the histogram-descent weighted median equals the
brute-force definition (smallest value whose cumulative weight reaches
⌈total/2⌉) on adversarial random inputs — all-equal values, single
rows, huge weights, negative values, multi-group mixes.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gravity_spark.queries import weighted_median_groups


def brute(rows):
    by_flag = {}
    for f, c, w in rows:
        by_flag.setdefault(f, []).append((c, w))
    out = []
    for f in sorted(by_flag):
        vals = sorted(by_flag[f])
        tot = sum(w for _, w in vals)
        k = (tot + 1) // 2
        cum = 0
        for c, w in vals:
            cum += w
            if cum >= k:
                out.append((f, tot, c))
                break
    return out


row = st.tuples(
    st.sampled_from(["A", "B"]),
    st.integers(min_value=-(10**7), max_value=10**7),
    st.integers(min_value=1, max_value=10**6),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=1, max_size=40))
def test_descent_matches_bruteforce(spark, rows):
    t = spark.createDataFrame(rows, "flag string, c long, w long")
    assert weighted_median_groups(t) == brute(rows)


def test_descent_single_value_group(spark):
    t = spark.createDataFrame([("X", 42, 7)], "flag string, c long, w long")
    assert weighted_median_groups(t) == [("X", 7, 42)]


def test_descent_all_equal_values(spark):
    t = spark.createDataFrame(
        [("X", 5, i + 1) for i in range(10)], "flag string, c long, w long"
    )
    assert weighted_median_groups(t) == [("X", 55, 5)]
