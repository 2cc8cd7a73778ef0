"""Regression: the oracle checker must catch DuckDB result-type widening.

Round-1 driver hash failures (q12/q18/sessionization) were caused by
DuckDB widening sum(int) → HUGEINT and epoch() → DOUBLE while Python
value comparison (int128 == int64) masked it.  `type_mismatches` makes
tools/check_oracle.py type-strict so the class can't recur.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

import duckdb
import pytest

from check_oracle import spark_to_duck, type_mismatches


def test_hugeint_oracle_is_fatal():
    fatal, warn = type_mismatches(
        [("n", "bigint")], [("n", "HUGEINT")]
    )
    assert fatal == [("n", "bigint", "HUGEINT")]
    assert not warn


def test_epoch_double_vs_bigint_is_fatal():
    fatal, _ = type_mismatches([("e", "bigint")], [("e", "DOUBLE")])
    assert fatal == [("e", "bigint", "DOUBLE")]


def test_int_width_variants_warn_not_fail():
    fatal, warn = type_mismatches([("n", "bigint")], [("n", "INTEGER")])
    assert not fatal
    assert warn == [("n", "bigint", "INTEGER")]


def test_timestamp_unit_variants_warn_not_fail():
    fatal, warn = type_mismatches(
        [("ts", "timestamp")], [("ts", "TIMESTAMP WITH TIME ZONE")]
    )
    assert not fatal
    assert warn


def test_exact_match_is_silent():
    fatal, warn = type_mismatches(
        [("a", "bigint"), ("b", "double"), ("c", "string"), ("d", "date")],
        [("a", "BIGINT"), ("b", "DOUBLE"), ("c", "VARCHAR"), ("d", "DATE")],
    )
    assert not fatal and not warn


def test_array_and_decimal_mapping():
    assert spark_to_duck("array<double>") == "DOUBLE[]"
    assert spark_to_duck("array<bigint>") == "BIGINT[]"
    assert spark_to_duck("decimal(18,2)") == "DECIMAL(18,2)"
    assert spark_to_duck("struct<a:int>") is None  # unchecked, not a crash
    fatal, _ = type_mismatches([("xs", "array<bigint>")], [("xs", "HUGEINT[]")])
    assert fatal


@pytest.mark.parametrize(
    "expr,spark_dtype,should_fail",
    [
        ("sum(1)", "bigint", True),        # HUGEINT widening — the round-1 bug
        ("CAST(sum(1) AS BIGINT)", "bigint", False),
        ("epoch(DATE '2020-01-01')", "bigint", True),   # DOUBLE vs BIGINT
        ("CAST(epoch(DATE '2020-01-01') AS BIGINT)", "bigint", False),
    ],
)
def test_live_duckdb_describe(expr, spark_dtype, should_fail):
    con = duckdb.connect()
    desc = con.execute(f"DESCRIBE SELECT {expr} AS v").fetchall()
    fatal, _ = type_mismatches([("v", spark_dtype)], [(d[0], d[1]) for d in desc])
    assert bool(fatal) == should_fail


def test_every_registered_oracle_is_widening_free():
    """DESCRIBE every registered oracle against sf0.001 views: no column a
    registered Spark query would emit as an integer may widen to
    HUGEINT/UHUGEINT.  (Full Spark-vs-DuckDB dtype check runs in
    tools/check_oracle.py; this guards the DuckDB side cheaply.)"""
    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import oracle_sql

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    offenders = {}
    for name, sql in oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # non-describable (e.g. multi-statement) — covered elsewhere
        wide = [(d[0], d[1]) for d in desc if "HUGEINT" in d[1]]
        if wide:
            offenders[name] = wide
    assert not offenders, f"HUGEINT-widened oracles: {offenders}"
