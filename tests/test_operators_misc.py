import datetime as dt

from pyspark.sql import functions as F

from gravity_spark.core.envelope import (
    events_to_changes,
    from_canal_json,
    from_debezium_json,
    with_dep_hash,
)
from gravity_spark.operators.asof import asof_join
from gravity_spark.operators.router import route
from gravity_spark.sources.batch import (
    chunked_scan,
    detect_scan_column,
    scan_bounds,
    snapshot_table,
)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "u1", dt.datetime(2024, 1, 1, 10)), (2, "u1", dt.datetime(2024, 1, 1, 12)),
         (3, "u2", dt.datetime(2024, 1, 1, 9))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "u1", dt.datetime(2024, 1, 1, 9)), (11, "u1", dt.datetime(2024, 1, 1, 11)),
         (12, "u2", dt.datetime(2024, 1, 1, 9, 30))],
        "rid long, k string, rts timestamp",
    )
    out = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid"
    ).collect()}
    assert out == {1: 10, 2: 11, 3: None}


def test_asof_join_inclusive_and_ties(spark):
    left = spark.createDataFrame([(1, "k", dt.datetime(2024, 1, 1, 10))],
                                 "lid long, k string, lts timestamp")
    right = spark.createDataFrame(
        [(5, "k", dt.datetime(2024, 1, 1, 10)), (4, "k", dt.datetime(2024, 1, 1, 10))],
        "rid long, k string, rts timestamp",
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid")
    assert out.collect()[0]["rid"] == 5  # inclusive bound, highest id wins


def test_route_first_match_wins(spark):
    from gravity_spark.core.envelope import memory_changes

    df = memory_changes(spark, [
        {"database": "app", "table": "users", "op": "insert",
         "data": {"id": 1}, "pks": {"id": 1}, "seq": 1},
        {"database": "app", "table": "other", "op": "insert",
         "data": {"id": 2}, "pks": {"id": 2}, "seq": 2},
        {"database": "x", "table": "users", "op": "insert",
         "data": {"id": 3}, "pks": {"id": 3}, "seq": 3},
    ])
    routed = route(df, [
        {"match-schema": "app", "match-table": "users", "target-table": "users_v2"},
        {"match-schema": "app", "target-schema": "catchall"},
    ])
    rows = {r["seq"]: (r["database"], r["table"]) for r in routed.collect()}
    assert rows[1] == ("app", "users_v2")   # first route wins
    assert rows[2] == ("catchall", "other")
    assert 3 not in rows                    # unrouted rows dropped


def test_detect_scan_column():
    assert detect_scan_column(["id"], [], 10**9) == "id"
    assert detect_scan_column(["a", "b"], [["email"]], 10**9) == "email"
    assert detect_scan_column([], [["a", "b"]], 100) is None
    try:
        detect_scan_column([], [], 10**9)
        raise AssertionError("should raise")
    except ValueError:
        pass


def test_chunked_scan_positions(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    lo, hi = scan_bounds(df, "k")
    assert (lo, hi) == (0, 99)
    rows, positions = snapshot_table(df, "k", chunk_size=30)
    pos = {r["chunk_id"]: (r["n_rows"], r["min_key"], r["max_key"]) for r in positions.collect()}
    assert pos == {0: (30, 0, 29), 1: (30, 30, 59), 2: (30, 60, 89), 3: (10, 90, 99)}


def test_dep_hash_same_key_same_partition(spark):
    from gravity_spark.core.envelope import memory_changes

    df = memory_changes(spark, [
        {"database": "d", "table": "t", "op": "insert", "data": {"id": 1},
         "pks": {"id": 1}, "seq": 1},
        {"database": "d", "table": "t", "op": "update", "data": {"id": 1},
         "pks": {"id": 1}, "seq": 2},
        {"database": "d", "table": "t", "op": "update", "data": {"id": 2},
         "pks": {"id": 2}, "seq": 3},
    ])
    hashes = [r["dep_hash"] for r in with_dep_hash(df).orderBy("seq").collect()]
    assert hashes[0] == hashes[1] != hashes[2]


def test_debezium_decoder(spark):
    raw = spark.createDataFrame(
        [
            ('{"before": null, "after": {"id": "1", "v": "a"}, '
             '"source": {"db": "app", "table": "t", "ts_ms": 1700000000000}, '
             '"op": "c", "ts_ms": 1700000000001}',),
            ('{"before": {"id": "2", "v": "b"}, "after": null, '
             '"source": {"db": "app", "table": "t", "ts_ms": 1700000000002}, '
             '"op": "d", "ts_ms": 1700000000003}',),
        ],
        "value string",
    )
    out = {r["op"]: r for r in from_debezium_json(raw, pk_cols=["id"]).collect()}
    assert out["insert"]["data"] == {"id": "1", "v": "a"}
    assert out["insert"]["pks"] == {"id": "1"}
    assert out["delete"]["data"] == {"id": "2", "v": "b"}
    assert out["delete"]["database"] == "app"


def test_canal_decoder_explodes_rows(spark):
    raw = spark.createDataFrame(
        [
            ('{"database": "app", "table": "t", "type": "INSERT", "ts": 1700000000000, '
             '"pkNames": ["id"], "isDdl": false, '
             '"data": [{"id": "1", "v": "a"}, {"id": "2", "v": "b"}]}',),
        ],
        "value string",
    )
    rows = from_canal_json(raw).collect()
    assert len(rows) == 2
    assert {r["pks"]["id"] for r in rows} == {"1", "2"}
    assert all(r["op"] == "insert" for r in rows)


def test_events_to_changes_mapping(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10, "signup", 1.0, "{}"),
         (2, dt.datetime(2024, 1, 2), 10, "error", 2.0, "{}"),
         (3, dt.datetime(2024, 1, 3), 11, "click", 3.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    ch = {r["seq"]: r for r in events_to_changes(ev).collect()}
    assert ch[1]["op"] == "insert"
    assert ch[2]["op"] == "delete"
    assert ch[3]["op"] == "update"
    assert ch[3]["pks"] == {"user_id": "11"}


def test_jdbc_scan_options():
    from gravity_spark.sources.batch import jdbc_scan_options

    opts = jdbc_scan_options(
        "jdbc:mysql://h/db", "users", "id", lower=0, upper=10000,
        num_partitions=8, condition="active = 1",
        properties={"user": "u"},
    )
    assert opts["dbtable"] == "(SELECT * FROM users WHERE active = 1) AS t"
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == ("0", "10000", "8")
    assert opts["user"] == "u"
    # keyless full dump: no partition options
    assert "partitionColumn" not in jdbc_scan_options("jdbc:x", "t", None)


def test_glob_matches_fnmatch_property():
    import fnmatch
    import re

    from hypothesis import given, settings, strategies as st

    from gravity_spark.core.matchers import glob_to_regex

    alphabet = "abc*_."

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet, max_size=8), st.text("abc_.", max_size=8))
    def check(pattern, value):
        ours = re.match(glob_to_regex(pattern), value) is not None
        theirs = fnmatch.fnmatchcase(value, pattern)
        assert ours == theirs, (pattern, value)

    check()
