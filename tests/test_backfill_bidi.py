from pyspark.sql import functions as F

from gravity_spark.core.envelope import memory_changes
from gravity_spark.operators.backfill import replay_segment, with_seq
from gravity_spark.sinks.wire import filter_own_traffic, tag_origin


def test_replay_segment_repairs_without_regressing(spark):
    # target state was built from seqs {1, 5} but MISSED seqs 2-4
    target = with_seq(
        spark.createDataFrame([(1, "a@1"), (2, "b@5")], "id long, v string"), None
    )
    # row 1 at seq 1, row 2 at seq 5
    target = spark.createDataFrame(
        [(1, "a@1", 1), (2, "b@5", 5)], "id long, v string, __seq long"
    )
    changes = spark.createDataFrame(
        [
            (1, "a@2", "update", 2),   # newer than target's seq 1 → applies
            (2, "b@3", "update", 3),   # older than target's seq 5 → must NOT regress
            (3, "c@4", "insert", 4),   # missing row → restored
        ],
        "id long, v string, op string, seq long",
    )
    out = {r["id"]: (r["v"], r["__seq"]) for r in
           replay_segment(target, changes, ["id"], 2, 5).collect()}
    assert out == {1: ("a@2", 2), 2: ("b@5", 5), 3: ("c@4", 4)}


def test_replay_segment_delete_and_bounds(spark):
    target = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 1)], "id long, v string, __seq long"
    )
    changes = spark.createDataFrame(
        [
            (1, None, "delete", 3),
            (2, "z", "update", 99),  # outside the replayed range → ignored
        ],
        "id long, v string, op string, seq long",
    )
    out = {r["id"]: r["v"] for r in replay_segment(target, changes, ["id"], 0, 10).collect()}
    assert out == {2: "y"}


def test_bidirectional_origin_tagging(spark):
    rows = [
        {"database": "a", "table": "t", "op": "insert",
         "data": {"id": 1}, "pks": {"id": 1}, "seq": 1},
    ]
    forward = tag_origin(memory_changes(spark, rows), origin="dc-east")
    assert forward.collect()[0]["data"]["_origin"] == "dc-east"

    # the reverse pipeline sees its own write come back and drops it...
    assert filter_own_traffic(forward, "dc-east").count() == 0
    # ...but a different pipeline keeps it
    assert filter_own_traffic(forward, "dc-west").count() == 1
    # and untagged (external) traffic always passes
    untagged = memory_changes(spark, rows)
    assert filter_own_traffic(untagged, "dc-east").count() == 1


def test_two_stage_records_positions(spark, tmp_path):
    import json
    import os

    from gravity_spark.core.positions import PositionStore
    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
    from gravity_spark.streaming.pipeline import file_cdc_source, two_stage_replication

    src = tmp_path / "cdc"
    src.mkdir()
    (src / "p0.json").write_text(json.dumps({
        "type": "dml", "database": "app", "table": "t", "op": "insert",
        "data": {"id": "9", "v": "z"}, "pks": {"id": "9"}, "stream_key": "s0", "seq": 10,
    }) + "\n")

    store = PositionStore(str(tmp_path / "pos.json"))
    target = ParquetMergeTarget(spark, str(tmp_path / "tgt"), ["id"], "id long, v string")
    snapshot = spark.createDataFrame([(1, "s1")], "id long, v string")

    def typed(df):
        return df.select(
            F.col("data").getItem("id").cast("long").alias("id"),
            F.col("data").getItem("v").alias("v"),
            "op", "seq",
        )

    q = two_stage_replication(
        spark, snapshot, file_cdc_source(spark, str(src)), target, typed,
        str(tmp_path / "ckpt"), position_store=store, pipeline_name="p1",
        captured_offset={"seq": 10},
    )
    q.processAllAvailable()
    q.stop()
    pos = store.get("p1")
    assert pos["stage"] == "stream" and pos["offset"] == {"seq": 10}
    state = {r["id"]: r["v"] for r in target.read().collect()}
    assert state == {1: "s1", 9: "z"}
