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


def test_bidirectional_pipelines_converge_zero_echo(spark, tmp_path):
    """Two REAL streaming pipelines A⇄B with origin tagging: each side
    tails its own binlog dir, applies inbound rows from the other, and
    forwards only rows not originated by the destination
    (integration_test/mysql_mysql_test.go bidirection cases). Writes on
    both sides interleave in seq; sides write disjoint keys (the
    standard bidirection deployment assumption — same-key cross-site
    conflicts are the conflict-detect engine's job). After the second
    forward hop nothing echoes and both targets converge."""
    import json as _json

    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
    from gravity_spark.streaming.pipeline import file_cdc_source, run_stream

    binlog = {"A": tmp_path / "binlog_a", "B": tmp_path / "binlog_b"}
    for d in binlog.values():
        d.mkdir()

    def append(side, rows):
        d = binlog[side]
        with open(d / f"p{len(list(d.iterdir()))}.json", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def row(op, _id, v, seq, origin=None):
        data = {"id": str(_id), "v": v}
        if origin:
            data["_origin"] = origin
        return {"type": "dml", "database": "app", "table": "t", "op": op,
                "data": data, "pks": {"id": str(_id)},
                "stream_key": "s", "seq": seq}

    def typed(df):
        return df.select(
            F.col("data")["id"].cast("long").alias("id"),
            F.col("data")["v"].alias("v"),
            "op", "seq",
        )

    targets = {
        s: ParquetMergeTarget(spark, str(tmp_path / f"tgt_{s}"), ["id"],
                              "id long, v string")
        for s in ("A", "B")
    }
    queries = {
        s: run_stream(file_cdc_source(spark, str(binlog[s])), targets[s],
                      typed, str(tmp_path / f"ck_{s}"))
        for s in ("A", "B")
    }

    forwarded_upto = {"A": 0, "B": 0}

    def forward(src, dst):
        """Tail src's binlog from the last forwarded offset; drop rows
        originated by dst (loop suppression), tag the rest with src."""
        rows = []
        for p in sorted(binlog[src].iterdir()):
            rows += [_json.loads(ln) for ln in p.read_text().splitlines()]
        new = rows[forwarded_upto[src]:]
        forwarded_upto[src] = len(rows)
        out = [r for r in new if r["data"].get("_origin") != dst]
        dropped = len(new) - len(out)
        for r in out:
            r["data"]["_origin"] = src
        if out:
            append(dst, out)
        return len(out), dropped

    # epoch 1: interleaved-seq local writes — A owns ids 1-2, B ids 3-4
    append("A", [row("insert", 1, "a1", 1), row("insert", 2, "a2", 3),
                 row("update", 1, "a1b", 5)])
    append("B", [row("insert", 3, "b3", 2), row("insert", 4, "b4", 4),
                 row("delete", 4, None, 6)])
    for q in queries.values():
        q.processAllAvailable()

    # hop 1: A forwards its 3 fresh local rows; by the time B's
    # forwarder runs, B's binlog already holds those 3 A-tagged inbound
    # rows — the suppression drops them on B's very first hop
    sent_ab, dropped_ab = forward("A", "B")
    sent_ba, dropped_ba = forward("B", "A")
    assert (sent_ab, dropped_ab) == (3, 0)
    assert (sent_ba, dropped_ba) == (3, 3)
    for q in queries.values():
        q.processAllAvailable()

    # hop 2: the remaining inbound segment on A is fully B-tagged →
    # zero echo anywhere, and the mesh is quiescent
    sent_ab2, dropped_ab2 = forward("A", "B")
    sent_ba2, dropped_ba2 = forward("B", "A")
    assert (sent_ab2, dropped_ab2) == (0, 3)
    assert (sent_ba2, dropped_ba2) == (0, 0)
    for q in queries.values():
        q.processAllAvailable()
        q.stop()

    state = {
        s: {r["id"]: r["v"] for r in targets[s].read().collect()}
        for s in ("A", "B")
    }
    assert state["A"] == state["B"] == {1: "a1b", 2: "a2", 3: "b3"}
