import json
import os

from pyspark.sql import functions as F

from gravity_spark.core.envelope import MSG_SCHEMA
from gravity_spark.plans.pipeline import build_pipeline
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
from gravity_spark.streaming.pipeline import (
    file_cdc_source,
    run_stream,
    two_stage_replication,
)


def _write_envelope_json(path: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"part-{len(os.listdir(path))}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _typed(changes):
    return changes.select(
        F.col("data").getItem("id").cast("long").alias("id"),
        F.col("data").getItem("v").cast("string").alias("v"),
        "op",
        "seq",
    )


def _env(op, id_, v, seq):
    return {
        "type": "dml", "database": "app", "table": "t", "op": op,
        "data": {"id": str(id_), "v": v}, "pks": {"id": str(id_)},
        "stream_key": "s0", "seq": seq,
    }


def test_file_cdc_stream_merge(spark, tmp_path):
    src = str(tmp_path / "cdc")
    _write_envelope_json(src, [
        _env("insert", 1, "a", 1),
        _env("insert", 2, "b", 2),
        _env("update", 1, "a2", 3),
    ])
    target = ParquetMergeTarget(spark, str(tmp_path / "tgt"), ["id"], "id long, v string")
    changes = file_cdc_source(spark, src)
    q = run_stream(changes, target, _typed, str(tmp_path / "ckpt"))
    q.processAllAvailable()

    state = {r["id"]: r["v"] for r in target.read().collect()}
    assert state == {1: "a2", 2: "b"}

    # second micro-batch: delete + insert
    _write_envelope_json(src, [_env("delete", 2, "b", 4), _env("insert", 3, "c", 5)])
    q.processAllAvailable()
    q.stop()
    state = {r["id"]: r["v"] for r in target.read().collect()}
    assert state == {1: "a2", 3: "c"}


def test_two_stage_replication(spark, tmp_path):
    # snapshot has rows 1,2; stream replays an overlapping update + new row
    snapshot = spark.createDataFrame([(1, "s1"), (2, "s2")], "id long, v string")
    src = str(tmp_path / "cdc2")
    _write_envelope_json(src, [
        _env("update", 2, "s2-new", 10),
        _env("insert", 4, "d", 11),
    ])
    target = ParquetMergeTarget(spark, str(tmp_path / "tgt2"), ["id"], "id long, v string")
    changes = file_cdc_source(spark, src)
    q = two_stage_replication(
        spark, snapshot, changes, target, _typed, str(tmp_path / "ckpt2")
    )
    q.processAllAvailable()
    q.stop()
    state = {r["id"]: r["v"] for r in target.read().collect()}
    assert state == {1: "s1", 2: "s2-new", 4: "d"}


def test_merge_sink_idempotent_epoch(spark, tmp_path):
    # redelivery of the same batch must not change state (exactly-once)
    target = ParquetMergeTarget(spark, str(tmp_path / "tgt3"), ["id"], "id long, v string")
    batch = spark.createDataFrame(
        [(1, "a", "insert", 1), (2, "b", "insert", 2)],
        "id long, v string, op string, seq long",
    )
    target.apply_batch(batch, epoch_id=0)
    before = sorted((r["id"], r["v"]) for r in target.read().collect())
    target.apply_batch(batch, epoch_id=0)  # redelivered
    after = sorted((r["id"], r["v"]) for r in target.read().collect())
    assert before == after == [(1, "a"), (2, "b")]


def test_pipeline_config_batch(spark, tmp_path):
    cfg = {
        "input": {
            "type": "memory-batch",
            "config": {
                "rows": [
                    {"database": "app", "table": "users", "op": "insert",
                     "data": {"id": 1, "v": "x"}, "pks": {"id": 1}, "seq": 1},
                    {"database": "app", "table": "skipme", "op": "insert",
                     "data": {"id": 9, "v": "y"}, "pks": {"id": 9}, "seq": 2},
                ]
            },
        },
        "filters": [
            {"type": "accept", "config": {"match-table": "users"}},
        ],
        "output": {
            "type": "parquet-merge",
            "routes": [
                {"match-schema": "app", "target-schema": "warehouse"},
            ],
            "config": {
                "path": str(tmp_path / "tgt4"),
                "pk": ["id"],
                "schema": "id long, v string",
            },
        },
    }
    p = build_pipeline(spark, cfg)
    assert not p.is_streaming
    p.run_batch()
    rows = [(r["id"], r["v"]) for r in p.target.read().collect()]
    assert rows == [(1, "x")]


def test_pipeline_toml_roundtrip(spark, tmp_path):
    toml = f"""
[input]
type = "file-cdc"
[input.config]
path = "{tmp_path}/cdc5"

[[filters]]
type = "accept"
[filters.config]
"match-dml-op" = ["insert", "update", "delete"]

[output]
type = "parquet-merge"
[output.config]
path = "{tmp_path}/tgt5"
pk = ["id"]
schema = "id long, v string"
"""
    tp = tmp_path / "pipeline.toml"
    tp.write_text(toml)
    from gravity_spark.plans.pipeline import load_pipeline

    _write_envelope_json(str(tmp_path / "cdc5"), [_env("insert", 7, "z", 1)])
    p = load_pipeline(spark, str(tp))
    assert p.is_streaming
    q = p.start_stream()
    q.processAllAvailable()
    q.stop()
    assert [(r["id"], r["v"]) for r in p.target.read().collect()] == [(7, "z")]


def test_pipeline_kafka_wire_output(spark):
    import json as _json

    cfg = {
        "input": {
            "type": "memory-batch",
            "config": {
                "rows": [
                    {"database": "app", "table": "t", "op": "insert",
                     "data": {"id": 1}, "pks": {"id": 1}, "seq": 1},
                ]
            },
        },
        "output": {"type": "kafka-wire", "config": {"version": "0.1"}},
    }
    p = build_pipeline(spark, cfg)
    wire = p.dataframe().collect()
    assert set(wire[0].asDict()) == {"key", "value"}
    assert _json.loads(wire[0]["value"])["type"] == "insert"


def test_pipeline_multi_table_output(spark, tmp_path):
    cfg = {
        "input": {
            "type": "memory-batch",
            "config": {
                "rows": [
                    {"database": "app", "table": "users", "op": "insert",
                     "data": {"id": 1, "name": "a"}, "pks": {"id": 1}, "seq": 1},
                    {"database": "app", "table": "orders", "op": "insert",
                     "data": {"id": 7, "amt": "3.5"}, "pks": {"id": 7}, "seq": 2},
                ]
            },
        },
        "output": {
            "type": "multi-table-merge",
            "config": {
                "path": str(tmp_path / "warehouse"),
                "tables": [
                    {"database": "app", "table": "users",
                     "columns": [{"name": "id", "type": "bigint", "pk": True},
                                 {"name": "name", "type": "varchar(50)"}]},
                    {"database": "app", "table": "orders",
                     "columns": [{"name": "id", "type": "bigint", "pk": True},
                                 {"name": "amt", "type": "double"}]},
                ],
            },
        },
    }
    p = build_pipeline(spark, cfg)
    p.run_batch()
    users = {r["id"]: r["name"] for r in p.target.read("app", "users").collect()}
    orders = {r["id"]: r["amt"] for r in p.target.read("app", "orders").collect()}
    assert users == {1: "a"}
    assert orders == {7: 3.5}
