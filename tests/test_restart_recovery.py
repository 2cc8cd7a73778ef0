"""Checkpoint restart: the stream resumes from the checkpoint without
re-applying or losing batches — the sliding-window/position-flush
guarantee (pkg/position_cache/cache.go) expressed as Spark recovery."""

import json


def _write(src, rows):
    import os

    src.mkdir(exist_ok=True)
    with open(src / f"p{len(list(src.iterdir()))}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _env(op, id_, v, seq):
    return {"type": "dml", "database": "app", "table": "t", "op": op,
            "data": {"id": str(id_), "v": v}, "pks": {"id": str(id_)},
            "stream_key": "s0", "seq": seq}


def test_stream_restart_from_checkpoint(spark, tmp_path):
    from pyspark.sql import functions as F

    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
    from gravity_spark.streaming.pipeline import file_cdc_source, run_stream

    src = tmp_path / "cdc"
    ckpt = str(tmp_path / "ckpt")
    target = ParquetMergeTarget(spark, str(tmp_path / "tgt"), ["id"], "id long, v string")

    def typed(df):
        return df.select(
            F.col("data").getItem("id").cast("long").alias("id"),
            F.col("data").getItem("v").alias("v"),
            "op", "seq",
        )

    _write(src, [_env("insert", 1, "a", 1), _env("insert", 2, "b", 2)])
    q1 = run_stream(file_cdc_source(spark, str(src)), target, typed, ckpt)
    q1.processAllAvailable()
    q1.stop()
    v_after_first = target._current_version()

    # new files arrive while the query is DOWN
    _write(src, [_env("update", 1, "a2", 3), _env("delete", 2, "b", 4)])

    # restart a NEW query instance on the same checkpoint + target
    q2 = run_stream(file_cdc_source(spark, str(src)), target, typed, ckpt)
    q2.processAllAvailable()
    q2.stop()

    state = {r["id"]: r["v"] for r in target.read().collect()}
    assert state == {1: "a2"}
    # exactly one more epoch applied (no re-apply of batch 1)
    assert target._current_version() == v_after_first + 1
