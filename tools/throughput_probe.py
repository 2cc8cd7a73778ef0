"""CDC pipeline throughput probe — the reference's headline metric
(rows/sec through input → filter chain → ordered merge sink).

Pumps the sf events table through the full streaming path (envelope
adapter → filter chain → LWW collapse → merge target) and reports
end-to-end rows/sec. Usage:

    python tools/throughput_probe.py [sf_dir] [multiplier]

A multiplier N > 1 replicates the events file N× (hard links in a temp
dir) so the single trigger processes N× the rows — separating the fixed
micro-batch startup cost (~3 s, amortized away at scale) from the
marginal per-row cost, which is the number that extrapolates to a real
cluster. The copies are exact replicas, so the LWW collapse sees N
changes per (key, seq) — the worst case for the collapse window — and
the merged key set stays identical to the 1× run (idempotence check).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gravity_spark.core.envelope import events_to_changes
from gravity_spark.queries import T
from gravity_spark.session import get_spark
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
from gravity_spark.streaming.pipeline import run_stream
from gravity_spark.operators.filters import apply_filter_chain


def run_probe(spark, sf_dir: str, mult: int = 1) -> dict:
    """One full pipeline pass; returns the result record (also the
    shape printed by the CLI). Reusable by tools/throughput_gate.py."""
    n_rows = T(spark, sf_dir, "events").count()

    src_dir = sf_dir
    if mult > 1:
        import os
        import shutil

        src_dir = tempfile.mkdtemp(prefix="throughput_in_")
        for i in range(mult):
            dst = f"{src_dir}/events_{i:03d}.parquet"
            try:
                os.link(f"{sf_dir}/events.parquet", dst)
            except OSError:  # cross-device temp dir: fall back to a copy
                shutil.copyfile(f"{sf_dir}/events.parquet", dst)
        n_rows *= mult

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events*.parquet")
        .load(src_dir)
    )
    for f_ in stream.schema.fields:
        if f_.name == "ts" and f_.dataType.simpleString() == "bigint":
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    changes = apply_filter_chain(
        events_to_changes(stream),
        [{"type": "accept", "config": {"match-schema": "app"}}],
    )

    tmp = tempfile.mkdtemp(prefix="throughput_")
    target = ParquetMergeTarget(
        spark, f"{tmp}/target", ["user_id"], "user_id long, value double"
    )

    def typed(df):
        return df.select(
            F.col("pks")["user_id"].cast("long").alias("user_id"),
            F.col("data")["value"].cast("double").alias("value"),
            "op",
            "seq",
        )

    from gravity_spark.queries import _stream_conf

    t0 = time.time()
    with _stream_conf(spark):
        q = run_stream(changes, target, typed, f"{tmp}/ckpt", trigger_once=True)
        q.awaitTermination(600)
    elapsed = time.time() - t0
    out_rows = target.read().count()

    result = {
        "metric": "cdc_pipeline_rows_per_sec",
        "value": round(n_rows / elapsed, 1),
        "unit": "rows/sec",
        "input_rows": n_rows,
        "merged_keys": out_rows,
        "elapsed_sec": round(elapsed, 2),
        "sf_dir": sf_dir,
    }
    import shutil

    if src_dir != sf_dir:
        shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return result


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("throughput_probe")
    print(json.dumps(run_probe(spark, sf_dir, mult)))


if __name__ == "__main__":
    main()
