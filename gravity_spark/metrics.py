"""Metrics parity: the reference's Prometheus contract on Spark observability.

Reference metrics contract (BASELINE.md §2; pkg/metrics/metrics.go:20-132):
input/emitter/scheduler/output counters + latency histograms, queue
lengths, end-to-end lag. Spark equivalents:

| gravity metric                 | here                                  |
|--------------------------------|---------------------------------------|
| gravity_input_counter          | df.observe("input", count, per-op)    |
| gravity_output_counter         | observe on the sink-side frame        |
| stage histograms               | StreamingQueryProgress.durationMs     |
| queue length / sliding window  | progress.numInputRows / states        |
| end-to-end lag                 | progress.eventTime & batchDuration    |
| watermark health (60 s)        | streaming.pipeline.watermark_lag_listener |

``observe()`` aggregates ride the existing job — zero extra passes over
the data, which is the only acceptable cost at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_input(df: DataFrame, name: str = "input") -> tuple[DataFrame, Observation]:
    """Attach input-side counters (rows, per-op rows, event-time max) —
    the gravity_input_counter label set (msg type/op)."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(F.col("op") == "update", 1).otherwise(0)).alias("n_update"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_delete"),
        F.max("ts").alias("max_event_time"),
    )
    return observed, obs


def observe_output(df: DataFrame, name: str = "output") -> tuple[DataFrame, Observation]:
    obs = Observation(name)
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    return observed, obs


def progress_snapshot(query) -> dict:
    """Flatten a StreamingQuery's lastProgress into the reference's
    metric names (scheduler/output histograms ≈ durationMs stages)."""
    p = query.lastProgress
    if p is None:
        return {}
    if hasattr(p, "json"):  # Spark 4 returns an object
        import json as _json

        p = _json.loads(p.json)
    return {
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "input_rows_per_second": p.get("inputRowsPerSecond"),
        "process_rows_per_second": p.get("processedRowsPerSecond"),
        "duration_ms": p.get("durationMs", {}),
        "event_time": p.get("eventTime", {}),
        "state_operators": p.get("stateOperators", []),
    }
