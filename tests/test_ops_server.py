"""Scrape-able ops surface: Prometheus text format + /status + /reset
(cmd/gravity/main.go:95-105; pkg/metrics/metrics.go:20-132)."""

import json
import urllib.request

from gravity_spark.ops_server import (
    EVENT_TIME_BUCKETS,
    INPUT_BUCKETS,
    MetricsRegistry,
    OpsServer,
    exponential_buckets,
)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read().decode(), dict(r.headers)


def test_bucket_layouts_match_reference():
    # prometheus.ExponentialBuckets(0.0005, 2, 15) — metrics.go:39
    assert INPUT_BUCKETS[0] == 0.0005
    assert len(INPUT_BUCKETS) == 15
    assert INPUT_BUCKETS[-1] == 0.0005 * 2**14  # ~8.2 s
    # event-time: 15 doubling buckets then 6 ×8 buckets — metrics.go:124
    assert len(EVENT_TIME_BUCKETS) == 21
    assert EVENT_TIME_BUCKETS[15] == 0.0005 * (1 << 15)
    assert exponential_buckets(1, 10, 3) == [1, 10, 100]


def test_prometheus_text_format_scrape():
    reg = MetricsRegistry()
    reg.input_counter.inc(
        5, pipeline="p1", db="demo", table="users", type="dml", subtype="insert"
    )
    reg.input_counter.inc(
        2, pipeline="p1", db="demo", table="users", type="dml", subtype="delete"
    )
    reg.input_latency.observe(0.0004, pipeline="p1")  # lands in first bucket
    reg.input_latency.observe(100.0, pipeline="p1")   # beyond last → only +Inf
    reg.queue_length.set(42, pipeline="p1", queue="state_rows")

    srv = OpsServer(reg, status_fn=lambda: {"state": "running", "position": "42"}).start()
    try:
        status, body, headers = _get(srv.port, "/metrics")
        assert status == 200
        assert "text/plain" in headers["Content-Type"]
        assert (
            'gravity_input_counter{db="demo",pipeline="p1",subtype="insert",'
            'table="users",type="dml"} 5' in body
        )
        assert "# TYPE gravity_input_counter counter" in body
        assert "# TYPE gravity_input_latency histogram" in body
        # first bucket holds the 0.0004 observation
        assert 'gravity_input_latency_bucket{le="0.0005",pipeline="p1"} 1' in body
        # +Inf bucket equals total count (both observations)
        assert 'gravity_input_latency_bucket{le="+Inf",pipeline="p1"} 2' in body
        assert 'gravity_input_latency_count{pipeline="p1"} 2' in body
        assert 'gravity_queue_length{pipeline="p1",queue="state_rows"} 42' in body

        # /healthz + /status
        assert _get(srv.port, "/healthz")[:2] == (200, "ok")
        _, sbody, sheaders = _get(srv.port, "/status")
        assert json.loads(sbody) == {"state": "running", "position": "42"}
        assert sheaders["Content-Type"] == "application/json"

        # /reset clears the registry and fires the hook
        fired = []
        srv.reset_fn = lambda: fired.append(1)
        assert _get(srv.port, "/reset")[0] == 200
        assert fired == [1]
        _, body2, _ = _get(srv.port, "/metrics")
        assert "gravity_input_counter{" not in body2
    finally:
        srv.stop()


def test_spark_bridges_feed_registry(spark):
    """Observation result + StreamingQueryProgress snapshot land in the
    reference's metric names with per-op subtypes."""
    from pyspark.sql import functions as F

    from gravity_spark.metrics import observe_input

    df = spark.createDataFrame(
        [("insert",), ("insert",), ("delete",)], "op string"
    ).withColumn("ts", F.current_timestamp())
    observed, obs = observe_input(df)
    observed.write.format("noop").mode("overwrite").save()

    reg = MetricsRegistry()
    reg.record_observation("p1", "demo", "users", obs.get)
    reg.record_progress(
        "p1",
        {
            "num_input_rows": 3,
            "duration_ms": {"triggerExecution": 1500, "addBatch": 900},
            "state_operators": [{"numRowsTotal": 7}],
        },
    )
    text = reg.render()
    assert (
        'gravity_input_counter{db="demo",pipeline="p1",subtype="insert",'
        'table="users",type="dml"} 2' in text
    )
    assert 'gravity_input_emitter_counter{pipeline="p1"} 3' in text
    assert 'gravity_scheduler_output_counter{pipeline="p1"} 3' in text
    assert 'gravity_process_time_latency_count{pipeline="p1"} 1' in text
    assert 'gravity_queue_length{pipeline="p1",queue="state_rows"} 7' in text
