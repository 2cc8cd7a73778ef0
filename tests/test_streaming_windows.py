import datetime as dt
import json
import os

from pyspark.sql import functions as F

from gravity_spark.streaming.windows import (
    sessionize_stateful,
    streaming_dedup,
    streaming_window_counts,
)


def _events_stream(spark, tmp_path, rows):
    src = tmp_path / "ev"
    src.mkdir(exist_ok=True)
    with open(src / f"p{len(os.listdir(src))}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double")
    return spark.readStream.schema(schema).format("json").load(str(src))


ROWS = [
    {"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0},
    {"event_id": 2, "ts": "2024-01-01T10:10:00.000Z", "user_id": 1, "event_type": "click", "value": 2.0},
    {"event_id": 3, "ts": "2024-01-01T13:00:00.000Z", "user_id": 1, "event_type": "view", "value": 3.0},
    {"event_id": 4, "ts": "2024-01-01T10:20:00.000Z", "user_id": 2, "event_type": "click", "value": 4.0},
]


def test_streaming_window_counts(spark, tmp_path):
    stream = _events_stream(spark, tmp_path, ROWS)
    out = streaming_window_counts(stream, window="1 hour")
    q = (out.writeStream.format("memory").queryName("twc")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(60)
    rows = {(r["window"]["start"].hour, r["event_type"]): r["n"]
            for r in spark.table("twc").collect()}
    assert rows[(10, "click")] == 3
    assert rows[(13, "view")] == 1


def test_streaming_dedup(spark, tmp_path):
    dup_rows = ROWS + [dict(ROWS[0])]  # duplicate event_id 1
    stream = _events_stream(spark, tmp_path, dup_rows)
    out = streaming_dedup(stream, ["event_id"])
    q = (out.writeStream.format("memory").queryName("sdd")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    ids = [r["event_id"] for r in spark.table("sdd").collect()]
    assert sorted(ids) == [1, 2, 3, 4]


def test_sessionize_stateful(spark, tmp_path):
    stream = _events_stream(spark, tmp_path, ROWS)
    out = sessionize_stateful(stream, gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("sst")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["user_id"]: r for r in spark.table("sst").collect()}
    # user 1: 10:00+10:10 one session, 13:00 second session
    assert rows[1]["n_sessions"] == 2 and rows[1]["n_events"] == 3
    assert rows[2]["n_sessions"] == 1


def test_running_counts_transform_with_state(spark, tmp_path):
    import pytest

    from gravity_spark.streaming.windows import (
        running_counts_stateful,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("protobuf not installed: transformWithStateInPandas unavailable")

    stream = _events_stream(spark, tmp_path, ROWS)
    out = running_counts_stateful(stream)
    q = (out.writeStream.format("memory").queryName("rcs")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    counts = {r["user_id"]: r["n_events"] for r in spark.table("rcs").collect()}
    assert counts == {1: 3, 2: 1}
