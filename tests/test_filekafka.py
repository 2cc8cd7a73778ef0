"""File-backed Kafka loopback transport: the full produce → partition →
offset-addressed consume → position-commit → decode → merge path, live.

Mirrors the reference's tidb_kafka consumer (offsets committed to the
position repo, pkg/inputs/tidb_kafka/position_value.go:20-108) and
async-kafka producer partitioning (same PK → same partition,
pkg/outputs/async_kafka/async_kafka.go:187-205) without a broker
process.
"""

import json

from pyspark.sql import functions as F

from gravity_spark.core.envelope import (
    decompose_pk_updates,
    from_debezium_json,
    typed_view,
)
from gravity_spark.core.positions import PositionStore
from gravity_spark.operators.upsert import merge_changes
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
from gravity_spark.sources.filekafka import FileKafkaBroker, FileKafkaConsumer, fnv1a64

USERS_DDL = "id long, name string, age long"


def _dbz(op, before, after, ts_ms=1700000000000):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {"db": "demo", "table": "users", "ts_ms": ts_ms, "server_id": 1},
            "op": op,
            "ts_ms": ts_ms + 5,
        }
    )


def _img(i, name, age):
    return {"id": str(i), "name": name, "age": str(age)}


def test_same_key_same_partition_in_order(spark, tmp_path):
    broker = FileKafkaBroker(str(tmp_path / "broker"))
    broker.create_topic("t", partitions=4)
    # 3 interleaved updates per key — per-key order must survive
    recs = []
    for rnd in range(3):
        for k in range(20):
            recs.append((f"k{k}", json.dumps({"k": k, "round": rnd})))
    broker.produce("t", recs)
    rows = broker.read(spark, "t").collect()
    assert len(rows) == 60
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.partition, r.offset)):
        parsed = json.loads(r.value)
        by_key.setdefault(r.key, []).append((r.partition, parsed["round"]))
    for key, seen in by_key.items():
        parts = {p for p, _ in seen}
        assert len(parts) == 1, f"{key} spread over {parts}"
        assert parts == {fnv1a64(key) % 4}
        assert [rnd for _, rnd in seen] == [0, 1, 2], f"{key} out of order"


def test_offset_range_read(spark, tmp_path):
    broker = FileKafkaBroker(str(tmp_path / "broker"))
    broker.create_topic("t", partitions=2)
    broker.produce("t", [(f"k{i}", str(i)) for i in range(10)])
    end1 = broker.end_offsets("t")
    broker.produce("t", [(f"k{i}", str(i + 100)) for i in range(10)])
    end2 = broker.end_offsets("t")
    # window [end1, end2) per partition = exactly the second batch
    second = broker.read(spark, "t", start_offsets=end1, end_offsets=end2)
    vals = sorted(int(r.value) for r in second.collect())
    assert vals == list(range(100, 110))
    assert sum(end2.values()) - sum(end1.values()) == 10


def test_poll_commit_resume(spark, tmp_path):
    """Consumer-group position survives a 'restart': a new consumer over
    the same PositionStore resumes at the committed offsets — no
    re-read, no loss (position_value.go:60-96 semantics)."""
    broker = FileKafkaBroker(str(tmp_path / "broker"))
    broker.create_topic("users", partitions=3)
    store = PositionStore(str(tmp_path / "positions.json"), flush_interval_s=0)

    broker.produce(
        "users",
        [(str(i), _dbz("c", None, _img(i, f"u{i}", 20 + i))) for i in range(50)],
    )
    c1 = FileKafkaConsumer(broker, "g1", "users", store)
    batch1, next1 = c1.poll(spark)
    typed1 = typed_view(
        decompose_pk_updates(from_debezium_json(batch1)),
        spark.createDataFrame([], USERS_DDL).schema,
        ["id"],
    )
    target = ParquetMergeTarget(spark, str(tmp_path / "users_tbl"), ["id"], USERS_DDL)
    target.apply_batch(typed1, epoch_id=0)
    c1.commit(next1)

    # second wave: updates + a delete, then a fresh consumer instance
    broker.produce(
        "users",
        [(str(i), _dbz("u", _img(i, f"u{i}", 20 + i), _img(i, f"v{i}", 30 + i))) for i in range(0, 50, 2)]
        + [("7", _dbz("d", _img(7, "u7", 27), None))],
    )
    c2 = FileKafkaConsumer(broker, "g1", "users", store)
    batch2, next2 = c2.poll(spark)
    assert batch2.count() == 26  # only the new records
    typed2 = typed_view(
        decompose_pk_updates(from_debezium_json(batch2)),
        spark.createDataFrame([], USERS_DDL).schema,
        ["id"],
    )
    target.apply_batch(typed2, epoch_id=1)
    c2.commit(next2)

    state = {r.id: (r.name, r.age) for r in target.read().collect()}
    assert len(state) == 49  # 50 - deleted id=7
    assert state[0] == ("v0", 30)
    assert state[1] == ("u1", 21)
    assert 7 not in state

    # drained: an immediate re-poll returns nothing
    batch3, _ = c2.poll(spark)
    assert batch3.count() == 0


def test_streaming_source_into_merge_sink(spark, tmp_path):
    """broker.stream() through the decoder into the merge sink with an
    availableNow trigger — the Structured-Streaming twin of the poll
    loop; the checkpoint replaces the consumer group."""
    broker = FileKafkaBroker(str(tmp_path / "broker"))
    broker.create_topic("users", partitions=2)
    broker.produce(
        "users",
        [(str(i), _dbz("c", None, _img(i, f"u{i}", i))) for i in range(30)]
        + [(str(i), _dbz("u", _img(i, f"u{i}", i), _img(i, f"w{i}", i + 1))) for i in range(0, 30, 3)],
    )
    target = ParquetMergeTarget(spark, str(tmp_path / "tbl"), ["id"], USERS_DDL)
    schema = spark.createDataFrame([], USERS_DDL).schema

    def handle(df, epoch_id):
        typed = typed_view(decompose_pk_updates(from_debezium_json(df)), schema, ["id"])
        target.apply_batch(typed, epoch_id=epoch_id)

    q = (
        broker.stream(spark, "users")
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {r.id: r.name for r in target.read().collect()}
    assert len(state) == 30
    assert state[0] == "w0" and state[1] == "u1" and state[3] == "w3"
