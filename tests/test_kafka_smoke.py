"""Optional-environment Kafka smoke: the one §2 transport the sandbox
cannot execute (no spark-sql-kafka jars, no broker). This test
self-skips unless BOTH are present, so the day the environment allows
it, kafka_cdc_source self-verifies with zero code change — and until
then it documents exactly what is required. Semantics (keyed
partitioning, offsets, resume) are covered today by the filekafka
loopback (tests/test_filekafka.py)."""

import json
import os
import socket

import pytest


def _kafka_jar_present(spark) -> bool:
    """The connector registers the 'kafka' data source via
    DataSourceRegister; probing the registry is jar detection without
    touching the network."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kafka", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _broker() -> str | None:
    """A reachable broker: $KAFKA_SMOKE_BROKERS, else localhost:9092 if
    something is listening there."""
    env = os.environ.get("KAFKA_SMOKE_BROKERS")
    if env:
        return env
    try:
        with socket.create_connection(("127.0.0.1", 9092), timeout=0.3):
            return "127.0.0.1:9092"
    except OSError:
        return None


def test_kafka_cdc_source_roundtrip(spark, tmp_path):
    if not _kafka_jar_present(spark):
        pytest.skip("spark-sql-kafka connector jars not on the classpath")
    brokers = _broker()
    if brokers is None:
        pytest.skip("no Kafka broker reachable (set KAFKA_SMOKE_BROKERS)")

    from pyspark.sql import functions as F

    from gravity_spark.streaming.pipeline import kafka_cdc_source

    topic = f"gravity_smoke_{os.getpid()}"

    # produce two Debezium-envelope messages through Spark's own sink
    payloads = [
        {"payload": {"op": "c", "after": {"id": "1", "v": "a"},
                     "source": {"db": "app", "table": "t", "ts_ms": 1}, "ts_ms": 1}},
        {"payload": {"op": "u", "after": {"id": "1", "v": "b"},
                     "source": {"db": "app", "table": "t", "ts_ms": 2}, "ts_ms": 2}},
    ]
    src = spark.createDataFrame(
        [(json.dumps(p),) for p in payloads], "value string"
    ).withColumn("key", F.lit("1"))
    (src.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save())

    changes = kafka_cdc_source(spark, brokers, topic, starting_offsets="earliest")
    q = (
        changes.writeStream.format("memory")
        .queryName("kafka_smoke")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(120), "kafka smoke stream timed out"
    rows = spark.table("kafka_smoke").orderBy("seq").collect()
    assert [r["op"] for r in rows] == ["insert", "update"]
    assert rows[-1]["data"]["v"] == "b"
