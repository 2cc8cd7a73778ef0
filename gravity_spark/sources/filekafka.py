"""File-backed Kafka loopback transport: topic/partition/offset semantics
without a broker process.

The sandbox has no Kafka service and no connector jars, so the
production path (`streaming.pipeline.kafka_cdc_source`) can't be
exercised end to end. This module provides the same *contract* over
plain files so the full transport path — keyed produce → partition
assignment → offset-addressed consume → consumer-group position commit
→ decoder → merge — runs for real in tests and registered queries:

  - **Producer partitioning** mirrors the reference's async-kafka
    output: "data with the same primary key goes to the same partition"
    via ``dep_hash % len(partitions)``
    (pkg/outputs/async_kafka/async_kafka.go:187-205). Here: FNV-1a of
    the record key mod the partition count.
  - **Offsets** are per-partition, dense, monotonic — append-only
    segment files named by their starting offset, exactly Kafka's log
    layout in miniature.
  - **Consumer groups** commit their next-to-read offsets into a
    `PositionStore`, mirroring the reference's KafkaOffsetStore which
    persists consumer offsets through the position cache instead of
    Kafka's __consumer_offsets
    (pkg/inputs/tidb_kafka/position_value.go:20-108, wired at
    binlog_tailer.go:285).

Spark reads the logs through the ordinary JSON file source (batch or
`readStream`), producing the same (topic, partition, offset, key,
value, timestamp) wire columns Spark's Kafka connector exposes — the
envelope decoders in `core.envelope` pick up `offset` as the
InputSequence and `topic/partition` as the stream key automatically, so
swapping in the real connector at deployment is a one-line source
change.

Scale shape: producing is a driver-side test/tooling path (bounded
fixtures); consuming is a distributed file scan with partition-dir
pruning — at 100 TB the real Kafka source replaces this reader, and
everything downstream of the wire columns is unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gravity_spark.core.positions import PositionStore

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),
    ]
)


def fnv1a64(data: str) -> int:
    """Portable 64-bit FNV-1a — the stand-in for the reference's
    OutputDepHashes partitioner (async_kafka.go:196-201)."""
    h = 0xCBF29CE484222325
    for b in data.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class FileKafkaBroker:
    """A directory of topics; each topic a directory of hive-style
    ``partition=N`` dirs holding offset-named jsonl segments."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- admin ------------------------------------------------------------

    def _topic_dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def create_topic(self, topic: str, partitions: int = 4) -> None:
        td = self._topic_dir(topic)
        for p in range(partitions):
            os.makedirs(os.path.join(td, f"partition={p}"), exist_ok=True)
        with open(os.path.join(td, "_meta.json"), "w") as f:
            json.dump({"partitions": partitions}, f)

    def num_partitions(self, topic: str) -> int:
        with open(os.path.join(self._topic_dir(topic), "_meta.json")) as f:
            return int(json.load(f)["partitions"])

    def end_offsets(self, topic: str) -> dict[int, int]:
        """Log-end offset (next offset to be written) per partition."""
        out: dict[int, int] = {}
        td = self._topic_dir(topic)
        for p in range(self.num_partitions(topic)):
            pd = os.path.join(td, f"partition={p}")
            end = 0
            for seg in os.listdir(pd):
                if seg.startswith("seg-") and seg.endswith(".jsonl"):
                    start_s, count_s = seg[4:-6].split("-")
                    end = max(end, int(start_s) + int(count_s))
            out[p] = end
        return out

    # -- produce ----------------------------------------------------------

    def produce(
        self,
        topic: str,
        records: Sequence[tuple[str | None, str]],
        base_ts_ms: int = 1_700_000_000_000,
    ) -> dict[int, int]:
        """Append (key, value) records; same key → same partition, in
        order (async_kafka.go:193-195). Returns new end offsets."""
        n = self.num_partitions(topic)
        ends = self.end_offsets(topic)
        by_part: dict[int, list[tuple[str | None, str]]] = {}
        rr = 0
        for key, value in records:
            if key is None:
                p = rr % n  # no PK → arbitrary partition (go: rand)
                rr += 1
            else:
                p = fnv1a64(key) % n
            by_part.setdefault(p, []).append((key, value))
        td = self._topic_dir(topic)
        for p, recs in by_part.items():
            start = ends[p]
            seg = os.path.join(
                td, f"partition={p}", f"seg-{start:012d}-{len(recs)}.jsonl"
            )
            tmp = seg + ".tmp"
            with open(tmp, "w") as f:
                for i, (key, value) in enumerate(recs):
                    f.write(
                        json.dumps(
                            {
                                "offset": start + i,
                                "key": key,
                                "value": value,
                                "timestamp": base_ts_ms + start + i,
                            }
                        )
                        + "\n"
                    )
            os.rename(tmp, seg)  # segment visibility is atomic
            ends[p] = start + len(recs)
        return ends

    # -- consume ----------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        topic: str,
        start_offsets: Mapping[int, int] | None = None,
        end_offsets: Mapping[int, int] | None = None,
    ) -> DataFrame:
        """Batch read [start, end) per partition as Kafka wire columns.

        The ``partition`` column comes from the hive dir name, so the
        per-partition offset range filter prunes whole partition dirs
        before any file is opened.
        """
        # loading the topic dir directly: _meta.json is invisible to the
        # file index (Spark skips _-prefixed files), partition=N dirs
        # surface as a hive partition column
        df = (
            spark.read.schema(WIRE_SCHEMA)
            .json(self._topic_dir(topic))
            .withColumn("topic", F.lit(topic))
            .withColumn("partition", F.col("partition").cast("int"))
        )
        if start_offsets:
            cond = F.lit(False)
            for p, s in start_offsets.items():
                e = (end_offsets or {}).get(p)
                c = (F.col("partition") == p) & (F.col("offset") >= s)
                if e is not None:
                    c = c & (F.col("offset") < e)
                cond = cond | c
            df = df.filter(cond)
        elif end_offsets:
            cond = F.lit(False)
            for p, e in end_offsets.items():
                cond = cond | ((F.col("partition") == p) & (F.col("offset") < e))
            df = df.filter(cond)
        return df

    def stream(self, spark: SparkSession, topic: str) -> DataFrame:
        """Streaming read — Spark's file source tracks consumed segment
        files in the checkpoint, giving the same resume guarantee the
        Kafka source gets from offset tracking."""
        return (
            spark.readStream.schema(WIRE_SCHEMA)
            .json(self._topic_dir(topic))
            .withColumn("topic", F.lit(topic))
            .withColumn("partition", F.col("partition").cast("int"))
        )


class FileKafkaConsumer:
    """Poll/commit consumer whose group offsets live in a PositionStore —
    the reference's KafkaOffsetStore pattern
    (pkg/inputs/tidb_kafka/position_value.go:60-96): offsets are
    committed to gravity's own position repo, not the broker, so a
    restarted pipeline resumes from its position row."""

    def __init__(
        self,
        broker: FileKafkaBroker,
        group_id: str,
        topic: str,
        store: PositionStore | Any,
    ) -> None:
        self.broker = broker
        self.group_id = group_id
        self.topic = topic
        self.store = store
        self._key = f"kafka-consumer/{group_id}/{topic}"

    def position(self) -> dict[int, int]:
        pos = self.store.get(self._key)
        if pos is None:
            return {p: 0 for p in range(self.broker.num_partitions(self.topic))}
        return {int(k): int(v) for k, v in pos["offsets"].items()}

    def poll(self, spark: SparkSession) -> tuple[DataFrame, dict[int, int]]:
        """Read committed-position → current log-end; returns the batch
        and the offsets to commit after the batch is durably applied."""
        start = self.position()
        end = self.broker.end_offsets(self.topic)
        return self.broker.read(spark, self.topic, start, end), end

    def commit(self, offsets: Mapping[int, int], flush: bool = True) -> None:
        self.store.put(
            self._key,
            {"offsets": {str(k): int(v) for k, v in offsets.items()}},
            flush=flush,
        )
