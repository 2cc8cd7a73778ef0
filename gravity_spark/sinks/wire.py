"""Kafka wire formats: the envelope serialized for downstream consumers.

Reference parity:
  - pkg/core/encoding/rdb_json.go:17-170 — v0.1 format (all values
    stringified + header: version, database, table, type, ts, host) and
    v2.0-alpha (typed JSON, RFC3339 times)
  - pkg/outputs/async_kafka/async_kafka.go:196-201 — partition =
    depHash % numPartitions: same PK → same partition. Spark's Kafka
    sink gives identical placement via the message `key`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gravity_spark.core.envelope import dep_hash

VERSION_01 = "0.1"
VERSION_20 = "2.0.alpha"

ORIGIN_KEY = "_origin"


def tag_origin(changes: DataFrame, origin: str) -> DataFrame:
    """Write-side provenance tag for bidirectional sync: the reverse
    pipeline filters its own traffic out (internal txn tagger,
    pkg/sql_execution_engine/internal_txn_tagger.go + cycle detection
    pkg/core/msg.go:231-247). A data-map field replaces the
    _gravity.gravity_txn_tags marker row."""
    tagged = F.map_concat(
        F.coalesce(F.col("data"), F.create_map()),
        F.create_map(F.lit(ORIGIN_KEY), F.lit(origin)),
    )
    return changes.withColumn("data", tagged)


def filter_own_traffic(changes: DataFrame, origin: str) -> DataFrame:
    """Read-side cycle breaker: drop changes this pipeline produced."""
    return changes.filter(
        F.coalesce(F.col("data").getItem(ORIGIN_KEY) != origin, F.lit(True))
    )


def _header(version: str) -> list[Column]:
    return [
        F.lit(version).alias("version"),
        F.col("database").alias("database"),
        F.col("table").alias("table"),
        F.coalesce(F.col("host"), F.lit("")).alias("host"),
    ]


def to_wire_v01(changes: DataFrame) -> DataFrame:
    """v0.1: stringified payload maps + header. Returns (key, value)
    ready for the Kafka sink."""
    value = F.to_json(
        F.struct(
            *_header(VERSION_01),
            F.col("op").alias("type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("time"),
            F.col("data").alias("data"),
            F.col("old").alias("old"),
            F.col("pks").alias("pks"),
        )
    )
    return changes.select(
        dep_hash(F.col("pks")).cast("string").alias("key"), value.alias("value")
    )


def to_wire_v20(changes: DataFrame) -> DataFrame:
    """v2.0-alpha: RFC3339 event time, explicit op + seq."""
    value = F.to_json(
        F.struct(
            *_header(VERSION_20),
            F.col("op").alias("op"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("time"),
            F.col("seq").alias("seq"),
            F.col("data").alias("data"),
            F.col("old").alias("old"),
            F.col("pks").alias("pks"),
        )
    )
    return changes.select(
        dep_hash(F.col("pks")).cast("string").alias("key"), value.alias("value")
    )


_WIRE_V20_SCHEMA = (
    "version string, database string, table string, host string, "
    "op string, time string, seq long, data map<string,string>, "
    "old map<string,string>, pks map<string,string>"
)
_WIRE_V01_SCHEMA = (
    "version string, database string, table string, host string, "
    "type string, time string, data map<string,string>, "
    "old map<string,string>, pks map<string,string>"
)


def from_wire_v20(frames: DataFrame, value_col: str = "value") -> DataFrame:
    """Consumer half of the v2.0-alpha JSON wire format: gravity →
    gravity chaining (the reference's two-cluster bidirectional
    deployment consumes its own Kafka output; its Deserialize is
    actually unimplemented — rdb_json.go:183 panics — so this EXCEEDS
    parity). Returns envelope-schema rows."""
    parsed = frames.select(
        F.from_json(F.col(value_col).cast("string"), _WIRE_V20_SCHEMA).alias("m")
    )
    return parsed.select(
        F.lit("dml").alias("type"),
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table"),
        F.col("m.host").alias("host"),
        F.col("m.op").alias("op"),
        F.to_timestamp("m.time", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        F.col("m.data").alias("data"),
        F.col("m.old").alias("old"),
        F.col("m.pks").alias("pks"),
        F.lit(None).cast("string").alias("ddl_statement"),
        F.col("m.seq").alias("seq"),
    )


def from_wire_v01(frames: DataFrame, value_col: str = "value") -> DataFrame:
    """Consumer half of the v0.1 format (op rides as `type`, event time
    is second-precision)."""
    parsed = frames.select(
        F.from_json(F.col(value_col).cast("string"), _WIRE_V01_SCHEMA).alias("m")
    )
    return parsed.select(
        F.lit("dml").alias("type"),
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table"),
        F.col("m.host").alias("host"),
        F.col("m.type").alias("op"),
        F.to_timestamp("m.time", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("m.data").alias("data"),
        F.col("m.old").alias("old"),
        F.col("m.pks").alias("pks"),
        F.lit(None).cast("string").alias("ddl_statement"),
        F.lit(None).cast("long").alias("seq"),
    )


def to_wire_mongo(changes: DataFrame, version: str = VERSION_20) -> DataFrame:
    """Mongo-flavor JSON wire format (pkg/core/encoding/mongo_json.go):
    v2.0-alpha = {version, database, collection, data, row};
    v0.1 embeds an oplog-shaped object ({ns, op i/u/d, o, ts} — the
    public gtm.Op field layout) plus unique_source_name. Same (key,
    value) contract as the RDB formats; key = depHash string."""
    if version == VERSION_01:
        oplog = F.struct(
            F.concat_ws(".", F.col("database"), F.col("table")).alias("ns"),
            F.when(F.col("op") == "insert", F.lit("i"))
            .when(F.col("op") == "delete", F.lit("d"))
            .otherwise(F.lit("u"))
            .alias("op"),
            F.col("data").alias("o"),
            F.unix_timestamp("ts").alias("ts"),
        )
        value = F.to_json(
            F.struct(
                F.lit(VERSION_01).alias("version"),
                F.col("database").alias("database"),
                F.col("table").alias("collection"),
                F.coalesce(F.col("host"), F.lit("")).alias("unique_source_name"),
                oplog.alias("oplog"),
            )
        )
    else:
        value = F.to_json(
            F.struct(
                F.lit(VERSION_20).alias("version"),
                F.col("database").alias("database"),
                F.col("table").alias("collection"),
                F.col("data").alias("data"),
                F.col("pks").alias("row"),
            )
        )
    return changes.select(
        dep_hash(F.col("pks")).cast("string").alias("key"), value.alias("value")
    )


def to_wire_pb(changes: DataFrame) -> DataFrame:
    """Protobuf wire format (protocol/msgpb/message.proto +
    pkg/core/encoding/pb.go DataMapToPB): serialize each envelope row
    as a msgpb.Msg with map<string, Any> payloads. Returns (key, value)
    with value BINARY, key the depHash string as for the JSON formats.

    Arrow-batched mapInPandas — the codec is pure Python
    (core/pbwire.py) but runs per ~10k-row batch, never per-row over
    the driver. Envelope maps are string-typed, so payload values ride
    as StringValue Anys (typed projections re-type downstream, the same
    contract the JSON v0.1 format has)."""
    import pandas as pd

    from gravity_spark.core.pbwire import encode_msg

    keyed = changes.withColumn("__key", dep_hash(F.col("pks")).cast("string"))
    cols = ["__key", "type", "version", "database", "table", "op", "ts",
            "data", "old", "pks", "ddl_statement"]
    present = [c for c in cols if c in keyed.columns]

    def enc(batches):
        for pdf in batches:
            values = []
            for row in pdf.itertuples(index=False):
                r = row._asdict()
                ts = r.get("ts")
                dml = None
                ddl = None
                if r.get("ddl_statement"):
                    ddl = {"sql": r["ddl_statement"]}
                else:
                    dml = {
                        "op": r.get("op") or "",
                        "data": r.get("data"),
                        "old": r.get("old"),
                        "pks": r.get("pks"),
                    }
                values.append(
                    encode_msg(
                        {
                            "version": r.get("version") or VERSION_20,
                            "database": r.get("database"),
                            "table": r.get("table"),
                            "msg_type": r.get("type") or "dml",
                            "timestamp": None if pd.isnull(ts) else ts,
                            "dml": dml,
                            "ddl": ddl,
                        }
                    )
                )
            yield pd.DataFrame({"key": pdf["__key"], "value": values})

    return keyed.select(*present).mapInPandas(enc, "key string, value binary")


def from_wire_pb(frames: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode msgpb.Msg bytes back to envelope columns — the consumer
    half of the pb transport (PBToDataMap). Map values decode to their
    Any-typed Python values and are stringified into the envelope's
    map<string,string> (ints/floats via str(), the v0.1 convention)."""
    import pandas as pd

    from gravity_spark.core.pbwire import decode_msg

    def dec(batches):
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                m = decode_msg(bytes(raw))
                dml = m["dml"] or {}
                strmap = lambda d: {
                    k: (None if v is None else str(v)) for k, v in (d or {}).items()
                }  # noqa: E731
                rows.append(
                    {
                        "type": m["msg_type"],
                        "version": m["version"],
                        "database": m["database"],
                        "table": m["table"],
                        "op": dml.get("op") or None,
                        "ts": m["timestamp"],
                        "data": strmap(dml.get("data")),
                        "old": strmap(dml.get("old")),
                        "pks": strmap(dml.get("pks")),
                        "ddl_statement": (m["ddl"] or {}).get("sql"),
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "type string, version string, database string, table string, "
        "op string, ts timestamp, data map<string,string>, "
        "old map<string,string>, pks map<string,string>, ddl_statement string"
    )
    return frames.mapInPandas(dec, schema)


def write_kafka(wire: DataFrame, brokers: str, topic: str, streaming: bool = False):
    """Kafka producer: key drives per-PK partition placement (same
    guarantee as depHash % numPartitions). Requires the Kafka connector
    jars on the classpath — gated so the local harness can still import."""
    writer = (
        (wire.writeStream if streaming else wire.write)
        .format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )
    return writer


def to_console(changes: DataFrame, n: int = 20) -> None:
    """stdout debug sink (pkg/outputs/stdout/stdout.go:33-103)."""
    changes.show(n, truncate=False)
