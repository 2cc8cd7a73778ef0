"""The change-event envelope: gravity's ``core.Msg`` as a DataFrame contract.

Reference semantics (cited for parity, not copied):
  - pkg/core/msg.go:52-81 — Msg{Type, Database, Table, DmlMsg{Operation,
    Data, Old, Pks}, Timestamp, InputStreamKey, InputSequence}
  - pkg/core/msg.go:22-42 — type ∈ {dml, ddl, ctl}; op ∈ {insert, update,
    delete}
  - pkg/core/msg.go:46-51 — OutputDepHashes = hashes over PK/UK values,
    the per-row ordering/conflict domain.

Spark mapping: one envelope row per row-change. Payloads ride as
``MapType(String, String)`` until routed to a per-table typed schema
(from_json against the catalog). The per-stream sequence is a plain
LongType; the dep hash is ``xxhash64`` over the PK values — used only
for partitioning, never for equality across engines.

At 100 TB the envelope is what flows through every shuffle, so it stays
narrow: addressing + op + seq + payload maps; no per-message channels or
callbacks (Spark's checkpoint/commit model replaces the ack plumbing,
cf. pkg/sliding_window/static_sliding_window.go:17-120).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"

TYPE_DML = "dml"
TYPE_DDL = "ddl"
TYPE_CTL = "ctl"

#: Envelope schema — the contract every operator in the engine speaks.
MSG_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), False),       # dml / ddl / ctl
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("op", T.StringType(), True),          # insert/update/delete
        T.StructField("ts", T.TimestampType(), True),       # event time at source
        T.StructField("data", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("old", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("pks", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ddl_statement", T.StringType(), True),
        T.StructField("stream_key", T.StringType(), True),  # InputStreamKey
        T.StructField("seq", T.LongType(), True),           # InputSequence
    ]
)


def dep_hash(pks_col: Column) -> Column:
    """Ordering/conflict-domain hash over the PK map.

    Mirrors OutputDepHashes (pkg/core/msg.go:46-51): same PK values →
    same hash → same partition → per-key source order is preserved
    through any repartition. Sorting the map keys makes the hash
    independent of map construction order.
    """
    kv = F.map_entries(pks_col)
    sorted_kv = F.array_sort(kv)
    joined = F.array_join(
        F.transform(sorted_kv, lambda e: F.concat_ws("", e["key"], e["value"])),
        "",
    )
    return F.xxhash64(joined)


def with_dep_hash(df: DataFrame, col_name: str = "dep_hash") -> DataFrame:
    return df.withColumn(col_name, dep_hash(F.col("pks")))


def events_to_changes(events: DataFrame, database: str = "app", table: str = "events") -> DataFrame:
    """Adapt the harness ``events`` table into an envelope change stream.

    The driver testdata has no real binlog, so the `events` table plays
    the role of a captured CDC stream: signup→insert, click/view/
    purchase→update, error→delete, keyed by user_id. Deterministic, so
    a DuckDB oracle can reproduce the same mapping.
    """
    op = (
        F.when(F.col("event_type") == "signup", F.lit(OP_INSERT))
        .when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))
    )
    data = F.create_map(
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("event_type"), F.col("event_type"),
        F.lit("value"), F.col("value").cast("string"),
        F.lit("props"), F.col("props"),
    )
    return events.select(
        F.lit(TYPE_DML).alias("type"),
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.lit(None).cast("string").alias("host"),
        op.alias("op"),
        F.col("ts").alias("ts"),
        data.alias("data"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("old"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("pks"),
        F.lit(None).cast("string").alias("ddl_statement"),
        F.lit("events-0").alias("stream_key"),
        F.col("event_id").alias("seq"),
    )


# --- public CDC wire-format decoders (Debezium / Canal JSON) -------------

_DEBEZIUM_VALUE = T.StructType(
    [
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType(), True),
                    T.StructField("table", T.StringType(), True),
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField("server_id", T.LongType(), True),
                ]
            ),
            True,
        ),
        T.StructField("op", T.StringType(), True),  # c/u/d/r
        T.StructField("ts_ms", T.LongType(), True),
    ]
)


def from_debezium_json(raw: DataFrame, value_col: str = "value", pk_cols: list[str] | None = None) -> DataFrame:
    """Decode a Debezium-JSON Kafka value column into the envelope.

    Replaces gravity's binlog tailer (pkg/inputs/mysqlstream/
    binlog_tailer.go:153-610): Spark has no native binlog source, so the
    idiomatic path is Debezium/Canal topics — gravity itself ships the
    same pattern for TiDB (pkg/inputs/tidb_kafka/input.go:30-190).
    """
    pk_cols = pk_cols or ["id"]
    v = F.from_json(F.col(value_col).cast("string"), _DEBEZIUM_VALUE)
    op = (
        F.when(v["op"].isin("c", "r"), F.lit(OP_INSERT))
        .when(v["op"] == "u", F.lit(OP_UPDATE))
        .when(v["op"] == "d", F.lit(OP_DELETE))
        .otherwise(F.lit(None))
    )
    data = F.when(op == OP_DELETE, v["before"]).otherwise(v["after"])
    pks = F.map_filter(data, lambda k, _: k.isin(*pk_cols))
    # seq: Kafka offset when reading a real topic (per-partition
    # monotonic — the binlog-order InputSequence equivalent); source
    # ts_ms otherwise. monotonically_increasing_id is NOT streaming-safe.
    seq = (
        F.col("offset").cast("long")
        if "offset" in raw.columns
        else v["source"]["ts_ms"]
    )
    stream_key = (
        F.concat_ws("/", F.col("topic"), F.col("partition").cast("string"))
        if "partition" in raw.columns
        else F.concat_ws("/", v["source"]["db"], v["source"]["table"])
    )
    return raw.select(
        F.lit(TYPE_DML).alias("type"),
        v["source"]["db"].alias("database"),
        v["source"]["table"].alias("table"),
        F.lit(None).cast("string").alias("host"),
        op.alias("op"),
        F.timestamp_millis(v["source"]["ts_ms"]).alias("ts"),
        data.alias("data"),
        v["before"].alias("old"),
        pks.alias("pks"),
        F.lit(None).cast("string").alias("ddl_statement"),
        stream_key.alias("stream_key"),
        seq.alias("seq"),
    )


_CANAL_VALUE = T.StructType(
    [
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("type", T.StringType(), True),  # INSERT/UPDATE/DELETE
        T.StructField("ts", T.LongType(), True),
        T.StructField("pkNames", T.ArrayType(T.StringType()), True),
        T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True),
        T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True),
        T.StructField("isDdl", T.BooleanType(), True),
        T.StructField("sql", T.StringType(), True),
    ]
)


def from_canal_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode Canal-JSON (one message may carry N rows → explode to N
    envelope rows, matching the reference's event explosion,
    pkg/inputs/mysqlstream/msg.go:284-331)."""
    v = F.from_json(F.col(value_col).cast("string"), _CANAL_VALUE)
    seq0 = F.col("offset").cast("long") if "offset" in raw.columns else v["ts"]
    base = raw.select(v.alias("v"), seq0.alias("seq0"))
    exploded = base.select(
        "v", "seq0", F.posexplode_outer(F.coalesce(F.col("v.data"), F.array())).alias("pos", "row")
    )
    vv = F.col("v")
    op = (
        F.when(vv["type"] == "INSERT", F.lit(OP_INSERT))
        .when(vv["type"] == "UPDATE", F.lit(OP_UPDATE))
        .when(vv["type"] == "DELETE", F.lit(OP_DELETE))
        .otherwise(F.lit(None))
    )
    old = F.try_element_at(F.coalesce(vv["old"], F.array()), F.col("pos") + 1)
    pk_names = F.coalesce(vv["pkNames"], F.array())
    pks = F.map_filter(F.coalesce(F.col("row"), F.create_map()), lambda k, _: F.array_contains(pk_names, k))
    return exploded.select(
        F.when(vv["isDdl"], F.lit(TYPE_DDL)).otherwise(F.lit(TYPE_DML)).alias("type"),
        vv["database"].alias("database"),
        vv["table"].alias("table"),
        F.lit(None).cast("string").alias("host"),
        F.when(vv["isDdl"], F.lit(None).cast("string")).otherwise(op).alias("op"),
        F.timestamp_millis(vv["ts"]).alias("ts"),
        F.col("row").alias("data"),
        old.alias("old"),
        pks.alias("pks"),
        F.when(vv["isDdl"], vv["sql"]).otherwise(F.lit(None).cast("string")).alias("ddl_statement"),
        F.concat_ws("/", vv["database"], vv["table"]).alias("stream_key"),
        # pos is NULL for row-less messages (DDL: data=[]) — they must
        # still carry their stream position, not a NULL seq
        (F.col("seq0") * F.lit(1 << 16) + F.coalesce(F.col("pos"), F.lit(0))).alias("seq"),
    )


_DEBEZIUM_MONGO_VALUE = T.StructType(
    [
        T.StructField("after", T.StringType(), True),   # extended-JSON string
        T.StructField("patch", T.StringType(), True),   # pre-4.x update shape
        T.StructField("filter", T.StringType(), True),  # delete/update selector
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType(), True),
                    T.StructField("rs", T.StringType(), True),
                    T.StructField("collection", T.StringType(), True),
                    T.StructField("ts_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
        T.StructField("op", T.StringType(), True),  # c/u/d/r
        T.StructField("ts_ms", T.LongType(), True),
    ]
)


def from_debezium_mongo_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode Debezium-MongoDB JSON into the envelope — the oplog tailer
    re-expressed (pkg/inputs/mongostream/oplog_tailer.go:150-216):
    insert → full document, update → full row image (capture.mode
    full_document; pre-4.x `patch` accepted as fallback), delete → EMPTY
    data map, and pks is always {_id} regardless of op. Unlike the MySQL
    topic shape, Debezium-Mongo `after` is an extended-JSON STRING — a
    second from_json stringifies nested sub-documents into the map
    values, which is exactly the envelope's string-map contract.

    Stream key is the tailer's fixed "mongooplog"; seq is the Kafka
    offset when present, else source ts_ms (the oplog ts equivalent).
    """
    empty_map = F.from_json(F.lit("{}"), T.MapType(T.StringType(), T.StringType()))
    v = F.from_json(F.col(value_col).cast("string"), _DEBEZIUM_MONGO_VALUE)
    op = (
        F.when(v["op"].isin("c", "r"), F.lit(OP_INSERT))
        .when(v["op"] == "u", F.lit(OP_UPDATE))
        .when(v["op"] == "d", F.lit(OP_DELETE))
        .otherwise(F.lit(None))
    )
    doc = F.coalesce(v["after"], v["patch"])
    data = F.when(op == OP_DELETE, empty_map).otherwise(
        F.coalesce(F.from_json(doc, T.MapType(T.StringType(), T.StringType())), empty_map)
    )
    # _id may be a scalar or a nested {"$oid": ...} — either way its JSON
    # text is a stable string key (the reference hashes fmt.Sprint(op.Id))
    id_str = F.coalesce(
        F.get_json_object(doc, "$._id"),
        F.get_json_object(v["filter"], "$._id"),
    )
    seq = (
        F.col("offset").cast("long")
        if "offset" in raw.columns
        else v["source"]["ts_ms"]
    )
    return raw.select(
        F.lit(TYPE_DML).alias("type"),
        v["source"]["db"].alias("database"),
        v["source"]["collection"].alias("table"),
        v["source"]["rs"].alias("host"),
        op.alias("op"),
        F.timestamp_millis(v["source"]["ts_ms"]).alias("ts"),
        data.alias("data"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("old"),
        F.create_map(F.lit("_id"), id_str).alias("pks"),
        F.lit(None).cast("string").alias("ddl_statement"),
        F.lit("mongooplog").alias("stream_key"),
        seq.alias("seq"),
    )


_TIDB_BINLOG_VALUE = T.StructType(
    [
        T.StructField("type", T.StringType(), True),        # DML / DDL
        T.StructField("commit_ts", T.LongType(), True),     # TiDB TSO
        T.StructField(
            "ddl_data",
            T.StructType([T.StructField("ddl_query", T.StringType(), True)]),
            True,
        ),
        T.StructField(
            "dml_data",
            T.StructType(
                [
                    T.StructField(
                        "tables",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("schema_name", T.StringType(), True),
                                    T.StructField("table_name", T.StringType(), True),
                                    T.StructField(
                                        "column_info",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType(), True),
                                                    T.StructField("mysql_type", T.StringType(), True),
                                                    T.StructField("is_primary_key", T.BooleanType(), True),
                                                ]
                                            )
                                        ),
                                        True,
                                    ),
                                    T.StructField(
                                        "mutations",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("type", T.StringType(), True),
                                                    T.StructField(
                                                        "row",
                                                        T.StructType(
                                                            [T.StructField("columns", T.ArrayType(T.StringType()), True)]
                                                        ),
                                                        True,
                                                    ),
                                                    T.StructField(
                                                        "change_row",
                                                        T.StructType(
                                                            [T.StructField("columns", T.ArrayType(T.StringType()), True)]
                                                        ),
                                                        True,
                                                    ),
                                                ]
                                            )
                                        ),
                                        True,
                                    ),
                                ]
                            )
                        ),
                        True,
                    )
                ]
            ),
            True,
        ),
    ]
)


def from_tidb_binlog_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode the TiDB binlog-slave format (JSON projection of the
    public slave_binlog.proto) into the envelope — the tidb_kafka input
    (pkg/inputs/tidb_kafka/binlog_tailer.go:125-222):

    - one Binlog message carries N tables × M mutations → exploded to
      one envelope row each, positional columns zipped with column_info
      names; update mutations carry change_row as the old image
    - pks = is_primary_key columns of the NEW row
    - event time = TSO physical time, (commit_ts >> 18)/1000 seconds
      (utils.go:3-7)
    - DDL binlogs surface the raw ddl_query (the reference logs & skips
      applying them; here downstream decides)

    Everything is one from_json + two posexplodes — no Python in the
    row path, so the decode scales like any narrow projection.
    """
    v = F.from_json(F.col(value_col).cast("string"), _TIDB_BINLOG_VALUE)
    seq0 = F.col("offset").cast("long") if "offset" in raw.columns else v["commit_ts"]
    ts = F.timestamp_seconds(F.floor(F.shiftright(v["commit_ts"], 18) / 1000))

    base = raw.select(v.alias("v"), seq0.alias("seq0"), ts.alias("ts"))

    ddl = base.filter(F.col("v.type") == "DDL").select(
        F.lit(TYPE_DDL).alias("type"),
        F.lit(None).cast("string").alias("database"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("string").alias("op"),
        F.col("ts"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("data"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("old"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("pks"),
        F.col("v.ddl_data.ddl_query").alias("ddl_statement"),
        F.lit("tidb-kafka").alias("stream_key"),
        (F.col("seq0") * F.lit(1 << 20)).alias("seq"),
    )

    tables = base.filter(F.col("v.type") == "DML").select(
        "seq0", "ts",
        F.posexplode(F.coalesce(F.col("v.dml_data.tables"), F.array())).alias("ti", "t"),
    )
    muts = tables.select(
        "seq0", "ts", "ti",
        F.col("t.schema_name").alias("database"),
        F.col("t.table_name").alias("table"),
        F.col("t.column_info").alias("cols"),
        F.posexplode(F.coalesce(F.col("t.mutations"), F.array())).alias("mi", "m"),
    )
    names = F.transform(F.col("cols"), lambda c: c["name"])
    data = F.map_from_arrays(names, F.col("m.row.columns"))
    old = F.when(
        F.col("m.change_row").isNotNull() & F.col("m.change_row.columns").isNotNull(),
        F.map_from_arrays(names, F.col("m.change_row.columns")),
    )
    pk_entries = F.filter(
        F.arrays_zip(F.col("cols"), F.col("m.row.columns").alias("val")),
        lambda e: F.coalesce(e["cols"]["is_primary_key"], F.lit(False)),
    )
    pks = F.map_from_entries(
        F.transform(pk_entries, lambda e: F.struct(e["cols"]["name"], e["val"]))
    )
    op = (
        F.when(F.col("m.type") == "Insert", F.lit(OP_INSERT))
        .when(F.col("m.type") == "Update", F.lit(OP_UPDATE))
        .when(F.col("m.type") == "Delete", F.lit(OP_DELETE))
        .otherwise(F.lit(None))
    )
    dml = muts.select(
        F.lit(TYPE_DML).alias("type"),
        "database",
        "table",
        F.lit(None).cast("string").alias("host"),
        op.alias("op"),
        "ts",
        data.alias("data"),
        old.alias("old"),
        pks.alias("pks"),
        F.lit(None).cast("string").alias("ddl_statement"),
        F.lit("tidb-kafka").alias("stream_key"),
        (
            F.col("seq0") * F.lit(1 << 20)
            + F.col("ti") * F.lit(1 << 10)
            + F.col("mi")
        ).alias("seq"),
    )
    return dml.unionByName(ddl)


def decompose_pk_updates(changes: DataFrame) -> DataFrame:
    """Split primary-key-changing updates into DELETE(old) + INSERT(new).

    Reference: pkg/inputs/mysqlstream/msg.go:170-225 — an update whose PK
    columns changed is emitted as two messages: first a delete carrying
    the OLD image (pks generated from the old values), then an insert
    carrying the NEW image (pks from the new values). A downstream
    upsert-by-PK sink would otherwise leave the old row behind.

    Sequence numbers are uniformly rescaled (seq → 2·seq, delete at
    2·seq, its insert at 2·seq+1, untouched rows at 2·seq+1) so relative
    source order — including the delete-before-insert pair order — is
    preserved within each stream.

    One narrow map stage (when/explode), no shuffle; safe in streaming.
    """
    empty_map = F.create_map().cast(T.MapType(T.StringType(), T.StringType()))
    pk_keys = F.map_keys(F.col("pks"))
    old_map = F.coalesce(F.col("old"), empty_map)
    old_pks = F.map_filter(old_map, lambda k, _: F.array_contains(pk_keys, k))
    # MapType has no equality — compare sorted entry arrays instead
    pk_changed = (
        (F.col("op") == OP_UPDATE)
        & F.col("old").isNotNull()
        & (
            F.array_sort(F.map_entries(old_pks))
            != F.array_sort(F.map_entries(F.col("pks")))
        )
    )

    def _row(op, data, old, pks, seq):
        return F.struct(
            F.col("type").alias("type"),
            F.col("database").alias("database"),
            F.col("table").alias("table"),
            F.col("host").alias("host"),
            op.alias("op"),
            F.col("ts").alias("ts"),
            data.alias("data"),
            old.alias("old"),
            pks.alias("pks"),
            F.col("ddl_statement").alias("ddl_statement"),
            F.col("stream_key").alias("stream_key"),
            seq.alias("seq"),
        )

    null_map = F.lit(None).cast(T.MapType(T.StringType(), T.StringType()))
    two = F.array(
        _row(F.lit(OP_DELETE), old_map, null_map, old_pks, F.col("seq") * 2),
        _row(F.lit(OP_INSERT), F.col("data"), null_map, F.col("pks"), F.col("seq") * 2 + 1),
    )
    one = F.array(
        _row(F.col("op"), F.col("data"), F.col("old"), F.col("pks"), F.col("seq") * 2 + 1)
    )
    rows = F.when(pk_changed, two).otherwise(one)
    return changes.select(F.explode(rows).alias("m")).select("m.*")


def typed_view(changes: DataFrame, schema: T.StructType, pk_cols: list[str]) -> DataFrame:
    """Project the string-map payload to a typed per-table view.

    Once a stream is routed to a single (db, table), casting the map to
    typed columns keeps everything downstream JVM-side/codegen'd.
    """
    cols = [F.col("data").getItem(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    return changes.select("op", "ts", "seq", *cols)


def memory_changes(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build an envelope DataFrame from plain dicts (test helper)."""
    def norm(r: dict) -> dict:
        out = {f.name: None for f in MSG_SCHEMA.fields}
        out.update(r)
        if out.get("type") is None:
            out["type"] = TYPE_DML
        for k in ("data", "old", "pks"):
            if out.get(k) is not None:
                out[k] = {str(a): (None if b is None else str(b)) for a, b in out[k].items()}
        return out

    return spark.createDataFrame([norm(r) for r in rows], MSG_SCHEMA)
