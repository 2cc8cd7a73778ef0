"""Schema catalog: the schema-store equivalent + MySQL→Spark type codec.

Reference parity:
  - pkg/schema_store/schema_store.go:42-58 — source column taxonomy
  - pkg/schema_store/schema_store.go:61-87 — Column flags (nullable,
    unsigned, pk, generated, default) and Table (ordered columns +
    PrimaryKeyColumns + UniqueKeyColumnMap)
  - pkg/inputs/mysqlstream/msg.go:230-273 — byte→value coercions
    (unsigned fix-ups, mediumint 3-byte case, bytes→string)
  - DDL-driven invalidation: pkg/inputs/mysqlstream/binlog_tailer.go:432-455

Design: the catalog is CONTROL PLANE state — tiny, driver-side,
serializable to JSON — never shipped through the data stream (the
stream carries only (db, table) addressing; the executor-side cast
expressions are generated from the catalog at plan time). That is what
keeps schema lookups O(1) per-plan instead of per-row at 100 TB.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, asdict

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- MySQL → Spark type mapping (FIXTURES.md F4) ----------------------

def mysql_to_spark_type(mysql_type: str) -> T.DataType:
    """Map a MySQL column type string to the Spark type.

    Unsigned integers widen to the next size (bigint unsigned →
    DecimalType(20,0) since it exceeds LongType), mirroring the
    reference's coercion table (msg.go:230-273).
    """
    t = mysql_type.strip().lower()
    unsigned = "unsigned" in t
    base = re.split(r"[(\s]", t, 1)[0]

    if base == "tinyint":
        return T.ShortType() if unsigned else T.ByteType()
    if base == "smallint":
        return T.IntegerType() if unsigned else T.ShortType()
    if base == "mediumint":
        return T.IntegerType()  # fits either way (3-byte)
    if base in ("int", "integer"):
        return T.LongType() if unsigned else T.IntegerType()
    if base == "bigint":
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if base in ("decimal", "numeric"):
        m = re.search(r"\((\d+)\s*,\s*(\d+)\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        m = re.search(r"\((\d+)\)", t)
        return T.DecimalType(int(m.group(1)) if m else 10, 0)
    if base == "float":
        return T.FloatType()
    if base in ("double", "real"):
        return T.DoubleType()
    if base == "bit":
        m = re.search(r"\((\d+)\)", t)
        return T.BooleanType() if (not m or int(m.group(1)) == 1) else T.BinaryType()
    if base in ("datetime", "timestamp"):
        return T.TimestampType()
    if base == "date":
        return T.DateType()
    if base == "time":
        return T.StringType()  # no interval-of-day type; keep lexical
    if base == "year":
        return T.IntegerType()
    if base in ("char", "varchar", "tinytext", "text", "mediumtext", "longtext",
                "enum", "set", "json"):
        return T.StringType()
    if base in ("binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob"):
        return T.BinaryType()
    return T.StringType()  # unknown → lexical passthrough


def coerce_from_string(
    col: SparkColumn, mysql_type: str, lenient: bool = False
) -> SparkColumn:
    """Cast an envelope string value to the typed column, with the
    reference's edge cases: zero-dates → NULL
    (integration_test/mysql_mysql_test.go:770), bit(1) '0'/'1' → bool.

    ``lenient=True`` uses try_cast so malformed values yield NULL
    instead of an ANSI runtime error — the probe mode dead-letter
    validation (operators.filters.split_dead_letter) runs in; the
    default strict mode errors on corrupt data like the reference's
    apply path does."""
    spark_type = mysql_to_spark_type(mysql_type)

    def cast(c: SparkColumn, t) -> SparkColumn:
        return c.try_cast(t) if lenient else c.cast(t)

    if isinstance(spark_type, (T.TimestampType, T.DateType)):
        cleaned = F.when(
            col.startswith("0000-00-00"), F.lit(None).cast("string")
        ).otherwise(col)
        return cast(cleaned, spark_type)
    if isinstance(spark_type, T.BooleanType):
        return (cast(col, "int") != 0).cast("boolean")
    return cast(col, spark_type)


# --- catalog entities --------------------------------------------------

@dataclass
class ColumnDef:
    name: str
    mysql_type: str
    nullable: bool = True
    is_pk: bool = False
    default: str | None = None
    generated: bool = False

    @property
    def spark_type(self) -> T.DataType:
        return mysql_to_spark_type(self.mysql_type)


@dataclass
class TableDef:
    database: str
    name: str
    columns: list[ColumnDef] = field(default_factory=list)
    unique_keys: dict[str, list[str]] = field(default_factory=dict)

    @property
    def pk_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_pk]

    def scan_column(self, row_count: int = 0, max_full_dump: int = 10_000) -> str | None:
        from gravity_spark.sources.batch import detect_scan_column

        return detect_scan_column(
            self.pk_columns, list(self.unique_keys.values()), row_count, max_full_dump
        )

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )

    def typed_projection(self, changes: DataFrame) -> DataFrame:
        """Envelope (string-map payload) → typed per-table rows, applying
        the full coercion table. Generated at plan time; codegen'd casts
        at run time."""
        cols = [
            coerce_from_string(F.col("data").getItem(c.name), c.mysql_type).alias(c.name)
            for c in self.columns
            if not c.generated
        ]
        return changes.select(*cols, "op", "seq")


class Catalog:
    """In-memory table registry with JSON persistence — the
    PositionRepo-style control-plane store for schemas."""

    def __init__(self) -> None:
        self.tables: dict[tuple[str, str], TableDef] = {}

    def put(self, table: TableDef) -> None:
        self.tables[(table.database, table.name)] = table

    def get(self, database: str, name: str) -> TableDef:
        return self.tables[(database, name)]

    def drop(self, database: str, name: str) -> None:
        self.tables.pop((database, name), None)

    def invalidate(self, database: str, name: str) -> None:
        """DDL-driven cache invalidation hook (binlog_tailer.go:432-455);
        in this engine the catalog IS the source of truth, so apply_ddl
        mutates directly — this exists for API parity with refresh-from-
        source deployments."""
        # no-op: catalog is authoritative here

    def to_json(self) -> str:
        return json.dumps(
            {
                f"{db}.{name}": asdict(t)
                for (db, name), t in self.tables.items()
            },
            indent=2,
            default=str,
        )

    @classmethod
    def from_json(cls, payload: str) -> "Catalog":
        cat = cls()
        for _, tdict in json.loads(payload).items():
            cols = [ColumnDef(**c) for c in tdict.pop("columns")]
            cat.put(TableDef(columns=cols, **tdict))
        return cat
