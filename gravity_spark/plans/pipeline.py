"""Pipeline assembly: declarative config → wired Spark job.

Reference parity:
  - pkg/config/config_v3.go:12-20 — PipelineConfigV3: input + filters +
    scheduler + output (+ routes); TOML
  - pkg/app/server.go:38-105 — assembly order output → scheduler →
    filters → emitter → input; registry lookups
    (pkg/registry/registry.go:12-80)
  - start order pkg/app/server.go:148-183, teardown 185-209

There is no optimizer in the reference — config runs literally. Here
the "plugin graph" is a composed DataFrame plan, so Catalyst DOES
optimize the whole pipeline (filter→source pushdown etc.) for free.

Config (TOML or dict):

    [input]
    type = "parquet-batch" | "file-cdc" | "kafka-cdc"
    mode = "batch" | "stream" | "replication"
    [input.config]  # per-type options

    [[filters]]
    type = "accept" | "reject" | "delete-dml-column" | "rename-dml-column"
    [filters.config]
    "match-table" = "users*"

    [output]
    type = "parquet-merge" | "console" | "memory"
    [output.config]
    path = "/tmp/target"; pk = ["id"]; schema = "id long, v string"
    [[output.routes]]
    "match-schema" = "app"; "target-schema" = "warehouse"
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass
from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from gravity_spark.core.envelope import MSG_SCHEMA
from gravity_spark.operators.upsert import ENGINE_REPLACE
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
from gravity_spark.streaming.pipeline import (
    file_cdc_source,
    kafka_cdc_source,
    run_stream,
    transform_changes,
)


@dataclass
class Pipeline:
    """An assembled pipeline: call run_batch() or start_stream()."""

    spark: SparkSession
    config: Mapping[str, Any]
    source: Callable[[], DataFrame]
    transform: Callable[[DataFrame], DataFrame]
    is_streaming: bool
    target: ParquetMergeTarget | None
    typed: Callable[[DataFrame], DataFrame] | None
    checkpoint: str | None

    def dataframe(self) -> DataFrame:
        return self.transform(self.source())

    def run_batch(self) -> None:
        assert self.target is not None
        self.target.apply_batch(self.typed(self.dataframe()))

    def start_stream(self):
        assert self.is_streaming and self.target is not None
        return run_stream(
            self.dataframe(), self.target, self.typed, self.checkpoint
        )


def _build_source(spark: SparkSession, spec: Mapping[str, Any]):
    kind = spec["type"]
    cfg = spec.get("config", {})
    if kind == "parquet-batch":
        return (lambda: spark.read.parquet(cfg["path"])), False
    if kind == "file-cdc":
        return (
            lambda: file_cdc_source(
                spark, cfg["path"], cfg.get("format", "json"),
                cfg.get("max-files-per-trigger"),
            ),
            True,
        )
    if kind == "kafka-cdc":
        return (
            lambda: kafka_cdc_source(
                spark, cfg["brokers"], cfg["topics"],
                cfg.get("starting-offsets", "latest"),
                cfg.get("decoder", "debezium"),
            ),
            True,
        )
    if kind == "jdbc-batch":
        # reference mysql/mongo batch mode: partitioned keyset read
        # (pkg/inputs/mysqlbatch); requires a JDBC driver jar at runtime
        from gravity_spark.sources.batch import jdbc_partitioned_reader

        return (lambda: jdbc_partitioned_reader(spark, **cfg)), False
    if kind == "memory-batch":  # tests: envelope rows provided inline
        from gravity_spark.core.envelope import memory_changes

        return (lambda: memory_changes(spark, cfg["rows"])), False
    raise ValueError(f"unknown input type {kind!r}")


def _default_typed(pk: list[str], schema_ddl: str) -> Callable[[DataFrame], DataFrame]:
    """Envelope → typed change rows for the merge sink, using the
    declared target schema (schema-store equivalent)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(schema_ddl)

    def fn(changes: DataFrame) -> DataFrame:
        cols = [
            F.col("data").getItem(f.name).cast(f.dataType).alias(f.name)
            for f in struct.fields
        ]
        return changes.select(*cols, "op", "seq")

    return fn


def build_pipeline(spark: SparkSession, config: Mapping[str, Any]) -> Pipeline:
    from gravity_spark.plans.config import normalize_pipeline_config

    config = normalize_pipeline_config(config)
    source, streaming = _build_source(spark, config["input"])
    filters = list(config.get("filters", ()))
    routes = list(config.get("output", {}).get("routes", ()))

    def transform(df: DataFrame) -> DataFrame:
        return transform_changes(df, filters, routes)

    out_spec = config.get("output", {})
    target = None
    typed = None
    checkpoint = None
    if out_spec.get("type") == "parquet-merge":
        ocfg = out_spec["config"]
        target = ParquetMergeTarget(
            spark,
            ocfg["path"],
            ocfg["pk"],
            ocfg["schema"],
            ocfg.get("engine", ENGINE_REPLACE),
            partition_col=ocfg.get("partition-col"),
        )
        typed = _default_typed(ocfg["pk"], ocfg["schema"])
        checkpoint = ocfg.get("checkpoint", ocfg["path"] + "/_checkpoint")
    elif out_spec.get("type") == "multi-table-merge":
        # one stream fanned out to per-(db,table) merge targets; the
        # catalog supplies each table's typed projection
        from gravity_spark.core.catalog import Catalog, ColumnDef, TableDef
        from gravity_spark.sinks.multi_table import MultiTableMergeSink

        ocfg = out_spec["config"]
        catalog = Catalog()
        targets = {}
        for tspec in ocfg["tables"]:
            cols = [
                ColumnDef(c["name"], c["type"], is_pk=c.get("pk", False))
                for c in tspec["columns"]
            ]
            tdef = TableDef(tspec["database"], tspec["table"], cols)
            catalog.put(tdef)
            targets[(tspec["database"], tspec["table"])] = ParquetMergeTarget(
                spark,
                f"{ocfg['path']}/{tspec['database']}.{tspec['table']}",
                tdef.pk_columns,
                ", ".join(f"{c.name} {c.spark_type.simpleString()}" for c in cols),
            )
        target = MultiTableMergeSink(targets, catalog)
        typed = lambda df: df  # the sink routes + types per table  # noqa: E731
        checkpoint = ocfg.get("checkpoint", ocfg["path"] + "/_checkpoint")
    elif out_spec.get("type") == "kafka-wire":
        # serialize to the configured wire format; caller sinks the
        # (key, value) frame (or writes via sinks.wire.write_kafka)
        from gravity_spark.sinks.wire import to_wire_pb, to_wire_v01, to_wire_v20

        version = out_spec.get("config", {}).get("version", "0.1")
        wire_fn = {"0.1": to_wire_v01, "pb": to_wire_pb}.get(version, to_wire_v20)
        prev_transform = transform

        def transform(df: DataFrame, _prev=prev_transform, _wire=wire_fn) -> DataFrame:  # noqa: F811
            return _wire(_prev(df))
    elif out_spec.get("type") not in (None, "console", "memory"):
        # the reference validates plugin names at registry-lookup time
        # (pkg/registry); an unknown output must fail the BUILD so a
        # hot-reload rejects the config instead of running sink-less
        raise ValueError(f"unknown output type {out_spec.get('type')!r}")
    return Pipeline(
        spark=spark,
        config=config,
        source=source,
        transform=transform,
        is_streaming=streaming,
        target=target,
        typed=typed,
        checkpoint=checkpoint,
    )


def load_pipeline(spark: SparkSession, toml_path: str) -> Pipeline:
    with open(toml_path, "rb") as f:
        config = tomllib.load(f)
    return build_pipeline(spark, config)
