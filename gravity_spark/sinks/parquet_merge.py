"""Parquet merge sink: the MySQL-output equivalent for the local harness.

Reference parity: pkg/outputs/mysql/mysql.go:222-482 (routed DML apply)
with the engine variants in gravity_spark.operators.upsert. Without a
transactional table format in the image, the sink maintains a parquet
directory per (database, table) with an atomic swap:

    current state + change batch → merge_changes → write new version dir
    → flip a pointer file

At cluster scale the same code path targets Delta/Iceberg `MERGE INTO`
(swap `_apply_batch` for a MERGE); partition-level rewrite replaces the
full-version rewrite. The version-dir + pointer scheme keeps readers
consistent (they always read a fully-written version) — the moral
equivalent of the reference's position-flush-after-commit ordering
(pkg/position_cache/cache.go:13,261).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from gravity_spark.operators.upsert import ENGINE_REPLACE, merge_changes


class ParquetMergeTarget:
    """A versioned parquet table that accepts change batches."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_cols: Sequence[str],
        schema_ddl: str,
        engine: str = ENGINE_REPLACE,
    ) -> None:
        self.spark = spark
        self.path = path
        self.pk_cols = list(pk_cols)
        self.schema_ddl = schema_ddl
        self.engine = engine
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current.json")

    def _current_version(self) -> int | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return json.load(f)["version"]

    def read(self) -> DataFrame:
        v = self._current_version()
        if v is None:
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def apply_batch(self, changes: DataFrame, epoch_id: int | None = None) -> None:
        """Idempotent batch apply (safe for foreachBatch redelivery):
        merging an already-applied batch yields the same state."""
        merged = merge_changes(self.read(), changes, self.pk_cols, self.engine)
        next_v = (self._current_version() or 0) + 1
        out = os.path.join(self.path, f"v{next_v}")
        merged.write.mode("overwrite").parquet(out)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": next_v, "epoch": epoch_id}, f)
        os.replace(tmp, self._pointer)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""
        def fn(df: DataFrame, epoch_id: int) -> None:
            self.apply_batch(df, epoch_id)
        return fn
