"""Routing: (db, table) → (target db, table) renames.

Reference parity:
  - pkg/core/router.go:3-10 — router interface
  - pkg/outputs/routers/mysql_router.go:10-85 — match-schema/match-table
    scoped routes with target-schema / target-table rewrites; first
    matching route wins; unmatched rows are dropped (router acts as the
    output's accept-list, cf. binlog_tailer.go:317-325 pre-filter).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gravity_spark.core.matchers import compile_matchers


def route(df: DataFrame, routes: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Apply first-match-wins routes; drop unrouted rows.

    Each route: {"match-schema": ..., "match-table": ...,
    "target-schema": str|None, "target-table": str|None}.
    """
    if not routes:
        return df

    matched = F.lit(False)
    target_db = F.col("database")
    target_table = F.col("table")
    # build reversed so the FIRST route has the outermost (winning) when()
    for r in reversed(routes):
        cond = compile_matchers(r)
        this_db = F.lit(r["target-schema"]) if r.get("target-schema") else F.col("database")
        this_table = F.lit(r["target-table"]) if r.get("target-table") else F.col("table")
        target_db = F.when(cond, this_db).otherwise(target_db)
        target_table = F.when(cond, this_table).otherwise(target_table)
        matched = cond | matched

    # one simultaneous projection: both rewrites must see the ORIGINAL
    # (database, table) — sequential withColumn would re-evaluate the
    # table matcher against the already-rewritten database
    replaced = {"database": target_db, "table": target_table}
    return df.filter(matched).select(
        *[replaced[c].alias(c) if c in replaced else F.col(c) for c in df.columns]
    )
