"""Source↔target range-count verifier (the `cmd/verifier` CLI).

Reference parity:
  - cmd/verifier/main.go:300-347 — workers recursively bisect
    [min, max], COUNT(*) source vs target per range over live DB
    connections, and report mismatched ranges
  - cmd/verifier/main.go:86-131 — Shading mode: same-named shard
    tables enumerated on both sides and compared pairwise
  - cmd/verifier/main.go:361-363 — per-range predicate is
    `col BETWEEN ? AND ?`

Spark-first reformulation: the recursive task queue is a driver-side
round trip per range (O(log n) sequential COUNT queries along every
mismatched path). Here ONE scan per side computes the counts of all
2^depth leaf ranges at once (integer bucket arithmetic, exact), and a
full-outer join localizes every mismatched leaf simultaneously — the
all-match case is two scans + one tiny join regardless of how many
ranges the reference would have probed. Any bisection level's count is
the sum of its leaves, so the leaf table subsumes the reference's
whole recursion tree. At 100 TB each side is a single
partial-aggregated shuffle of ≤2^depth rows per mapper.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def leaf_counts(
    df: DataFrame, col: str, lo: int, hi: int, depth: int, out: str
) -> DataFrame:
    """COUNT(*) per leaf range; bucket = (v-lo)*2^depth DIV width,
    exact in BIGINT for width·2^depth < 2^63."""
    nb = 1 << depth
    width = hi - lo + 1
    bucket = F.expr(f"CAST((({col} - {lo}) * {nb}) DIV {width} AS BIGINT)")
    return (
        df.filter(F.col(col).between(lo, hi))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias(out))
    )


def range_count_compare(
    source: DataFrame,
    target: DataFrame,
    col: str,
    lo: int,
    hi: int,
    depth: int = 10,
) -> DataFrame:
    """Mismatched leaf ranges: (bucket, range_lo, range_hi, source_cnt,
    target_cnt, diff) with diff = target - source (the reference's sign
    convention, main.go:311), ordered by range_lo."""
    nb = 1 << depth
    width = hi - lo + 1
    j = leaf_counts(source, col, lo, hi, depth, "source_cnt").join(
        leaf_counts(target, col, lo, hi, depth, "target_cnt"),
        "bucket",
        "full_outer",
    )
    b = F.col("bucket")
    s = F.coalesce(F.col("source_cnt"), F.lit(0)).cast("long")
    t = F.coalesce(F.col("target_cnt"), F.lit(0)).cast("long")
    return (
        j.select(
            b.cast("long").alias("bucket"),
            F.expr(f"CAST({lo} + (bucket * {width}) DIV {nb} AS BIGINT)").alias(
                "range_lo"
            ),
            F.expr(
                f"CAST({lo} + ((bucket + 1) * {width}) DIV {nb} - 1 AS BIGINT)"
            ).alias("range_hi"),
            s.alias("source_cnt"),
            t.alias("target_cnt"),
            (t - s).alias("diff"),
        )
        .filter(F.col("diff") != 0)
        .orderBy("range_lo")
    )


def sharded_union(shards: Sequence[tuple[str, DataFrame]]) -> DataFrame:
    """Shading mode: shard tables merged into one logical side with a
    provenance column (main.go:97-131 enumerates same-named shards on
    both sides; counts then compare over the union)."""
    out = None
    for name, df in shards:
        part = df.withColumn("__shard", F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out
