"""Skew handling: salted two-phase aggregation and salted joins.

At 100 TB a single hot key (one viral user, one default value) can pin
an entire shuffle partition. AQE's skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on in our session factory) covers
sort-merge joins; these helpers cover the cases AQE does not:

- salted_agg: two-phase aggregation for algebraic aggregates over a
  skewed group key — partial per (key, salt), then final per key. The
  hot key's rows spread across `salts` partitions in phase one.
- salted_join: explicit replicate-small-side salt join for skewed
  equi-joins where the small side is too big to broadcast but small
  enough to replicate `salts` times.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs``: {out_col: (agg_fn, in_col)} with agg_fn in
    {sum, count, min, max} (algebraic — re-aggregatable).
    """
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    salted = df.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    across all salts, join on (key, salt). The hot key's rows land in
    `salts` different partitions instead of one."""
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")


def top_frequent_keys(df: DataFrame, key: str, threshold_ratio: float = 0.01) -> list:
    """Detect hot keys (> ratio of all rows) — input for targeted
    salting when only specific keys skew."""
    total = df.count()
    hot = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total * threshold_ratio)
    )
    return [r[key] for r in hot.collect()]
