"""Portable Bloom filter build + probe as DataFrame operations.

The classic scale pattern for filtering a huge table against a big
blocklist (bad URLs, contaminated fingerprints, banned n-grams): build
a bit array over the blocklist, broadcast it, and prefilter the big
side so only might-contain rows reach the exact verify join. Spark's
own runtime row-level filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) applies the same idea inside joins; this operator
makes it an explicit, engine-portable primitive — every hash is
md5-derived, so a SQL oracle reproduces the bitmap and every FP
bit-for-bit.

Layout: m bits packed into ceil(m/63) BIGINT words, 63 bits per word
— the sign bit stays clear so ``1 << bit`` can't overflow in engines
that range-check the shift (DuckDB raises on ``1::BIGINT << 63``) and
arithmetic right-shifts never sign-extend. Build is one
aggregation: per value, k salted positions → (word_idx, 1<<bit) →
``bit_or`` per word. Probe is a broadcast equi-join of the k probe
positions against the ≤ m/63-row bitmap — no corpus shuffle.

No reference counterpart (gravity replicates rows); this is the
training-data-pipeline extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex8_salted(val: Column, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), val)), 1, 8), 16, 10
    ).cast("long")


def bloom_build(values: DataFrame, col: str, m: int = 2048, k: int = 3) -> DataFrame:
    """(word_idx, bits) bitmap over the distinct values of `col`.

    One shuffle keyed by word_idx — at most m/63 reducer rows after
    map-side bit_or combine, regardless of blocklist size."""
    pos = None
    for i in range(k):
        p = values.select((_hex8_salted(F.col(col), f"s{i}:") % m).alias("p"))
        pos = p if pos is None else pos.unionByName(p)
    return (
        pos.select(
            (F.col("p") / 63).cast("long").alias("word_idx"),
            # shiftleft with a COLUMN shift amount needs the SQL form —
            # the Python wrapper only takes literal ints
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def bloom_might_contain(
    probe: DataFrame,
    col: str,
    bloom: DataFrame,
    m: int = 2048,
    k: int = 3,
    out_col: str = "bloom_hit",
    id_col: str | None = None,
) -> DataFrame:
    """Adds `out_col`: true iff all k bits for `col` are set.

    The bitmap is broadcast; the probe side explodes ×k, joins on
    word_idx, and re-aggregates per probe row — the big side never
    shuffles (the k-explode and regroup stay within the probe row's
    partition via the __rid key; with AQE the join is a broadcast hash
    join, so the regroup is the only exchange and carries one boolean
    per probe row per salt)."""
    if id_col is not None:
        base = probe.withColumn("__rid", F.col(id_col))
    else:
        # fallback correlation key; fine because it is never output and
        # both uses share one physical scan lineage — callers with a
        # natural unique key should pass id_col
        base = probe.withColumn("__rid", F.monotonically_increasing_id())
    pos = None
    for i in range(k):
        p = base.select(
            "__rid", (_hex8_salted(F.col(col), f"s{i}:") % m).alias("p")
        )
        pos = p if pos is None else pos.unionByName(p)
    checks = (
        pos.select(
            "__rid",
            (F.col("p") / 63).cast("long").alias("word_idx"),
            (F.col("p") % 63).cast("int").alias("__bit"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__rid",
            F.when(
                F.col("bits").isNotNull()
                & (F.expr("shiftright(bits, __bit) & 1") == 1),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("__ok"),
        )
    )
    verdict = checks.groupBy("__rid").agg(
        (F.min("__ok") == 1).alias(out_col)
    )
    return base.join(verdict, "__rid").drop("__rid")
