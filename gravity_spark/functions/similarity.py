"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:

- brute_force_topk: exact cosine top-k. The query set is broadcast
  (no shuffle of the big side); per-row cost is one fused zip_with/
  aggregate expression, fully JVM-side. Right answer for small query
  batches over huge corpora.
- lsh_bucket_topk: sign-bit LSH buckets → candidates share a bucket →
  top-k within bucket. Turns the cross product into an equi-join; the
  bucket id is deterministic (sign of fixed dimensions), so the DuckDB
  oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    ``queries``: (query_id, embedding). Broadcast-cross-join — the
    corpus never shuffles; ranking shuffles only (query_id, vec_id,
    sim) triples.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_similarity(
            F.col(vec_col).cast("array<double>"), F.col("__qvec").cast("array<double>")
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("sim", 6).alias("sim"), "rank")
    )


def sign_bucket(vec: Column, dims: Sequence[int]) -> Column:
    """Deterministic LSH bucket id: sign bits of the given dimensions.

    Equivalent to random-hyperplane LSH with axis-aligned planes; axes
    are fixed so results are reproducible across engines.
    """
    bucket = F.lit(0)
    for j, d in enumerate(dims):
        bit = F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: Sequence[int] = (0, 1, 2, 3),
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's sign bucket
    are scored. Bucket join replaces the cross join — at 1000 executors
    the corpus is hash-partitioned by bucket and each query touches one
    partition's worth of candidates."""
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(F.col(vec_col), dims).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        sign_bucket(F.col(vec_col), dims).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_similarity(
            F.col("__cvec").cast("array<double>"), F.col("__qvec").cast("array<double>")
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("sim", 6).alias("sim"), "rank")
    )


def default_bands(dim: int = 64, dims_per_band: int = 8) -> list[tuple[int, ...]]:
    """Deterministic band layout: disjoint runs of `dims_per_band` sign
    dimensions. 64-dim embedding → 8 bands × 8 bits = 256 buckets per
    band; every dimension participates, so recall doesn't hinge on a
    handful of arbitrary axes."""
    n_bands = dim // dims_per_band
    return [
        tuple(range(b * dims_per_band, (b + 1) * dims_per_band))
        for b in range(n_bands)
    ]


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: Sequence[Sequence[int]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED sign-LSH.

    Round-1 design used one 6-bit bucket (64 buckets total): at 100 TB
    each bucket holds ~1.6% of the corpus and the within-bucket
    self-join is O((n/64)²) — a scale-killer. Now each vector gets one
    bucket id per band (default 8 bands × 8 sign bits = 256 buckets per
    band, 2048 (band, bucket) keys total); candidates are pairs sharing
    ANY band's bucket (same shape as minhash_lsh_pairs in dedup.py).
    The self-join key is (band, bucket), so per-group size shrinks as
    dims_per_band grows — tune bits per band, not the algorithm, as the
    corpus grows. Candidate pairs are deduped BEFORE the cosine verify
    so each pair is scored once.

    Mirrors the reference's dedup role (no direct counterpart — the
    reference is row-replication; this is the LLM-corpus extension).
    """
    if bands is None:
        bands = default_bands()
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                sign_bucket(F.col(vec_col), dims).alias("bucket"),
            )
            for i, dims in enumerate(bands)
        ]
    )
    c = (
        corpus.select(F.col(id_col), F.col(vec_col), F.explode(entries).alias("bb"))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("bb.band").alias("__band"),
            F.col("bb.bucket").alias("__bucket"),
        )
    )
    a = c.alias("a")
    b = c.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("__va"),
            F.col(f"b.{vec_col}").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = cosine_similarity(
        F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>")
    )
    return (
        cand.select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
