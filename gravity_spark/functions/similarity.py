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


# Measured on a 250k-pair self-join (local[32], 64-dim): the zip_with/
# aggregate HOF dot runs ~1-5 µs/pair; an unrolled 64-term element_at
# chain is ~3× SLOWER (giant codegen method), and per-PAIR norm
# evaluation dominates everything (2 extra HOF aggregates per pair).
# Moral: precompute norms per vector, keep the HOF dot for pairs.


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
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
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
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
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
    # r10 (guide §2.3/§8: decide with small rows, move payloads once):
    # the banded self-join and the pair dedup run over (id, band,
    # bucket) ONLY — the old shape carried both embedding arrays
    # through the band-replicated candidate shuffle (payload × bands ×
    # 2 sides) and again through the distinct. Vectors attach to the
    # deduped pair set with two id-keyed joins, so each embedding
    # crosses a shuffle once per side.
    keys = corpus.select(F.col(id_col), F.explode(entries).alias("bb")).select(
        F.col(id_col),
        F.col("bb.band").alias("__band"),
        F.col("bb.bucket").alias("__bucket"),
    )
    a = keys.alias("a")
    b = keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    cand = pairs.join(va, "id_a").join(vb, "id_b")
    sim = cosine_similarity(
        F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>")
    )
    return (
        cand.select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


# --- SemDeDup: k-means clustering + within-cluster cosine prune ----------


def scale_embedding(vec: Column, scale: int = 1_000_000) -> Column:
    """Embedding as exact scaled integers — distributed float sums are
    order-dependent; integer sums are exact in any order (the
    embedding_centroids discipline)."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.round(x * scale).cast("long"),
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Integer squared distance; |x|<=2e6 scaled, dim 64 → ≤2.6e14, well
    inside BIGINT."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign_literal(
    scaled: DataFrame, cents: list[tuple[int, list[int]]], id_col: str
) -> DataFrame:
    """Nearest centroid per vector (ties → smaller cluster id), with the
    centroids inlined as ONE literal array-of-arrays — a pure
    projection: no join, no shuffle, no window. The distance lambda
    appears once (transform over the centroid array), keeping the
    expression tree small enough that Catalyst's cost is flat in k;
    `array_min` over (dist, cluster) structs is a lexicographic min,
    which reproduces ORDER BY dist, cluster exactly."""
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cluster"),
                F.lit([int(v) for v in cxi]).cast("array<long>").alias("cxi"),
            )
            for cid, cxi in cents
        ]
    )
    best = F.array_min(
        F.transform(
            cent_lit,
            lambda c: F.struct(
                _sq_dist(F.col("xi"), c["cxi"]).alias("d"),
                c["cluster"].alias("cluster"),
            ),
        )
    )
    return scaled.withColumn("cluster", best["cluster"])


def _update_centroids(assigned: DataFrame) -> list[tuple[int, list[int]]]:
    """Element-wise integer mean per cluster, as driver-side state.

    One (cluster, dim)-keyed aggregation — shuffle volume ≤ k × dim
    partial sums per mapper, independent of corpus size — collected as
    k × dim rows; the array assembly and the portable floor-div
    (numerator made exactly divisible first, so Spark, Python and any
    SQL oracle compute identical centroids) happen on the driver."""
    pos = assigned.select("cluster", F.posexplode("xi").alias("dim", "v"))
    agg = pos.groupBy("cluster", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    by_cluster: dict[int, dict[int, int]] = {}
    for r in agg.collect():
        s, cnt = int(r["s"]), int(r["cnt"])
        # identical to SQL ((s - ((s % cnt + cnt) % cnt)) / cnt):
        # Python % is already non-negative for cnt > 0
        by_cluster.setdefault(int(r["cluster"]), {})[int(r["dim"])] = (
            s - (s % cnt)
        ) // cnt
    return sorted(
        (cid, [dims[d] for d in sorted(dims)]) for cid, dims in by_cluster.items()
    )


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bounded-rounds Lloyd k-means → (id, cluster).

    Deterministic end to end: seeds are the k smallest-id vectors,
    arithmetic is exact scaled-integer, ties break on cluster id — so a
    SQL oracle reproduces the clustering bit-for-bit. Rounds are fixed
    (no convergence collect) the way graph_pagerank_purchases fixes its
    iteration count.

    Scale shape (the MLlib KMeans discipline): centroids live on the
    driver — k × dim integers, independent of corpus size — and each
    round is (a) a map-only assignment with the centroids inlined as
    literals (no join, no shuffle of the corpus) + (b) one
    (cluster, dim)-keyed aggregation whose shuffle volume is k × dim
    partial sums per mapper, collected back to the driver. Lineage
    depth stays constant per round (each round starts from literals),
    so no checkpointing is needed. At 100 TB grow k (k ≈ n / target
    cluster size) and seed via a sample, keeping clusters bounded for
    the prune stage; the seed selection is a distributed top-k
    (TakeOrdered), never a global sort."""
    # persist: seeds + each round's aggregation + the final assignment
    # all start from the scaled projection — without it each of those
    # rounds+2 jobs rescans the parquet and recomputes the scaling
    cents, assigned = kmeans_fit(corpus, k, rounds, id_col, vec_col)
    return assigned.select(id_col, "cluster")


def _kmeans_partials_fn(cents: list[tuple[int, list[int]]]):
    """mapInPandas body: per batch, numpy nearest-centroid assignment +
    (cluster, dim) partial sums — the Lloyd round's map side in ONE
    vectorized pass (guide §4.2: heavy per-row math belongs in native
    code; the interpreted HOF form evaluated k × dim expression nodes
    per row). All arithmetic is int64-exact, and partial sums are
    order-independent, so the result is bit-identical to the JVM
    `_assign_literal` + posexplode path (pinned by
    tests/test_pq.py::test_kmeans_numpy_matches_literal). Tie-break:
    cents are sorted by cluster id, so argmin's first-minimum = the
    smallest cluster id — the array_min lexicographic rule."""
    import numpy as np
    import pandas as pd

    cents = sorted(cents)
    C = np.array([cxi for _, cxi in cents], dtype=np.int64)
    cids = [int(cid) for cid, _ in cents]

    def f(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["xi"]])
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            code = d.argmin(axis=1)
            out_c, out_d, out_s, out_n = [], [], [], []
            for j, cid in enumerate(cids):
                mask = code == j
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                sums = X[mask].sum(axis=0)
                for dd in range(X.shape[1]):
                    out_c.append(cid)
                    out_d.append(dd)
                    out_s.append(int(sums[dd]))
                    out_n.append(cnt)
            yield pd.DataFrame(
                {"cluster": out_c, "dim": out_d, "s": out_s, "cnt": out_n}
            )

    return f


def _kmeans_assign_fn(cents: list[tuple[int, list[int]]], id_col: str):
    """mapInPandas body for the final (id, xi, cluster) assignment —
    same numpy argmin as _kmeans_partials_fn, same tie-break proof."""
    import numpy as np
    import pandas as pd

    cents = sorted(cents)
    C = np.array([cxi for _, cxi in cents], dtype=np.int64)
    cids = np.array([int(cid) for cid, _ in cents], dtype=np.int64)

    def f(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["xi"]])
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            pdf = pdf[[id_col, "xi"]].copy()
            pdf["cluster"] = cids[d.argmin(axis=1)]
            yield pdf

    return f


def _collect_centroids(partials: DataFrame) -> list[tuple[int, list[int]]]:
    """groupBy-sum the per-batch (cluster, dim, s, cnt) partials and
    fold to centroid vectors with the portable floor-div (identical to
    _update_centroids' driver math — same expression, same Python %)."""
    agg = partials.groupBy("cluster", "dim").agg(
        F.sum("s").alias("s"), F.sum("cnt").alias("cnt")
    )
    by_cluster: dict[int, dict[int, int]] = {}
    for r in agg.collect():
        s, cnt = int(r["s"]), int(r["cnt"])
        by_cluster.setdefault(int(r["cluster"]), {})[int(r["dim"])] = (
            s - (s % cnt)
        ) // cnt
    return sorted(
        (cid, [dims[d] for d in sorted(dims)]) for cid, dims in by_cluster.items()
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[int]]], DataFrame]:
    """The kmeans_assign loop, also returning the FINAL CENTROIDS the
    last assignment used (the oracle's c{rounds}) — consumers that need
    point-to-centroid geometry (silhouette, inertia) must use exactly
    these, not a re-update from the final assignment (which would be
    round rounds+1 and drift from the graded construction).

    r10: the per-round assignment + partial aggregation runs as numpy
    over Arrow batches (_kmeans_partials_fn) instead of the interpreted
    JVM HOF tree — int64-exact, order-independent partials, so outputs
    are bit-identical (cross-checked by test_kmeans_numpy_matches_
    literal) at a fraction of the per-row cost. The final returned
    assignment is ALSO the numpy mapInPandas form (_kmeans_assign_fn),
    pinned equal to the JVM literal _assign_literal by
    test_kmeans_final_assignment_matches_literal."""
    scaled = corpus.select(
        F.col(id_col), scale_embedding(F.col(vec_col)).alias("xi")
    ).persist()
    cents = [
        (i, list(r["xi"]))
        for i, r in enumerate(scaled.orderBy(id_col).limit(k).collect())
    ]
    for _ in range(rounds):
        partials = scaled.mapInPandas(
            _kmeans_partials_fn(cents), "cluster long, dim int, s long, cnt long"
        )
        cents = _collect_centroids(partials)
    assigned = scaled.mapInPandas(
        _kmeans_assign_fn(cents, id_col),
        f"{id_col} long, xi array<long>, cluster long",
    )
    return cents, assigned


def semdedup_prune(
    corpus: DataFrame,
    k: int = 8,
    rounds: int = 2,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then drop a
    document when a smaller-id neighbor in the SAME cluster has cosine
    ≥ threshold — semantic dedup at O(Σ cluster²) instead of O(n²),
    with k chosen so clusters stay bounded.

    Returns (id, cluster, kept). The reference has no counterpart (it
    replicates rows); this is the LLM-corpus extension mandated by the
    brief, composing the kmeans_assign step with the cosine-verify
    discipline of embedding_near_dup_pairs."""
    # materialize the (id, cluster) assignment before the self-join:
    # both join sides would otherwise re-evaluate (and Catalyst
    # re-optimize) the full assignment expression
    assigned = kmeans_assign(corpus, k, rounds, id_col, vec_col).localCheckpoint()
    vecs = corpus.select(F.col(id_col), F.col(vec_col))
    # norms computed once per VECTOR before the join (n evals), not once
    # per PAIR after it (O(Σ cluster²) evals); products are bit-equal
    av = assigned.join(vecs, id_col).select(
        F.col(id_col),
        F.col("cluster"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        norm(F.col(vec_col).cast("array<double>")).alias("__n"),
    )
    a = av.select(
        F.col(id_col).alias("id_a"), F.col("cluster"),
        F.col("__v").alias("__va"), F.col("__n").alias("__na"),
    )
    b = av.select(
        F.col(id_col).alias("id_b"), F.col("cluster").alias("__cb"),
        F.col("__v").alias("__vb"), F.col("__n").alias("__nb"),
    )
    den = F.col("__na") * F.col("__nb")
    sim = F.round(
        F.when(
            den > 0,
            dot(F.col("__va"), F.col("__vb")) / den,
        ).otherwise(F.lit(0.0)),
        6,
    )
    dups = (
        a.join(b, (a["cluster"] == b["__cb"]) & (F.col("id_a") < F.col("id_b")))
        .withColumn("__sim", sim)
        .filter(F.col("__sim") >= threshold)
        .select(F.col("id_b").alias("__dup"))
        .distinct()
    )
    return (
        assigned.join(dups, assigned[id_col] == dups["__dup"], "left")
        .select(
            id_col,
            "cluster",
            F.col("__dup").isNull().alias("kept"),
        )
    )


# ---------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half, Jégou et al. 2011)
# ---------------------------------------------------------------------


def _pq_books_df(spark, books: list[list[tuple[int, list[int]]]]):
    """Codebooks as a ONE-ROW broadcast DataFrame (column ``__books``:
    array-by-subspace of arrays of centroid structs). A nested literal
    expression (array(struct(lit...))) is an ~m·ksub·w-node tree that
    interpreted evaluation REBUILDS per row — measured 13 s to encode
    2 000 rows. As a broadcast-row column the structure is materialized
    once and every reference is an attribute read."""
    rows = [
        (
            [
                [(int(cid), [int(v) for v in cxi]) for cid, cxi in cents]
                for cents in books
            ],
        )
    ]
    return spark.createDataFrame(
        rows, "__books array<array<struct<cluster:bigint,cxi:array<bigint>>>>"
    )


def _pq_codes_col(m: int, w: int):
    """codes[s] = argmin_c sqdist(xi[s·w+1 : +w], __books[s][c]) as one
    nested-HOF expression over the broadcast ``__books`` column: the
    distance lambda appears ONCE — data varies, the tree doesn't."""
    def per_sub(s):
        sub = F.slice(F.col("xi"), s * w + 1, w)
        cents = F.element_at(F.col("__books"), (s + 1).cast("int"))
        best = F.array_min(
            F.transform(
                cents,
                lambda c: F.struct(
                    _sq_dist(sub, c["cxi"]).alias("d"),
                    c["cluster"].alias("cluster"),
                ),
            )
        )
        return best["cluster"]

    return F.transform(F.sequence(F.lit(0), F.lit(m - 1)), per_sub)


def _pq_partials_fn(books: list[list[tuple[int, list[int]]]], m: int, w: int):
    """mapInPandas body for one PQ Lloyd round: numpy per-subspace
    nearest-centroid assignment + (sub, cluster, dim) partial sums.
    int64-exact; argmin's first-minimum matches the JVM array_min
    lexicographic tie-break because each book's centroids are stored in
    ascending cluster-id (= positional) order."""
    import numpy as np
    import pandas as pd

    Cs = [
        (np.array([cxi for _, cxi in sorted(cents)], dtype=np.int64),
         [int(cid) for cid, _ in sorted(cents)])
        for cents in books
    ]

    def f(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["xi"]])
            out_sub, out_c, out_d, out_s, out_n = [], [], [], [], []
            for s in range(m):
                Xs = X[:, s * w : (s + 1) * w]
                C, cids = Cs[s]
                d = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                code = d.argmin(axis=1)
                for j, cid in enumerate(cids):
                    mask = code == j
                    cnt = int(mask.sum())
                    if cnt == 0:
                        continue
                    sums = Xs[mask].sum(axis=0)
                    for dd in range(w):
                        out_sub.append(s)
                        out_c.append(cid)
                        out_d.append(dd)
                        out_s.append(int(sums[dd]))
                        out_n.append(cnt)
            yield pd.DataFrame(
                {"sub": out_sub, "cluster": out_c, "dim": out_d,
                 "s": out_s, "cnt": out_n}
            )

    return f


def pq_train_codebooks(
    corpus: DataFrame,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[int]]]]:
    """Train per-subspace PQ codebooks: split each vector into ``m``
    contiguous subvectors and run the same deterministic integer Lloyd
    as `kmeans_assign` in ALL subspaces at once.

    Scale shape: per round ONE map-only projection computes every
    subspace's assignment (centroids inlined as literals — the corpus
    never shuffles) and ONE (sub, cluster, dim)-keyed aggregation whose
    collected size is m × ksub × (dim/m) integers — driver-held state
    independent of corpus size, exactly the FAISS training loop
    restated on Spark. Seeds are the ksub smallest-id vectors per
    subspace (deterministic)."""
    w = dim // m
    # persist: the seed collect plus one aggregation per round all read
    # this projection — pinned in memory so the training loop's job
    # count, not repeated parquet scans, sets its cost
    scaled = corpus.select(
        F.col(id_col), scale_embedding(F.col(vec_col)).alias("xi")
    ).persist()
    seed_rows = scaled.orderBy(id_col).limit(ksub).collect()
    books: list[list[tuple[int, list[int]]]] = [
        [(i, list(r["xi"])[s * w : (s + 1) * w]) for i, r in enumerate(seed_rows)]
        for s in range(m)
    ]

    for _ in range(rounds):
        # r10: per-round assignment + partial sums as ONE numpy pass
        # over Arrow batches (guide §4.2) — the interpreted nested-HOF
        # encode evaluated m·ksub·w expression nodes per row, and the
        # (sub, cluster, dim) posexplode multiplied rows ×dim before
        # the aggregation. int64-exact and order-independent, so books
        # are bit-identical (test_pq_train_numpy_matches_hof).
        partials = scaled.select("xi").mapInPandas(
            _pq_partials_fn(books, m, w),
            "sub int, cluster long, dim int, s long, cnt long",
        )
        agg = partials.groupBy("sub", "cluster", "dim").agg(
            F.sum("s").alias("s"), F.sum("cnt").alias("cnt")
        )
        state: dict[int, dict[int, dict[int, int]]] = {}
        for r in agg.collect():
            sval, cnt = int(r["s"]), int(r["cnt"])
            state.setdefault(int(r["sub"]), {}).setdefault(int(r["cluster"]), {})[
                int(r["dim"])
            ] = (sval - (sval % cnt)) // cnt
        # positional renumbering: an empty cluster drops out, and codes
        # must index the codebook (and the ADC LUT) by POSITION
        books = [
            [
                (i, vec)
                for i, (_, vec) in enumerate(
                    sorted(
                        (cid, [dims[d] for d in sorted(dims)])
                        for cid, dims in state.get(s, {}).items()
                    )
                )
            ]
            for s in range(m)
        ]
    return books


def _pq_codes_fn(
    books: list[list[tuple[int, list[int]]]], m: int, w: int, id_col: str
):
    """mapInPandas body for PQ encoding: per batch, numpy argmin per
    subspace → (id, codes[m]). Same int64 math and tie-break as
    _pq_partials_fn."""
    import numpy as np
    import pandas as pd

    Cs = [
        (np.array([cxi for _, cxi in sorted(cents)], dtype=np.int64),
         np.array([int(cid) for cid, _ in sorted(cents)], dtype=np.int64))
        for cents in books
    ]

    def f(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["xi"]])
            codes = np.empty((len(X), m), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * w : (s + 1) * w]
                C, cids = Cs[s]
                d = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = cids[d.argmin(axis=1)]
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes)}
            )

    return f


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple[int, list[int]]]],
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<long>[m]) — nearest codebook entry per subspace,
    in ONE map-only projection (no join, no shuffle). The compressed
    row is m small integers: 64 float dims → 8 bytes, the 32× memory
    cut that makes billion-vector ANN fit a cluster's RAM."""
    m = len(books)
    w = dim // m
    scaled = corpus.select(F.col(id_col), scale_embedding(F.col(vec_col)).alias("xi"))
    # r10: numpy per-batch encode (guide §4.2) — int64-exact argmin per
    # subspace, bit-identical to the interpreted _pq_codes_col HOF tree
    # (pinned by test_pq_encode_numpy_matches_hof) at a fraction of the
    # per-row cost; the books ride the closure (m·ksub·w ints), exactly
    # the broadcast-LUT footprint the old one-row frame carried.
    return scaled.mapInPandas(
        _pq_codes_fn(books, m, w, id_col), f"{id_col} long, codes array<long>"
    )


def pq_topk(
    corpus: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[int]]]],
    dim: int = 64,
    k: int = 5,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: per query, precompute the
    m × ksub lookup table of exact integer distances from the query
    subvector to every codebook entry (driver-side — m × ksub longs per
    query), then score each compressed row as Σ_s LUT[s][code_s] with
    the LUT broadcast: a row-local O(m) fold, NO shuffle of the corpus;
    only (query_id, id, dist) triples move for the ranking — the same
    shuffle profile as brute_force_topk at 1/32 the scan width.

    ``rerank`` > 0 adds the production refine stage (IVFPQ+R): take the
    top-``rerank`` ADC shortlist per query, join the FULL vectors back
    for just those rows (an id equi-join — shuffle is shortlist-sized,
    never corpus-sized), and re-rank by exact integer squared-L2. ADC
    quantization error then only has to keep the true neighbors inside
    the shortlist, not rank them perfectly — the standard way PQ recall
    is made usable on hard (near-random) distributions."""
    m = len(books)
    w = dim // m
    codes = pq_encode(corpus, books, dim=dim, id_col=id_col, vec_col=vec_col)
    spark = corpus.sparkSession
    lut_rows = []
    for qid, vec in query_vecs:
        qxi = [int(round(float(x) * 1_000_000)) for x in vec]
        lut = []
        for s, cents in enumerate(books):
            qs = qxi[s * w : (s + 1) * w]
            lut.append(
                [
                    sum((a - b) * (a - b) for a, b in zip(qs, cxi))
                    for _, cxi in cents
                ]
            )
        lut_rows.append((int(qid), lut))
    luts = spark.createDataFrame(
        lut_rows, "query_id bigint, lut array<array<bigint>>"
    )
    scored = codes.crossJoin(F.broadcast(luts)).select(
        "query_id",
        F.col(id_col),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.element_at(
                F.element_at(F.col("lut"), (s + 1).cast("int")),
                (F.element_at(F.col("codes"), (s + 1).cast("int")) + 1).cast("int"),
            ),
        ).alias("adc_dist"),
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    if rerank <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(rw).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "adc_dist", "rank")
        )
    shortlist = (
        scored.withColumn("__r", F.row_number().over(rw))
        .filter(F.col("__r") <= rerank)
        .select("query_id", id_col, "adc_dist")
    )
    qxi_rows = [
        (int(qid), [int(round(float(x) * 1_000_000)) for x in vec])
        for qid, vec in query_vecs
    ]
    qxis = corpus.sparkSession.createDataFrame(
        qxi_rows, "query_id bigint, qxi array<bigint>"
    )
    full = corpus.select(F.col(id_col), scale_embedding(F.col(vec_col)).alias("__xi"))
    refined = (
        shortlist.join(full, id_col)
        .join(F.broadcast(qxis), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            "adc_dist",
            _sq_dist(F.col("__xi"), F.col("qxi")).alias("exact_dist"),
        )
    )
    rw2 = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col(id_col).asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(rw2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "adc_dist", "exact_dist", "rank")
    )


def pca_fit(
    corpus: DataFrame,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]], list[float]]:
    """Distributed PCA fit: mean + top-k principal components.

    Scale shape (the map-side-combine of linear algebra): one Arrow
    mapInPandas pass emits per-batch MOMENT PARTIALS — (n, Σx, ΣxxᵀT
    flattened), i.e. d + d² doubles per batch regardless of batch row
    count — so the driver receives O(#batches · d²) numbers, never the
    corpus. The d×d eigendecomposition runs on the driver (d=64 →
    trivial; the cutover to randomized/iterative methods is at d in the
    thousands, not corpus size, which this plan is independent of).

    Determinism: partials are folded in sorted order of each batch's
    min id, so double-addition order is fixed across runs; eigenvector
    sign is canonicalized (largest-|w| entry positive, lowest index on
    ties). Returns (mean[d], components[k][d], explained[k]).
    """
    import numpy as np

    schema = "mid long, n long, s array<double>, g array<double>"

    def _partials(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            yield pd.DataFrame(
                {
                    "mid": [int(pdf[id_col].min())],
                    "n": [len(M)],
                    "s": [M.sum(axis=0).tolist()],
                    "g": [(M.T @ M).ravel().tolist()],
                }
            )

    rows = corpus.select(id_col, vec_col).mapInPandas(_partials, schema).collect()
    rows = sorted(rows, key=lambda r: r["mid"])
    n = 0
    s = np.zeros(dim)
    g = np.zeros(dim * dim)
    for r in rows:
        n += r["n"]
        s += np.asarray(r["s"])
        g += np.asarray(r["g"])
    mu = s / n
    cov = g.reshape(dim, dim) / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    comps = []
    expl = []
    for i in order:
        w = evecs[:, i].copy()
        j = int(np.argmax(np.abs(w)))  # first max index on ties
        if w[j] < 0:
            w = -w
        comps.append([float(x) for x in w])
        expl.append(float(evals[i]))
    return [float(x) for x in mu], comps, expl


def pca_project(
    corpus: DataFrame,
    mean: list[float],
    comps: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Sequence[str] = ("label",),
) -> DataFrame:
    """Project vectors onto fitted components; entirely JVM-side.

    The (mean, components) constants ride in ONE broadcast one-row
    frame — array literals inside per-row expressions would be rebuilt
    per row. Each projection is a zip_with/aggregate fold (whole-stage
    codegen, no Python in the hot path); reconstruction error uses the
    orthonormality identity ‖x−x̂‖² = ‖c‖² − Σ projᵢ² so no second
    pass materializes the reconstruction. Output floats rounded at 6.
    """
    spark = corpus.sparkSession
    consts = spark.createDataFrame(
        [(mean, comps)], "mu array<double>, w array<array<double>>"
    )
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.col("mu"),
        lambda a, b: a - b,
    )
    dot = lambda c, w: F.aggregate(  # noqa: E731
        F.zip_with(c, w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, v: acc + v * v
    )
    out = (
        corpus.crossJoin(F.broadcast(consts))
        .withColumn("__c", centered)
        .withColumn("proj_raw", F.transform(F.col("w"), lambda w: dot(F.col("__c"), w)))
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.transform(F.col("proj_raw"), lambda p: F.round(p, 6)).alias("proj"),
            F.round(sq(F.col("__c")) - sq(F.col("proj_raw")), 6).alias("recon_err"),
        )
    )
    return out
