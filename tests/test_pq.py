"""Product-quantization ANN: determinism + recall vs exact top-k.

The PQ path is rows-only in the driver gate (iterative driver-held
codebook training has no SQL oracle), so its correctness contract
lives here: encoding determinism, LUT/positional-code consistency, and
recall@5 against brute force.
"""

from pyspark.sql import functions as F

from gravity_spark.functions import similarity as sim
from gravity_spark.queries import T

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    emb = T(spark, SF, "embeddings")
    return emb.filter(F.col("vec_id") >= 5)


def test_pq_encode_deterministic(spark):
    corpus = _corpus(spark)
    books = sim.pq_train_codebooks(corpus, dim=64, m=8, ksub=16, rounds=2)
    a = {r["vec_id"]: list(r["codes"]) for r in sim.pq_encode(corpus, books).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in sim.pq_encode(corpus, books).collect()}
    assert a == b
    assert all(len(c) == 8 for c in a.values())
    # codes index the codebook positionally
    for s, cents in enumerate(books):
        ids = [cid for cid, _ in cents]
        assert ids == list(range(len(ids)))
        assert max(c[s] for c in a.values()) < len(ids)


def test_pq_adc_matches_python_reference(spark):
    """ADC score for one (query, row) equals the straight Python sum of
    per-subspace LUT distances — validates the element_at indexing."""
    corpus = _corpus(spark)
    books = sim.pq_train_codebooks(corpus, dim=64, m=8, ksub=16, rounds=2)
    emb = T(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).collect()[0]
    qvec = list(q["embedding"])
    out = {
        (r["query_id"], r["vec_id"]): r["adc_dist"]
        for r in sim.pq_topk(corpus, [(0, qvec)], books, k=5).collect()
    }
    codes = {r["vec_id"]: list(r["codes"]) for r in sim.pq_encode(corpus, books).collect()}
    qxi = [int(round(float(x) * 1_000_000)) for x in qvec]
    w = 8
    for (qid, vid), got in out.items():
        expect = 0
        for s, cents in enumerate(books):
            qs = qxi[s * w : (s + 1) * w]
            cxi = dict(cents)[codes[vid][s]]
            expect += sum((a - b) * (a - b) for a, b in zip(qs, cxi))
        assert got == expect, (vid, got, expect)


def test_pq_recall_vs_exact(spark):
    """recall@5 of PQ-ADC + exact re-rank (top-50 shortlist) vs exact
    cosine brute force ≥ 0.7 on the sf0.001 embeddings (16×16
    codebooks; embeddings are unit-norm so cosine and L2 rank
    identically). Without the refine stage ADC alone lands ~0.25 on
    this near-random distribution — the shortlist re-rank is what
    makes PQ usable, which is exactly the production IVFPQ+R shape."""
    emb = T(spark, SF, "embeddings")
    corpus = _corpus(spark)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(corpus, queries, k=5)
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    q_rows = queries.orderBy("query_id").collect()
    qvecs = [(int(r["query_id"]), list(r["embedding"])) for r in q_rows]
    books = sim.pq_train_codebooks(corpus, dim=64, m=16, ksub=16, rounds=2)
    approx: dict[int, set] = {}
    for r in sim.pq_topk(corpus, qvecs, books, k=5, rerank=50).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])

    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.7, f"recall@5 = {hits}/{total}"


def test_pq_train_numpy_matches_hof(spark):
    """r10: the numpy mapInPandas Lloyd round must reproduce the old
    interpreted-HOF round bit-for-bit (int64-exact both ways). The HOF
    form is re-created inline here as the reference."""
    corpus = _corpus(spark)
    m, ksub, w, rounds = 8, 16, 8, 2
    books = sim.pq_train_codebooks(corpus, dim=64, m=m, ksub=ksub, rounds=rounds)

    # reference: one extra round computed via the JVM HOF encode + explode
    scaled = corpus.select(
        F.col("vec_id"), sim.scale_embedding(F.col("embedding")).alias("xi")
    )
    assigned = scaled.crossJoin(
        F.broadcast(sim._pq_books_df(spark, books))
    ).select("xi", sim._pq_codes_col(m, w).alias("codes"))
    parts = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.alias("sub"),
            F.element_at(F.col("codes"), (s + 1).cast("int")).alias("cluster"),
            F.slice(F.col("xi"), s * w + 1, w).alias("sv"),
        ),
    )
    pos = (
        assigned.select(F.explode(parts).alias("p"))
        .select("p.sub", "p.cluster", F.posexplode("p.sv").alias("dim", "v"))
    )
    ref = {
        (int(r["sub"]), int(r["cluster"]), int(r["dim"])): (int(r["s"]), int(r["cnt"]))
        for r in pos.groupBy("sub", "cluster", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    got = {
        (int(r["sub"]), int(r["cluster"]), int(r["dim"])): (int(r["s"]), int(r["cnt"]))
        for r in scaled.select("xi")
        .mapInPandas(
            sim._pq_partials_fn(books, m, w),
            "sub int, cluster long, dim int, s long, cnt long",
        )
        .groupBy("sub", "cluster", "dim")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert got == ref


def test_kmeans_numpy_matches_literal(spark):
    """r10: the numpy Lloyd round partials must equal the JVM
    _assign_literal + posexplode aggregation exactly."""
    emb = T(spark, SF, "embeddings")
    scaled = emb.select(
        F.col("vec_id"), sim.scale_embedding(F.col("embedding")).alias("xi")
    )
    cents = [
        (i, list(r["xi"]))
        for i, r in enumerate(scaled.orderBy("vec_id").limit(8).collect())
    ]
    ref_assigned = sim._assign_literal(scaled, cents, "vec_id")
    pos = ref_assigned.select("cluster", F.posexplode("xi").alias("dim", "v"))
    ref = {
        (int(r["cluster"]), int(r["dim"])): (int(r["s"]), int(r["cnt"]))
        for r in pos.groupBy("cluster", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    got = {
        (int(r["cluster"]), int(r["dim"])): (int(r["s"]), int(r["cnt"]))
        for r in scaled.mapInPandas(
            sim._kmeans_partials_fn(cents), "cluster long, dim int, s long, cnt long"
        )
        .groupBy("cluster", "dim")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert got == ref


def test_pq_encode_numpy_matches_hof(spark):
    """r10: numpy encode must equal the interpreted-HOF encode exactly."""
    corpus = _corpus(spark)
    m, w = 8, 8
    books = sim.pq_train_codebooks(corpus, dim=64, m=m, ksub=16, rounds=2)
    got = {r["vec_id"]: list(r["codes"]) for r in sim.pq_encode(corpus, books).collect()}
    scaled = corpus.select(
        F.col("vec_id"), sim.scale_embedding(F.col("embedding")).alias("xi")
    )
    ref_df = scaled.crossJoin(
        F.broadcast(sim._pq_books_df(spark, books))
    ).select(F.col("vec_id"), sim._pq_codes_col(m, w).alias("codes"))
    ref = {r["vec_id"]: list(r["codes"]) for r in ref_df.collect()}
    assert got == ref


def test_kmeans_final_assignment_matches_literal(spark):
    """r10: the numpy final assignment must equal _assign_literal."""
    emb = T(spark, SF, "embeddings")
    cents, assigned = sim.kmeans_fit(emb, k=8, rounds=2)
    got = {r["vec_id"]: (int(r["cluster"]), list(r["xi"])) for r in assigned.collect()}
    scaled = emb.select(
        F.col("vec_id"), sim.scale_embedding(F.col("embedding")).alias("xi")
    )
    ref = {
        r["vec_id"]: (int(r["cluster"]), list(r["xi"]))
        for r in sim._assign_literal(scaled, cents, "vec_id").collect()
    }
    assert got == ref
