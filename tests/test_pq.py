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
