"""Invariant tests for chunk_documents and table_profile (§C/§G).

The exact-value gate is the DuckDB oracle; these pin the semantic
invariants: lossless overlap-chunk reconstruction and profile-stat
sanity against a direct recount.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, _CHUNK_S, _CHUNK_W, T


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_chunks_reconstruct_documents(spark, sf_dir):
    chunks = _run("chunk_documents", spark, sf_dir)
    # stride-prefix of every chunk, concatenated in chunk order, must
    # rebuild the exact original text (the final chunk contributes its
    # whole tail, shorter than the stride or not)
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.expr(f"substring(chunk_text, 1, {_CHUNK_S})"),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "piece")))
                .getField("piece")
            ).alias("rebuilt")
        )
    )
    docs = T(spark, sf_dir, "documents").filter(F.length("text") > 0)
    joined = docs.join(rebuilt, "doc_id", "left")
    bad = joined.filter(
        F.col("rebuilt").isNull() | (F.col("rebuilt") != F.col("text"))
    ).count()
    assert bad == 0


def test_chunk_windows_overlap_and_cover(spark, sf_dir):
    lens = {
        r.doc_id: r.n
        for r in T(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    rows = _run("chunk_documents", spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, doc_rows in by_doc.items():
        n = lens[doc_id]
        doc_rows.sort(key=lambda r: r.chunk_idx)
        # exactly the expected number of windows, each clipped at the end
        assert len(doc_rows) == (n - 1) // _CHUNK_S + 1
        for k, r in enumerate(doc_rows):
            assert r.chunk_idx == k
            assert r.chunk_start == 1 + k * _CHUNK_S
            assert len(r.chunk_text) == min(_CHUNK_W, n - r.chunk_start + 1)


def test_table_profile_matches_recount(spark, sf_dir):
    prof = {r.col: r for r in _run("table_profile", spark, sf_dir).collect()}
    o = T(spark, sf_dir, "orders")
    n = o.count()
    for c in ("o_orderkey", "o_custkey"):
        row = prof[c]
        assert row.n_nulls == n - o.filter(F.col(c).isNotNull()).count()
        assert row.n_distinct == o.select(c).distinct().count()
        lo, hi = o.agg(F.min(c), F.max(c)).collect()[0]
        assert row.min_val == float(lo) and row.max_val == float(hi)
    assert prof["o_orderdate"].min_val <= prof["o_orderdate"].max_val
