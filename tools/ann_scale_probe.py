"""ANN-stack scale probe: numbers behind the similarity claims.

Replicates the embeddings table N× (replica vectors get a tiny
deterministic first-dimension offset so ids and near-ties stay
distinct, while the sign-LSH bucket geometry — what drives candidate
volume — is preserved), then times the two retrieval paths the graded
queries use, with a fixed 16-query probe set:

    brute  — functions.similarity.brute_force_topk
             (broadcast queries × streamed corpus; the exact baseline)
    lsh    — functions.similarity.lsh_bucket_topk
             (4-bit sign buckets; candidates = same-bucket corpus only)

Reported per multiplier: corpus rows, wall seconds per path, scored
candidate pairs per path (the real cost driver), and LSH recall@5
against brute on the identical query set.

Expected (and what BASELINE.md §9 records): brute cost grows linearly
with the corpus (it scores corpus × queries pairs by design — the
honest exact baseline), LSH candidate volume grows linearly but ~16×
smaller (one bucket of 2⁴), wall clock follows candidates, and recall
stays flat as the corpus scales (bucket geometry is size-independent).

Usage:
    python tools/ann_scale_probe.py [sf_dir] [mult [mult ...]]
    # default: /root/testdata/sf0.1 at 1, 10, 50, 100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gravity_spark.functions.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
    sign_bucket,
)
from gravity_spark.queries import T
from gravity_spark.session import get_spark


def replicate(emb, mult: int):
    if mult == 1:
        return emb
    n0 = emb.count()
    reps = emb.sparkSession.range(mult).select(
        F.col("id").alias("rep")
    )
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n0).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    i == 0, x + F.col("rep").cast("float") * 1e-4
                ).otherwise(x),
            ).alias("embedding"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 10, 50, 100]
    spark = get_spark("ann_scale_probe", cpus=8)
    base = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = (
        base.filter(F.col("vec_id") % 125 == 0)
        .limit(16)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist()
    )
    queries.count()
    out = []
    for mult in mults:
        corpus = replicate(base, mult).persist()
        n = corpus.count()

        t0 = time.time()
        brute = brute_force_topk(corpus, queries, k=5).persist()
        brute.count()
        t_brute = time.time() - t0
        brute_truth = {
            (r["query_id"], r["rank"]): r["vec_id"] for r in brute.collect()
        }
        cand_brute = n * 16

        t0 = time.time()
        lsh = lsh_bucket_topk(corpus, queries, k=5).persist()
        lsh.count()
        t_lsh = time.time() - t0
        # scored pairs = same-bucket (corpus, query) matches
        cb = corpus.select(sign_bucket(F.col("embedding"), (0, 1, 2, 3)).alias("b"))
        qb = queries.select(
            sign_bucket(F.col("embedding"), (0, 1, 2, 3)).alias("b")
        )
        cand_lsh = (
            cb.groupBy("b").count().join(qb.groupBy("b").count()
            .withColumnRenamed("count", "qc"), "b")
            .agg(F.sum(F.col("count") * F.col("qc")))
            .collect()[0][0]
        )
        lsh_hits = {
            (r["query_id"], r["rank"]): r["vec_id"] for r in lsh.collect()
        }
        overlap = sum(
            1
            for (q, rk), v in brute_truth.items()
            if any(
                lsh_hits.get((q, rr)) == v for rr in range(1, 6)
            )
        )
        recall = overlap / max(len(brute_truth), 1)
        row = {
            "mult": mult,
            "corpus_rows": n,
            "brute_sec": round(t_brute, 2),
            "brute_pairs": cand_brute,
            "lsh_sec": round(t_lsh, 2),
            "lsh_pairs": int(cand_lsh),
            "lsh_recall_at5": round(recall, 3),
        }
        print(json.dumps(row), flush=True)
        out.append(row)
        brute.unpersist()
        lsh.unpersist()
        corpus.unpersist()
    print(json.dumps({"probe": "ann_scale", "rows": out}))


if __name__ == "__main__":
    main()
