"""Runnable walkthrough: the full training-corpus curation pipeline.

Chains the engine's training-data operators end-to-end over the sf0.001
documents table and prints the survival funnel:

    raw → near-dup dedup (MinHash-LSH + components, keep best per
    cluster) → quality filters (unigram perplexity + Gopher-style
    repetition) → PII redaction → benchmark decontamination (4-gram
    overlap vs the held-out slice) → deterministic 80/10/10 split →
    2048-token sequence packing.

Every stage is the same audited distributed form the graded queries
use; this script only composes them.

    python examples/training_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T
from gravity_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_corpus_pipeline", cpus=8)
    run = lambda name: REGISTRY[name].spark(spark, sf_dir)  # noqa: E731

    docs = T(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. near-dup dedup: keep the best-quality doc of each cluster,
    #    plus every unclustered doc
    keep_rep = run("corpus_dedup_pipeline").select(
        F.col("kept_doc_id").alias("doc_id")
    )
    clustered = run("dedup_components").select("doc_id")
    survivors = docs.join(clustered, "doc_id", "left_anti").select("doc_id").union(
        keep_rep
    )
    n_dedup = survivors.count()

    # 2. quality filters: LM perplexity + Gopher-style repetition
    ppl = run("perplexity_filter")
    survivors = survivors.join(ppl.filter(F.col("keep") == 1), "doc_id").select(
        "doc_id"
    )
    rep = run("quality_repetition")
    survivors = survivors.join(rep.filter(F.col("keep")), "doc_id").select("doc_id")
    n_quality = survivors.count()

    # 2b. PII scrub: redact email spans before anything downstream sees
    #     text (demonstrated on the doc ids that survive)
    n_pii = (
        run("pii_redaction")
        .join(survivors, "doc_id")
        .agg(F.sum("n_emails"))
        .collect()[0][0]
    )

    # 3. benchmark decontamination: drop flagged overlaps and the eval
    #    slice itself
    contaminated = run("decontaminate_ngram_overlap").select("doc_id")
    survivors = (
        survivors.filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    n_clean = survivors.count()

    # 4. deterministic split — the SAME expression the graded
    #    train_val_test_split query uses. Row-level is sound HERE
    #    because stage 1 already collapsed every near-dup cluster to one
    #    representative; a pipeline that keeps near-dups must key the
    #    split on the cluster id instead (dedup_cluster_aware_split) or
    #    on the owning entity (train_split_group_aware).
    from gravity_spark.queries import corpus_split_expr

    tagged = survivors.join(docs, "doc_id").withColumn("split", corpus_split_expr())
    split_counts = {
        r["split"]: r["n"]
        for r in tagged.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 5. pack the train split into 2048-token sequences per source —
    #    the same two-level parallel prefix the pack_sequences query uses
    from gravity_spark.functions import text as tx
    from gravity_spark.queries import pack_start_offsets

    train = tagged.filter(F.col("split") == "train").select(
        "source", "doc_id", F.size(tx.tokenize(F.col("text"))).alias("n_tok")
    )
    packed = (
        pack_start_offsets(train)
        .groupBy("source", F.expr("start_off div 2048").alias("bin_id"))
        .agg(F.sum("n_tok").alias("n_tokens"))
    )
    n_bins = packed.count()
    n_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]

    print("corpus curation funnel")
    print(f"  raw documents        {n_raw}")
    print(f"  after near-dup dedup {n_dedup}")
    print(f"  after quality filter {n_quality}")
    print(f"  PII spans redacted   {n_pii}")
    print(f"  after decontaminate  {n_clean}")
    print(f"  split                {split_counts}")
    print(f"  packed train bins    {n_bins} bins / {n_tokens} tokens")


if __name__ == "__main__":
    main()
