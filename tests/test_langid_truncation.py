"""Invariants for the langid confusion matrix and truncation recall.

- langid_confusion_matrix: row margins equal the labeled-language
  counts, shares are the half-up milli division, every detected value
  is a known language or 'und'.
- embedding_truncation_recall: the full-width row is a perfect 1000
  (self-consistency), n_probes matches the stride sample, and the
  dims=32 matches agree with a local numpy recomputation.
"""

from collections import defaultdict

import numpy as np

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T
from gravity_spark.functions import text as tx


def test_confusion_margins(spark, sf_dir):
    rows = REGISTRY["langid_confusion_matrix"].spark(spark, sf_dir).collect()
    docs = T(spark, sf_dir, "documents").groupBy("lang").count().collect()
    labels = {r["lang"]: r["count"] for r in docs}
    by_label = defaultdict(int)
    known = set(tx.LANG_MARKERS) | {"und"}
    for r in rows:
        by_label[r["labeled_lang"]] += r["n"]
        assert r["detected_lang"] in known
        assert r["share_milli"] == (2000 * r["n"] + by_label_total(labels, r)) // (
            2 * by_label_total(labels, r)
        )
    assert by_label == labels


def by_label_total(labels, r):
    return labels[r["labeled_lang"]]


def test_truncation_recall_consistency(spark, sf_dir):
    rows = {
        r["dims"]: r
        for r in REGISTRY["embedding_truncation_recall"].spark(spark, sf_dir).collect()
    }
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array(
        [[int(round(float(x) * 1000000)) for x in r["embedding"]] for r in emb],
        dtype=np.int64,
    )
    probe_mask = ids % 25 == 0
    n_probes = int(probe_mask.sum())
    assert rows[64]["n_probes"] == n_probes
    assert rows[64]["n_match"] == n_probes
    assert rows[64]["recall_milli"] == 1000

    def top1(d):
        out = {}
        for pi in np.where(probe_mask)[0]:
            diff = X[:, :d] - X[pi, :d]
            dist = (diff * diff).sum(axis=1)
            # exclude self; tie-break on vec_id
            order = sorted(
                (int(dist[j]), int(ids[j]))
                for j in range(len(ids))
                if ids[j] != ids[pi]
            )
            out[int(ids[pi])] = order[0][1]
        return out

    full = top1(64)
    t32 = top1(32)
    expect_m32 = sum(1 for p in full if t32[p] == full[p])
    assert rows[32]["n_match"] == expect_m32
    for d in (8, 16, 32):
        assert 0 <= rows[d]["n_match"] <= n_probes
