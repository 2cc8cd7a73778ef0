"""Invariants for the composite quality gate: bitmask recomputation
from raw text, passed <=> mask == 0, and the gate discriminates (some
docs fail on this corpus — the stopword rule fires on non-English
docs by construction of the English stopword list)."""

import re

from gravity_spark.queries import REGISTRY, T
from gravity_spark.functions import text as tx


def test_gate_mask_recompute(spark, sf_dir):
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["corpus_quality_gate"].spark(spark, sf_dir).collect()
    }
    docs = T(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert set(rows) == {r["doc_id"] for r in docs}
    n_fail = 0
    for d in docs:
        text = d["text"]
        toks = [t for t in re.split(r"[^a-zA-Z0-9]+", text.lower()) if t]
        tok = len(toks)
        stop_cnt = sum(1 for t in toks if t in tx.STOPWORDS)
        charsum = sum(len(t) for t in toks)
        n = len(text)
        clean = len(re.sub(r"[^a-zA-Z0-9\s]", "", text))
        mask = 0
        if not tok >= 5:
            mask |= 1
        if not stop_cnt * 1000 >= 10 * tok:
            mask |= 2
        if not (n - clean) * 1000 <= 300 * n:
            mask |= 4
        if not (2 * tok <= charsum <= 12 * tok):
            mask |= 8
        r = rows[d["doc_id"]]
        assert r["reject_mask"] == mask, d["doc_id"]
        assert r["passed"] == (1 if mask == 0 else 0)
        n_fail += 1 if mask else 0
    assert 0 < n_fail < len(docs)  # discriminates, doesn't nuke the corpus
