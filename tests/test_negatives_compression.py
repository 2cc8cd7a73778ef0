"""Invariants for consistent-hash negative sampling and the
compression-ratio quality signal.

- contrastive_negative_sampling: exact agreement with a local
  next-clockwise (with wrap) resolution over the portable-hash ring,
  determinism across two runs, and probe coverage (every 20th doc x 4).
- quality_compression_ratio: byte counts equal local zlib level-6
  output, ratio is the half-up milli division, and a highly repetitive
  synthetic string compresses below 300 milli while random-ish text
  stays above.
"""

import zlib
from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T, _HP, _HA


def _phash(x: int) -> int:
    return (_HA * (x % _HP)) % _HP


def test_negative_sampling_matches_ring(spark, sf_dir):
    rows = REGISTRY["contrastive_negative_sampling"].spark(spark, sf_dir).collect()
    doc_ids = [
        r["doc_id"] for r in T(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    ring = sorted((_phash(d), d) for d in doc_ids)
    positions = [p for p, _ in ring]
    by_pos = defaultdict(list)
    for p, d in ring:
        by_pos[p].append(d)

    import bisect

    expected = defaultdict(set)
    for d in doc_ids:
        if d % 20 != 0:
            continue
        for k in range(4):
            pos = _phash(d * 4 + k + 1)
            i = bisect.bisect_left(positions, pos)
            hit = positions[i] if i < len(positions) else positions[0]
            for nd in by_pos[hit]:
                expected[(d, k)].add(nd)
    got = defaultdict(set)
    for r in rows:
        got[(r["probe_id"], r["neg_k"])].add(r["neg_id"])
    assert got == expected
    # determinism across a second run
    rows2 = REGISTRY["contrastive_negative_sampling"].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_compression_ratio_exact_and_discriminative(spark, sf_dir):
    out = REGISTRY["quality_compression_ratio"].spark(spark, sf_dir)
    rows = out.limit(50).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 1000)
        .collect()
    }
    checked = 0
    for r in rows:
        if r["doc_id"] in texts:
            t = texts[r["doc_id"]]
            dl = len(zlib.compress(t.encode("utf-8"), 6))
            assert r["deflate_bytes"] == dl
            n = len(t)
            assert r["n_chars_exact"] == n
            assert r["ratio_milli"] == (2000 * dl + n) // (2 * n)
            assert r["is_repetitive"] == (1 if r["ratio_milli"] < 300 else 0)
            checked += 1
    assert checked >= 10
    # discriminative: repetition compresses hard, diverse text doesn't
    import hashlib

    rep = "spam spam spam! " * 200
    nat = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(50)
    )
    r_rep = len(zlib.compress(rep.encode(), 6)) * 1000 // len(rep)
    r_nat = len(zlib.compress(nat.encode(), 6)) * 1000 // len(nat)
    assert r_rep < 300 < r_nat
