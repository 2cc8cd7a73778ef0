"""Invariants for the simplified silhouette.

- Per-point recompute: a2 is the MINIMUM over centroids (the
  assignment picked it), so s >= 0 can fail only on assignment-rank
  ties — verify s bounds and recompute sums locally from kmeans_fit's
  own centroids.
- Cluster rows partition the vector set.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T
from gravity_spark.functions.similarity import kmeans_fit


def test_silhouette_recompute(spark, sf_dir):
    rows = {
        r["cluster"]: r
        for r in REGISTRY["embedding_silhouette_simplified"].spark(spark, sf_dir).collect()
    }
    emb = T(spark, sf_dir, "embeddings")
    cents, assigned = kmeans_fit(emb, k=8, rounds=2)
    pts = assigned.select("vec_id", "cluster", "xi").collect()
    cmap = {c: x for c, x in cents}
    sums = {}
    counts = {}
    for p in pts:
        x = list(p["xi"])

        def d2(c):
            return sum((a - b) * (a - b) for a, b in zip(x, cmap[c]))

        a2 = d2(p["cluster"])
        b2 = min(d2(c) for c in cmap if c != p["cluster"])
        g = max(a2, b2)
        sm = 0 if g == 0 else ((b2 - a2) * 1000000) // g
        assert -1000000 <= sm <= 1000000
        assert b2 >= a2 or sm < 0  # a2 minimal up to ties
        sums[p["cluster"]] = sums.get(p["cluster"], 0) + sm
        counts[p["cluster"]] = counts.get(p["cluster"], 0) + 1
    assert set(rows) == set(counts)
    n_total = 0
    for c, r in rows.items():
        assert r["n"] == counts[c]
        assert r["sum_s_micro"] == sums[c]
        num = 2 * sums[c] + counts[c]
        den = 2 * counts[c]
        assert r["mean_s_micro"] == num // den  # python // floors too
        n_total += r["n"]
    assert n_total == emb.count()
