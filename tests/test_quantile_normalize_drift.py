"""Invariants for the quantile-normalization map and source drift.

- quantile_normalize_map: each source contributes exactly 10 tiles
  whose counts tile the source (ntile's n%k head rule), src_hi is
  non-decreasing in tile within a source, glob_hi is the same
  non-decreasing global edge sequence for every source, and the global
  edges match a local exact ntile.
- docs_source_lang_drift: chi2 >= 0 for every source; the sum of
  per-source chi2 equals the global independence chi2 of the
  source x lang table (the partition property of the statistic).
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_quantile_map_structure(spark, sf_dir):
    rows = REGISTRY["quantile_normalize_map"].spark(spark, sf_dir).collect()
    docs = T(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("c"), "doc_id"
    ).collect()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append((r["c"], r["doc_id"]))
    out = defaultdict(dict)
    for r in rows:
        out[r["source"]][r["tile"]] = r

    # local exact global ntile for glob_hi
    allv = sorted((r["c"], r["doc_id"]) for r in docs)
    n = len(allv)
    q, rem = divmod(n, 10)
    glob_hi = {}
    idx = 0
    for tile in range(1, 11):
        size = q + 1 if tile <= rem else q
        idx += size
        glob_hi[tile] = allv[idx - 1][0]

    for src, tiles in out.items():
        assert sorted(tiles) == list(range(1, 11))
        vals = sorted(by_src[src])
        ns, (qs, rs) = len(vals), divmod(len(by_src[src]), 10)
        idx = 0
        prev_hi = None
        for tile in range(1, 11):
            r = tiles[tile]
            size = qs + 1 if tile <= rs else qs
            assert r["n"] == size
            idx += size
            assert r["src_hi"] == vals[idx - 1][0]
            if prev_hi is not None:
                assert r["src_hi"] >= prev_hi
            prev_hi = r["src_hi"]
            assert r["glob_hi"] == glob_hi[tile]
        assert idx == ns


def test_lang_drift_partitions_global_chi2(spark, sf_dir):
    rows = REGISTRY["docs_source_lang_drift"].spark(spark, sf_dir).collect()
    docs = T(spark, sf_dir, "documents").select("source", "lang").collect()
    cells = defaultdict(int)
    st = defaultdict(int)
    lt = defaultdict(int)
    for r in docs:
        cells[(r["source"], r["lang"])] += 1
        st[r["source"]] += 1
        lt[r["lang"]] += 1
    n = len(docs)
    local = defaultdict(float)
    for (s, l), o in cells.items():
        e = st[s] * lt[l] / n
        local[s] += round((o - e) ** 2 / e * 1e6) / 1e6
    for r in rows:
        assert r["chi2"] >= 0.0
        assert r["n_docs"] == st[r["source"]]
        assert abs(r["chi2"] - local[r["source"]]) < 1e-4
    # partition property: per-source chi2 sums to the global statistic
    glob = sum(
        (o - st[s] * lt[l] / n) ** 2 / (st[s] * lt[l] / n)
        for (s, l), o in cells.items()
    )
    assert abs(sum(r["chi2"] for r in rows) - glob) < 1e-3
