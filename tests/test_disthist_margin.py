"""Invariants for the distance histogram and margin audit.

- embedding_distance_histogram: bins recompute from local numpy
  distances; shares sum to ~1e6 micro; concentration in few bins is
  expected (and is the diagnostic's point) — assert the histogram
  covers every pair exactly once.
- parts_margin_audit: below_retail and the basis-point ratio agree
  with exact local integer math; every part with sales appears once.
"""

from collections import defaultdict

import numpy as np

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_distance_histogram_recompute(spark, sf_dir):
    rows = REGISTRY["embedding_distance_histogram"].spark(spark, sf_dir).collect()
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array(
        [[int(round(float(x) * 1000000)) for x in r["embedding"]] for r in emb],
        dtype=np.int64,
    )
    bins = defaultdict(int)
    n_pairs = 0
    for pi in np.where(ids % 125 == 0)[0]:
        diff = X - X[pi]
        d2 = (diff * diff).sum(axis=1)
        for j in range(len(ids)):
            if ids[j] == ids[pi]:
                continue
            v = int(d2[j])
            bins[0 if v == 0 else v.bit_length()] += 1
            n_pairs += 1
    got = {r["bin_log2"]: r["n"] for r in rows}
    assert got == dict(bins)
    assert sum(got.values()) == n_pairs
    share_sum = sum(r["share_micro"] for r in rows)
    assert abs(share_sum - 1000000) <= len(rows)  # half-up rounding slack


def test_margin_audit_exact(spark, sf_dir):
    rows = {
        r["p_partkey"]: r
        for r in REGISTRY["parts_margin_audit"].spark(spark, sf_dir).collect()
    }
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("rc"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    ).collect()
    acc = defaultdict(lambda: [0, 0, 0])
    for r in li:
        a = acc[r["l_partkey"]]
        a[0] += r["rc"]
        a[1] += r["qc"]
        a[2] += 1
    retail = {
        r["p_partkey"]: int(round(r["p_retailprice"] * 100))
        for r in T(spark, sf_dir, "part").collect()
    }
    assert set(rows) == set(acc)
    for pk, (rsum, qsum, nl) in acc.items():
        r = rows[pk]
        assert r["revenue_cents"] == rsum
        assert r["qty_centi"] == qsum
        assert r["n_lines"] == nl
        rt = retail[pk]
        assert r["retail_cents"] == rt
        assert r["below_retail"] == (1 if rsum * 100 < rt * qsum else 0)
        assert r["realized_pct_bp"] == (20000 * rsum * 100 + rt * qsum) // (
            2 * rt * qsum
        )
