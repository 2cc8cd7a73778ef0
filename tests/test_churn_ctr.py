"""Invariants for the churn training set and Wilson CTR.

- churn_training_set: NO LEAKAGE — features recompute exactly from
  pre-cutoff orders only; labels recompute from post-cutoff presence;
  customers first seen after the cutoff are absent; both classes
  occur.
- events_ctr_wilson: wilson_lower < point estimate always, lies in
  [0, 1], and shrinks toward p as n grows (checked across days).
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_churn_no_leakage(spark, sf_dir):
    rows = {
        r["o_custkey"]: r
        for r in REGISTRY["churn_training_set"].spark(spark, sf_dir).collect()
    }
    orders = T(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    lo = min(r["us"] for r in orders)
    hi = max(r["us"] for r in orders)
    cut = lo + (hi - lo) * 3 // 4
    pre = defaultdict(list)
    post = set()
    for r in orders:
        if r["us"] <= cut:
            pre[r["o_custkey"]].append((r["us"], r["cents"]))
        else:
            post.add(r["o_custkey"])
    assert set(rows) == set(pre)  # post-only customers excluded
    churn_counts = [0, 0]
    for c, os_ in pre.items():
        r = rows[c]
        assert r["n_orders"] == len(os_)
        assert r["total_cents"] == sum(x for _, x in os_)
        assert r["recency_days"] == (cut - max(u for u, _ in os_)) // 86400000000
        expected_churn = 0 if c in post else 1
        assert r["churned"] == expected_churn
        churn_counts[expected_churn] += 1
    assert churn_counts[0] > 0 and churn_counts[1] > 0  # both classes


def test_wilson_bounds(spark, sf_dir):
    rows = REGISTRY["events_ctr_wilson"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["views"] + r["clicks"]
        p = r["clicks"] / n
        assert 0.0 <= r["wilson_lower"] <= 1.0
        assert r["wilson_lower"] <= p + 1e-9
        assert r["ctr_milli"] == (2000 * r["clicks"] + n) // (2 * n)
        # bound is within the normal-approx envelope
        assert p - r["wilson_lower"] < 4.0 / (n ** 0.5) + 1e-9
