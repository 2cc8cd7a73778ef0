"""Invariants for the feature store, SRM guard, and freshness report.

- customer_feature_store: features recompute from a local replay
  (including NULL gap for single-order customers), one row per
  customer.
- ab_sample_ratio_mismatch: chi2 recomputes, flags fire exactly at
  the 3.841 threshold, and a + b equals the day's event count.
- cdc_source_freshness: lags are non-negative, exactly one stream has
  seq_lag == 0 and one has ts_lag == 0 (the global maxima holders).
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_feature_store_recompute(spark, sf_dir):
    rows = {
        r["o_custkey"]: r
        for r in REGISTRY["customer_feature_store"].spark(spark, sf_dir).collect()
    }
    orders = T(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
    ).collect()
    by_c = defaultdict(list)
    for r in orders:
        by_c[r["o_custkey"]].append((r["d"], r["cents"], r["m"]))
    hday = max(d for rs in by_c.values() for d, _, _ in rs)
    assert set(rows) == set(by_c)
    for c, rs in by_c.items():
        r = rows[c]
        n = len(rs)
        total = sum(x for _, x, _ in rs)
        dmin, dmax = min(d for d, _, _ in rs), max(d for d, _, _ in rs)
        assert r["n_orders"] == n
        assert r["total_cents"] == total
        assert r["recency_days"] == hday - dmax
        assert r["span_days"] == dmax - dmin
        assert r["active_months"] == len({m for _, _, m in rs})
        if n > 1:
            assert r["avg_gap_milli_days"] == (
                2000 * (dmax - dmin) + (n - 1)
            ) // (2 * (n - 1))
        else:
            assert r["avg_gap_milli_days"] is None
        assert r["avg_order_cents"] == (2 * total + n) // (2 * n)


def test_srm_math_and_flag(spark, sf_dir):
    rows = REGISTRY["ab_sample_ratio_mismatch"].spark(spark, sf_dir).collect()
    day_counts = {
        r["d"]: r["n"]
        for r in T(spark, sf_dir, "events")
        .groupBy(F.expr("unix_timestamp(ts) div 86400").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["a"] + r["b"] == day_counts[r["day"]]
        chi2 = (r["a"] - r["b"]) ** 2 / (r["a"] + r["b"])
        assert abs(r["chi2"] - round(chi2, 6)) < 1e-9
        assert r["srm_flag"] == (1 if chi2 > 3.841 else 0)


def test_freshness_lags(spark, sf_dir):
    rows = REGISTRY["cdc_source_freshness"].spark(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(1 for r in rows if r["seq_lag"] == 0) >= 1
    assert sum(1 for r in rows if r["ts_lag_seconds"] == 0) >= 1
    total = T(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in rows) == total
    for r in rows:
        assert r["seq_lag"] >= 0 and r["ts_lag_seconds"] >= 0
