"""Invariants for quantile-normalize apply, shipping cycle
percentiles, and peak concurrency.

- quantile_normalize_apply: normalized scores are monotone in raw
  score within a source, and every doc's norm_score equals the global
  edge of its source-relative tile (checked against the map query).
- shipping_cycle_percentiles: p50/p90 equal local exact order
  statistics; p50 <= p90.
- events_peak_concurrency: per-day peaks match a local sequential
  sweep over session intervals built with the same gap rule.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_apply_consistent_with_map(spark, sf_dir):
    rows = REGISTRY["quantile_normalize_apply"].spark(spark, sf_dir).collect()
    mp = {
        (r["source"], r["tile"]): r["glob_hi"]
        for r in REGISTRY["quantile_normalize_map"].spark(spark, sf_dir).collect()
    }
    n_docs = T(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    by_src = defaultdict(list)
    for r in rows:
        assert r["norm_score"] == mp[(r["source"], r["tile"])]
        by_src[r["source"]].append((r["raw_score"], r["doc_id"], r["norm_score"]))
    for vals in by_src.values():
        vals.sort()
        for a, b in zip(vals, vals[1:]):
            assert a[2] <= b[2]  # normalization preserves order


def test_cycle_percentiles_exact(spark, sf_dir):
    rows = REGISTRY["shipping_cycle_percentiles"].spark(spark, sf_dir).collect()
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag",
        F.expr("unix_timestamp(l_shipdate) div 86400").alias("sd"),
    )
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("od"),
    )
    data = defaultdict(list)
    for r in li.join(orders, "l_orderkey").collect():
        data[r["l_returnflag"]].append(r["sd"] - r["od"])
    assert {r["l_returnflag"] for r in rows} == set(data)
    for r in rows:
        vals = sorted(data[r["l_returnflag"]])
        n = len(vals)
        assert r["n"] == n
        assert r["p50_days"] == vals[(n + 1) // 2 - 1]
        assert r["p90_days"] == vals[(9 * n + 9) // 10 - 1]
        assert r["p50_days"] <= r["p90_days"]


def test_peak_concurrency_sequential_sweep(spark, sf_dir):
    rows = {
        r["day"]: r
        for r in REGISTRY["events_peak_concurrency"].spark(spark, sf_dir).collect()
    }
    ev = (
        T(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_id"]))
    intervals = []
    for es in by_user.values():
        es.sort()
        start = es[0][0]
        last = es[0][0]
        for (us, _), (us2, _) in zip(es, es[1:]):
            if us2 - us > 1800000000:
                intervals.append((start // 1000000, last // 1000000 + 1800))
                start = us2
            last = us2
        intervals.append((start // 1000000, last // 1000000 + 1800))
    deltas = defaultdict(int)
    for a, b in intervals:
        deltas[a] += 1
        deltas[b] -= 1
    conc, peak_by_day, trans_by_day = 0, defaultdict(int), defaultdict(int)
    for t in sorted(deltas):
        conc += deltas[t]
        d = t // 86400
        peak_by_day[d] = max(peak_by_day[d], conc)
        trans_by_day[d] += 1
    assert set(rows) == set(peak_by_day)
    for d, r in rows.items():
        assert r["peak_concurrent"] == peak_by_day[d]
        assert r["n_transitions"] == trans_by_day[d]
