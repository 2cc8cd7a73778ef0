"""Invariants for frequent-triple mining and winsorized statistics.

- market_basket_triples: exact agreement with a local itertools
  enumeration on the fixture, A-priori consistency (every frequent
  triple's items pass the item-support prune), and support_ppm is the
  floor division it claims to be.
- orders_winsorized_stats: quantiles bracket the data (p05 <= p95,
  both are attained values), the winsorized mean lies within
  [p05, p95], and both means match a local exact recomputation.
"""

from collections import defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_triples_match_local_enumeration(spark, sf_dir):
    rows = REGISTRY["market_basket_triples"].spark(spark, sf_dir).collect()
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n_orders = T(spark, sf_dir, "orders").select("o_orderkey").distinct().count()
    support = defaultdict(int)
    for items in baskets.values():
        for it in items:
            support[it] += 1
    frequent = {it for it, n in support.items() if n >= 20}
    tri_count = defaultdict(int)
    for items in baskets.values():
        pruned = sorted(i for i in items if i in frequent)
        for t3 in combinations(pruned, 3):
            tri_count[t3] += 1
    expected = {t3: m for t3, m in tri_count.items() if m >= 2}
    got = {(r["p1"], r["p2"], r["p3"]): r["m"] for r in rows}
    assert got == expected
    for r in rows:
        assert r["p1"] < r["p2"] < r["p3"]
        assert all(p in frequent for p in (r["p1"], r["p2"], r["p3"]))
        assert r["support_ppm"] == (r["m"] * 1000000) // n_orders


def test_winsorized_stats_recompute(spark, sf_dir):
    rows = REGISTRY["orders_winsorized_stats"].spark(spark, sf_dir).collect()
    orders = T(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    by_prio = defaultdict(list)
    for r in orders:
        by_prio[r["o_orderpriority"]].append(int(round(r["o_totalprice"] * 100)))
    assert {r["o_orderpriority"] for r in rows} == set(by_prio)
    for r in rows:
        vals = sorted(by_prio[r["o_orderpriority"]])
        n = len(vals)
        assert r["n"] == n

        def lower_q(pct):
            k = (pct * n + 99) // 100  # smallest rank with cum >= ceil
            return vals[k - 1]

        assert r["p05_cents"] == lower_q(5)
        assert r["p95_cents"] == lower_q(95)
        assert r["p05_cents"] <= r["p95_cents"]
        clipped = [min(max(v, r["p05_cents"]), r["p95_cents"]) for v in vals]
        assert r["winsorized_mean_cents"] == (2 * sum(clipped) + n) // (2 * n)
        assert r["raw_mean_cents"] == (2 * sum(vals) + n) // (2 * n)
        assert r["p05_cents"] <= r["winsorized_mean_cents"] <= r["p95_cents"]
