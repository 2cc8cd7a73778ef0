"""Invariants for path trigrams and monthly priority drift.

- events_path_trigrams: counts match a local sliding-window scan over
  each user's ordered events; shares are the half-up micro division;
  the support floor holds.
- orders_priority_drift_by_month: chi2 >= 0 per month, n_orders
  margins match, and the per-month chi2 values sum to the global
  month x priority independence statistic (partition property).
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_trigrams_match_local_scan(spark, sf_dir):
    rows = REGISTRY["events_path_trigrams"].spark(spark, sf_dir).collect()
    ev = (
        T(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            counts[(types[i], types[i + 1], types[i + 2])] += 1
    nn = sum(counts.values())
    expected = {
        t3: n for t3, n in counts.items() if n * 200 >= nn
    }
    got = {(r["e1"], r["e2"], r["e3"]): r["n"] for r in rows}
    assert got == expected
    for r in rows:
        assert r["share_micro"] == (2000000 * r["n"] + nn) // (2 * nn)


def test_priority_drift_partition_property(spark, sf_dir):
    rows = REGISTRY["orders_priority_drift_by_month"].spark(spark, sf_dir).collect()
    orders = T(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        "o_orderpriority",
    ).collect()
    cells = defaultdict(int)
    mt = defaultdict(int)
    pt = defaultdict(int)
    for r in orders:
        cells[(r["m"], r["o_orderpriority"])] += 1
        mt[r["m"]] += 1
        pt[r["o_orderpriority"]] += 1
    n = len(orders)
    local = defaultdict(float)
    for (m, p), o in cells.items():
        e = mt[m] * pt[p] / n
        local[m] += round((o - e) ** 2 / e * 1e6) / 1e6
    assert {r["month_idx"] for r in rows} == set(mt)
    for r in rows:
        assert r["chi2"] >= 0.0
        assert r["n_orders"] == mt[r["month_idx"]]
        assert abs(r["chi2"] - local[r["month_idx"]]) < 1e-4
    glob = sum(
        (o - mt[m] * pt[p] / n) ** 2 / (mt[m] * pt[p] / n)
        for (m, p), o in cells.items()
    )
    assert abs(sum(r["chi2"] for r in rows) - glob) < 1e-2
