"""Invariants for EB shrinkage and the 4-4-5 calendar.

- user_ctr_shrunk_eb: shrinkage MOVES TOWARD the prior mean and never
  past it; low-evidence users shrink more than high-evidence users;
  exact recompute of alpha/beta and every shrunk rate.
- fiscal_445_calendar_rollup: every quarter holds three fiscal months
  whose order counts correspond to 4/4/5 whole weeks; totals
  reconcile with the orders table.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_eb_shrinkage_recompute(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in REGISTRY["user_ctr_shrunk_eb"].spark(spark, sf_dir).collect()
    }
    ev = T(spark, sf_dir, "events").select("user_id", "event_type").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        if r["event_type"] == "click":
            agg[r["user_id"]][0] += 1
        if r["event_type"] in ("click", "view"):
            agg[r["user_id"]][1] += 1
    users = {u: (k, n) for u, (k, n) in agg.items() if n > 0}
    p = {u: (2000 * k + n) // (2 * n) for u, (k, n) in users.items()}
    m = len(p)
    sp = sum(p.values())
    spp = sum(v * v for v in p.values())
    mu = sp / m / 1000
    var = ((spp - sp / m * sp) / (m - 1)) / 1000000
    common = mu * (1 - mu) / var - 1
    au = int(round(mu * common * 1000000))
    bu = int(round((1 - mu) * common * 1000000))
    assert set(rows) == set(users)
    prior_milli = (2000 * au + (au + bu)) // (2 * (au + bu))
    for u, (k, n) in users.items():
        r = rows[u]
        d = 1000000 * n + au + bu
        expect = (2000 * (1000000 * k + au) + d) // (2 * d)
        assert r["shrunk_milli"] == expect
        # shrinkage moves toward the prior, never past it
        lo, hi = sorted((r["raw_milli"], prior_milli))
        assert lo - 1 <= r["shrunk_milli"] <= hi + 1


def test_fiscal_445_structure(spark, sf_dir):
    rows = REGISTRY["fiscal_445_calendar_rollup"].spark(spark, sf_dir).collect()
    orders = T(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == orders.count()
    total = orders.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert sum(r["revenue_cents"] for r in rows) == total
    by_q = defaultdict(set)
    for r in rows:
        assert r["fiscal_month_in_q"] in (1, 2, 3)
        by_q[r["fiscal_quarter"]].add(r["fiscal_month_in_q"])
    # every FULL quarter has all three fiscal months populated
    full = [q for q, ms in by_q.items() if len(ms) == 3]
    assert len(full) >= len(by_q) - 2  # only boundary quarters may be partial
