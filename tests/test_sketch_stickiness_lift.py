"""Invariants for HLL merge, DAU/WAU stickiness, and decile lift.

- hll_merge_rollup: is_lossless MUST be 1 (register-wise max == sketch
  of the union) and the estimate is within HLL's expected error band
  of the exact count for m=256 (~6.5% -> assert 25% slack).
- events_stickiness_dau_mau: WAU >= DAU every day, WAU never exceeds
  the 7-day union recomputed locally, stickiness in (0, 1000].
- classifier_decile_lift: counts tile the corpus, capture is monotone
  non-decreasing reaching exactly 1000 milli at decile 10, and the
  final cumulative lift is exactly 1000 milli (random over the whole
  population).
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_hll_merge_lossless(spark, sf_dir):
    import math

    r = REGISTRY["hll_merge_rollup"].spark(spark, sf_dir).collect()[0]
    assert r["is_lossless"] == 1
    assert r["hll_merged"] == r["hll_direct"]
    assert 0 < r["occupied"] <= 256
    m = 256
    if r["n_exact"] > 2.5 * m:
        # raw-HLL regime: ~1.04/sqrt(m) relative error, assert 4 sigma
        assert abs(r["hll_merged"] - r["n_exact"]) / r["n_exact"] < 0.25
    else:
        # small-range regime: raw HLL overestimates by design; the
        # LINEAR COUNTING correction m*ln(m/empty) — computable from
        # the query's `occupied` output — must recover the exact count
        lc = m * math.log(m / (m - r["occupied"]))
        assert abs(lc - r["n_exact"]) / max(r["n_exact"], 1) < 0.25


def test_stickiness_bounds(spark, sf_dir):
    rows = REGISTRY["events_stickiness_dau_mau"].spark(spark, sf_dir).collect()
    ud = (
        T(spark, sf_dir, "events")
        .select("user_id", F.expr("unix_timestamp(ts) div 86400").alias("d"))
        .distinct()
        .collect()
    )
    by_day = defaultdict(set)
    for r in ud:
        by_day[r["d"]].add(r["user_id"])
    assert {r["day"] for r in rows} == set(by_day)
    for r in rows:
        dau = len(by_day[r["day"]])
        wau = len(
            set().union(*(by_day.get(r["day"] - i, set()) for i in range(7)))
        )
        assert r["dau"] == dau
        assert r["wau"] == wau
        assert r["wau"] >= r["dau"]
        assert 0 < r["stickiness_milli"] <= 1000
        assert r["stickiness_milli"] == (2000 * dau + wau) // (2 * wau)


def test_decile_lift_structure(spark, sf_dir):
    rows = sorted(
        REGISTRY["classifier_decile_lift"].spark(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    docs = T(spark, sf_dir, "documents")
    n = docs.count()
    np = docs.filter(F.col("lang") == "en").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n"] for r in rows) == n
    assert sum(r["n_pos"] for r in rows) == np
    # ntile head rule: decile 10 (lowest scores) holds the remainder
    sizes = sorted((r["n"] for r in rows), reverse=True)
    assert sizes[0] - sizes[-1] <= 1
    prev = 0
    for r in rows:
        assert r["capture_milli"] >= prev
        prev = r["capture_milli"]
    assert rows[-1]["capture_milli"] == 1000
    assert rows[-1]["cum_lift_milli"] == 1000
