"""Invariants for the ML-eval and ledger operators.

- classifier_auc_eval: the histogram closed form must equal the naive
  O(pos×neg) pairwise Mann-Whitney statistic (computed locally on the
  small fixture), and a perfectly-separating score must give AUC 1.
- score_calibration_bins: bin stats must reproduce from a local pandas
  recomputation; Brier is bounded by [0, 1].
- inventory_running_floor: the reflection closed form
  B_i = S_i - min(0, min_{j<=i} S_j) must equal the sequential
  max(0, B+delta) recurrence replayed row by row.
- events_activity_streaks: streak lengths must tile the active-day set
  (sum == distinct days) and max_streak must match a local scan.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_auc_matches_pairwise(spark, sf_dir):
    out = REGISTRY["classifier_auc_eval"].spark(spark, sf_dir).collect()[0]
    docs = T(spark, sf_dir, "documents").select(
        F.expr("CAST(n_chars AS BIGINT) div 50").alias("s"),
        (F.col("lang") == "en").cast("long").alias("y"),
    ).collect()
    pos = [r["s"] for r in docs if r["y"] == 1]
    neg = [r["s"] for r in docs if r["y"] == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert abs(out["auc"] - num / (len(pos) * len(neg))) < 1e-6


def test_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [(i, 1 if i >= 50 else 0) for i in range(100)], "s long, y long"
    )
    hist = df.groupBy("s").agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    from pyspark.sql import Window

    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    run = hist.select(
        "pos", "neg", F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("nb")
    )
    row = run.agg(
        (
            F.sum(F.col("pos") * (2 * F.col("nb") + F.col("neg"))).cast("double")
            / (2 * F.sum("pos") * F.sum("neg"))
        ).alias("auc")
    ).collect()[0]
    assert row["auc"] == 1.0


def test_calibration_bins_recompute(spark, sf_dir):
    rows = REGISTRY["score_calibration_bins"].spark(spark, sf_dir).collect()
    docs = T(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    by_bin = defaultdict(lambda: [0, 0, 0, 0])  # n, sum_p, sum_y, sum_sq
    for r in docs:
        p = min(int(r["n_chars"]), 2000) * 500
        y = 1 if r["lang"] == "en" else 0
        b = min(p // 100000, 9)
        agg = by_bin[b]
        agg[0] += 1
        agg[1] += p
        agg[2] += y
        agg[3] += (p - y * 1000000) ** 2
    assert {r["bin"] for r in rows} == set(by_bin)
    for r in rows:
        n, sp, sy, sq = by_bin[r["bin"]]
        assert r["n"] == n
        assert abs(r["mean_pred"] - sp / (n * 1e6)) < 1e-6
        assert abs(r["pos_rate"] - sy / n) < 1e-6
        assert abs(r["brier"] - sq / (n * 1e12)) < 1e-6
        assert 0.0 <= r["brier"] <= 1.0


def test_running_floor_matches_sequential_replay(spark, sf_dir):
    out = {
        r["user_id"]: r
        for r in REGISTRY["inventory_running_floor"].spark(spark, sf_dir).collect()
    }
    ev = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "view", "purchase"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        c = int(round(r["value"] * 100))
        d = c if r["event_type"] in ("signup", "view") else -c
        by_user[r["user_id"]].append((r["ts"], r["event_id"], d))
    assert set(out) == set(by_user)
    for u, txs in by_user.items():
        bal, peak, hits = 0, None, 0
        for _, _, d in sorted(txs):
            if bal + d < 0:
                hits += 1
                bal = 0
            else:
                bal += d
            peak = bal if peak is None else max(peak, bal)
        r = out[u]
        assert r["n_tx"] == len(txs)
        assert r["final_balance_cents"] == bal
        assert r["peak_balance_cents"] == peak
        assert r["floor_hits"] == hits


def test_streaks_tile_active_days(spark, sf_dir):
    rows = REGISTRY["events_activity_streaks"].spark(spark, sf_dir).collect()
    days = (
        T(spark, sf_dir, "events")
        .select("user_id", F.expr("unix_timestamp(ts) div 86400").alias("d"))
        .distinct()
        .collect()
    )
    by_user = defaultdict(set)
    for r in days:
        by_user[r["user_id"]].add(r["d"])
    assert {r["user_id"] for r in rows} == set(by_user)
    for r in rows:
        ds = sorted(by_user[r["user_id"]])
        assert r["active_days"] == len(ds)
        # local islands scan
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert r["n_streaks"] == len(streaks)
        assert r["max_streak"] == max(streaks)
        assert sum(streaks) == r["active_days"]
