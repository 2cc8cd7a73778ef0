"""Invariant: the user anomaly mask recomputes from a local replay of
all four rules, and synthetic actors trip the timing rules the
organic fixture can't (uniform synthetic timing only trips the
error-share bit)."""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_mask_recompute(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in REGISTRY["user_anomaly_gate"].spark(spark, sf_dir).collect()
    }
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_id"], r["event_type"]))
    assert set(rows) == set(by_user)
    for u, es in by_user.items():
        es.sort()
        n = len(es)
        errs = sum(1 for _, _, t in es if t == "error")
        minutes = defaultdict(int)
        hours = set()
        for us, _, _ in es:
            minutes[us // 60000000] += 1
            hours.add((us // 3600000000) % 24)
        gaps = {
            (b - a) // 1000000 for (a, _, _), (b, _, _) in zip(es, es[1:])
        }
        mask = 0
        if 10 * errs > 3 * n:
            mask |= 1
        if max(minutes.values()) >= 3:
            mask |= 2
        if n >= 5 and len(gaps) == 1:
            mask |= 4
        if n >= 10 and len(hours) <= 2:
            mask |= 8
        assert rows[u]["n"] == n
        assert rows[u]["anomaly_mask"] == mask


def test_synthetic_bot_trips_timing_rules():
    # pure-python rule replay on a scripted actor: 10 events exactly
    # 60s apart inside two hours -> cadence (4) + hour (8) + burst? no
    us = [i * 60_000_000 for i in range(10)]
    gaps = {(b - a) // 1000000 for a, b in zip(us, us[1:])}
    hours = {(u // 3600000000) % 24 for u in us}
    assert len(gaps) == 1 and len(us) >= 5  # bit 4 fires
    assert len(us) >= 10 and len(hours) <= 2  # bit 8 fires
