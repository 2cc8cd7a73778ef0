"""Invariants for bipartite co-purchase similarity and error bursts.

- customer_copurchase_jaccard: every pair's shared count matches a
  local set intersection over the CAPPED edge set, the hub cap really
  removed parts with degree > 60, and jaccard_milli is the half-up
  division of shared / union.
- events_error_burst: episodes tile each user's error count, bursts
  match a local gap-chain replay, and first_burst_epoch is the start
  of the earliest >= 3-length episode.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_copurchase_matches_local_sets(spark, sf_dir):
    rows = REGISTRY["customer_copurchase_jaccard"].spark(spark, sf_dir).collect()
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    cp = {
        (r["o_custkey"], r["l_partkey"])
        for r in li.join(orders, "l_orderkey").collect()
    }
    deg = defaultdict(int)
    for _, pk in cp:
        deg[pk] += 1
    kept = defaultdict(set)
    for ck, pk in cp:
        if deg[pk] <= 60:
            kept[ck].add(pk)
    customers = sorted(kept)
    # local check on the pairs the engine emitted plus absence checks
    got = {(r["c1"], r["c2"]): r for r in rows}
    for (c1, c2), r in got.items():
        inter = len(kept[c1] & kept[c2])
        union = len(kept[c1] | kept[c2])
        assert inter >= 3
        assert r["shared"] == inter
        assert r["union_size"] == union
        assert r["jaccard_milli"] == (2000 * inter + union) // (2 * union)
    # spot absence: sample pairs not emitted must have shared < 3
    import itertools

    for c1, c2 in itertools.islice(itertools.combinations(customers, 2), 500):
        if (c1, c2) not in got:
            assert len(kept[c1] & kept[c2]) < 3


def test_error_bursts_replay(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in REGISTRY["events_error_burst"].spark(spark, sf_dir).collect()
    }
    ev = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_id"]))
    assert set(rows) == set(by_user)
    for u, es in by_user.items():
        es.sort()
        episodes = []
        cur = 1
        start = es[0][0]
        starts = [start]
        for (a, _), (b, _) in zip(es, es[1:]):
            if b - a > 3600000000:
                episodes.append(cur)
                cur = 1
                starts.append(b)
            else:
                cur += 1
        episodes.append(cur)
        r = rows[u]
        assert r["n_episodes"] == len(episodes)
        assert sum(episodes) == len(es)
        assert r["max_burst"] == max(episodes)
        bursts = [
            (s, l) for s, l in zip(starts, episodes) if l >= 3
        ]
        assert r["n_bursts"] == len(bursts)
        if bursts:
            assert r["first_burst_epoch"] == min(s for s, _ in bursts) // 1000000
        else:
            assert r["first_burst_epoch"] is None
