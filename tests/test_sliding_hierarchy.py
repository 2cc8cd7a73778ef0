"""Invariants for sliding windows and the parsed-hierarchy rollup.

- streaming_sliding_window_counts: every graded window's count equals
  the batch count of events in [start, start+2h); consecutive windows
  overlap consistently (n(w) <= n(w-1h slice) + n(w+1h slice) union
  bound via the two hour-buckets it covers).
- part_type_hierarchy_rollup: level-2 rows sum to their level-1
  parent, level-1 rows sum to the grand total, gid encodes the level.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_sliding_counts_match_batch(spark, sf_dir):
    rows = REGISTRY["streaming_sliding_window_counts"].spark(spark, sf_dir).collect()
    ev = [
        r["s"]
        for r in T(spark, sf_dir, "events")
        .select(F.expr("unix_timestamp(ts)").alias("s"))
        .collect()
    ]
    hour = defaultdict(int)
    for s in ev:
        hour[s // 3600 * 3600] += 1
    for r in rows:
        w = r["window_epoch"]
        assert w % 3600 == 0
        assert r["n"] == hour.get(w, 0) + hour.get(w + 3600, 0)
        assert r["n"] > 0


def test_hierarchy_rollup_sums(spark, sf_dir):
    rows = REGISTRY["part_type_hierarchy_rollup"].spark(spark, sf_dir).collect()
    total = [r for r in rows if r["gid"] == 3]
    l1 = [r for r in rows if r["gid"] == 1]
    l2 = [r for r in rows if r["gid"] == 0]
    assert len(total) == 1
    assert total[0]["level1"] == "ALL"
    assert sum(r["revenue_cents"] for r in l1) == total[0]["revenue_cents"]
    assert sum(r["n_lines"] for r in l1) == total[0]["n_lines"]
    by_parent = defaultdict(int)
    for r in l2:
        by_parent[r["level1"]] += r["revenue_cents"]
    for r in l1:
        assert by_parent[r["level1"]] == r["revenue_cents"]
    assert {r["level2"] for r in l1} == {"*"}
