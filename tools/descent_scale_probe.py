"""Hierarchical-fold scale probe: numbers behind the descent/sweep
operators' 100 TB claims.

The weighted-median histogram descent (`weighted_median_descent`), the
quantile histogram, the backlog delta-sweep, and the skyline band fold
all rest on the same claim: the DRIVER payload is bounded by the bin
count (≤1024 rows per group per round) and the ROUND count is bounded
by log1024(value range) — both independent of row count. This probe
replicates the lineitem table N× in memory (union of shifted copies:
order keys are offset per replica so group sizes grow with N while the
value RANGE stays fixed — the adversarial case for a range-driven
descent) and records, per multiplier:

    rows          — input rows after replication
    rounds        — descent rounds until width-1 bins
    driver_rows   — total histogram rows collected by the driver
    wall_s        — end-to-end time of the weighted-median query shape

Expected (and what BASELINE.md records): rounds and driver_rows FLAT
across multipliers, wall time near-linear in rows.

Usage:
    python tools/descent_scale_probe.py [sf_dir] [mult [mult ...]]
    # default: /root/testdata/sf0.01 at 1, 4, 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gravity_spark.session import get_spark


def replicate(li, n: int):
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 10_000_000)).alias("l_orderkey"),
            "l_returnflag", "l_extendedprice", "l_quantity",
        )
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_median_probe(t):
    """Instrument the PRODUCTION descent core (gravity_spark.queries.
    weighted_median_groups) — probes must measure the shipped shape."""
    from gravity_spark.queries import weighted_median_groups

    stats: dict = {}
    out = weighted_median_groups(t, stats=stats)
    return stats["rounds"], stats["driver_rows"], {f: m for f, _, m in out}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mults = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark("descent_scale_probe")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    results = []
    medians_by_mult = {}
    for m in mults:
        t = replicate(li, m).select(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_extendedprice") * 100).cast("long").alias("c"),
            (F.col("l_quantity") * 100).cast("long").alias("w"),
        ).persist()
        n = t.count()  # materialize outside the timed section
        t0 = time.time()
        rounds, driver_rows, medians = weighted_median_probe(t)
        wall = time.time() - t0
        t.unpersist()
        medians_by_mult[m] = medians
        results.append({
            "mult": m, "rows": n, "rounds": rounds,
            "driver_rows": driver_rows, "wall_s": round(wall, 2),
        })
        print(json.dumps(results[-1]))
    # replication preserves the per-group weighted median exactly
    base = medians_by_mult[mults[0]]
    for m in mults[1:]:
        assert medians_by_mult[m] == base, (m, medians_by_mult[m], base)
    print("medians identical across multipliers:", base)


if __name__ == "__main__":
    main()
