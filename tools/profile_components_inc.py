"""Phase-level profile of graph_components_incremental (r6 verdict
task 3): times each phase and counts Spark jobs via the status tracker,
so round-over-round creep can be attributed to a phase instead of
argued. Run on an idle host:

    python tools/profile_components_inc.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from gravity_spark.functions.dedup import connected_components_bipartite
    from gravity_spark.queries import T
    from gravity_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_components_inc")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or []) + len(
            [j for j in (tracker.getActiveJobsIds() or [])]
        )

    last_job = [0]

    def phase(label, fn):
        j0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        j1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        print(f"{label:35s} {dt:7.2f}s  jobs={j1 - j0}")
        return out

    for it in range(3):
        print(f"--- iteration {it} ---")
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        orders = T(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
        )
        cp = (
            li.join(orders, "l_orderkey")
            .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
            .distinct()
        )
        deg = cp.groupBy("pk").agg(F.count(F.lit(1)).alias("d"))
        kept = cp.join(
            F.broadcast(deg.filter(F.col("d") <= 60).select("pk")), "pk"
        ).persist()
        phase("build kept (persist+count)", lambda: kept.count())
        verts = phase("verts distinct", lambda: kept.select("ck").distinct())
        base = kept.filter(F.col("pk") % 2 == 0).select(
            F.col("ck").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
        )
        singleton = verts.select(
            F.col("ck").alias("doc_id"), F.lit(None).cast("string").alias("bucket")
        )
        stats: dict = {}
        l1 = phase(
            "base components (bipartite)",
            lambda: connected_components_bipartite(
                base.unionByName(singleton), stats=stats
            ).select(F.col("doc_id").alias("ck"), F.col("component").alias("lab")),
        )
        print(f"  base rounds={stats.get('rounds')}")
        delta = kept.filter(F.col("pk") % 2 == 1)
        dmemb = (
            delta.join(l1, "ck")
            .select(
                F.col("lab").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
            )
            .distinct()
        )
        stats2: dict = {}
        relabel = phase(
            "delta components (bipartite)",
            lambda: connected_components_bipartite(dmemb, stats=stats2).select(
                F.col("doc_id").alias("lab"), F.col("component").alias("newlab")
            ),
        )
        print(f"  delta rounds={stats2.get('rounds')}")
        out = l1.join(F.broadcast(relabel), "lab", "left").select(
            F.col("ck").alias("custkey"),
            F.coalesce("newlab", "lab").alias("component"),
        )
        phase("final join + checkpoint", lambda: out.localCheckpoint())
        kept.unpersist()
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
