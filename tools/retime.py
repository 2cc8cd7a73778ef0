"""Min-of-N re-timer for individual registered queries, with exactly
the bench's per-query methodology (noop sink, clearCache + RDD
unpersist + GC between runs, 1M-row warmup) — the host shows
intermittent multi-10s stalls (BASELINE §4), so no single timing is
trusted; this prints every run and the min. Usage:

    python tools/retime.py query [query ...] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--runs":
            runs = int(argv[i + 1])
            i += 2
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
            i += 1
        else:
            names.append(a)
            i += 1

    from gravity_spark.queries import REGISTRY
    from gravity_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("retime")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    for name in names:
        secs = []
        for it in range(runs):
            sc.setJobDescription(f"retime:{name}#{it}")
            t0 = time.time()
            try:
                REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                secs.append(round(time.time() - t0, 3))
            finally:
                spark.catalog.clearCache()
                jmap = sc._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    rdd = jmap.get(rid)
                    if rdd is not None:
                        rdd.unpersist(False)
                sc._jvm.System.gc()
            print(f"{name} run{it}: {secs[-1]:.3f}s", flush=True)
        print(f"{name} MIN of {runs}: {min(secs):.3f}s  all={secs}", flush=True)


if __name__ == "__main__":
    main()
