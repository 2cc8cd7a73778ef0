"""One-off diagnostic: run the streaming bench rows N times and print
per-run wall time + micro-batch geometry (batch count, data batches,
no-data batches) from the query's recentProgress, to pin down the
bimodal epoch count the r8 verdict flagged (VERDICT r8 task 2).

Usage: python tools/epoch_probe.py [query ...] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gravity_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--runs":  # space-separated form: --runs N
            runs = int(argv[i + 1])
            i += 2
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
            i += 1
        else:
            names.append(a)
            i += 1
    names = names or ["streaming_stream_join"]

    from gravity_spark import queries as Q

    spark = get_spark("epoch_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    for name in names:
        for i in range(runs):
            Q.STREAM_GEOMETRY.clear()
            t0 = time.time()
            df = Q.REGISTRY[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            print(
                f"{name} run {i}: wall={wall:.2f}s "
                f"geometry={dict(Q.STREAM_GEOMETRY)}",
                flush=True,
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
