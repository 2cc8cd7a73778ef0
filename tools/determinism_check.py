"""Run every registry query twice in the same session and require
value-identical results — catches within-Spark nondeterminism (arbitrary
tie-breaks, unordered collect_list/concat, partition-order-dependent
floats) that the DuckDB oracle comparison can miss on a lucky run but
the driver's re-runs would eventually trip over.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gravity_spark.queries import REGISTRY
from gravity_spark.session import get_spark


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(repr(r[c]) for c in cols) for r in df.collect()]
    rows.sort()
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("determinism_check")
    bad = []
    for name in names:
        fn = REGISTRY[name].spark
        try:
            a = canon(fn(spark, sf_dir))
            b = canon(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"error: {e}"))
            print(f"ERR   {name}: {e}", flush=True)
            continue
        if a != b:
            diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
            bad.append((name, f"{diff} differing rows"))
            print(f"FLAKY {name}: {diff} differing rows of {len(a)}", flush=True)
        else:
            print(f"ok    {name} ({len(a)} rows)", flush=True)
    print()
    if bad:
        print(f"{len(bad)} nondeterministic: {[n for n, _ in bad]}")
        sys.exit(1)
    print("all deterministic")


if __name__ == "__main__":
    main()
