"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf dir, compares row count, column names, and values
(columns sorted by name, rows sorted by all values — exact match, plus
a float-diff report so near-misses are visible before the driver sees
them).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from __spark_entry__ import queries, oracle_sql
from gravity_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


_SPARK_TO_DUCK = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "binary": "BLOB",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}

# classes used to decide whether a mismatch is fatal (value-widening the
# driver's typed hash will see) vs cosmetic (same hashed representation)
_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "wide", "UHUGEINT": "wide",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "wide",
    "FLOAT": "float", "DOUBLE": "float", "REAL": "float",
    "VARCHAR": "text", "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "TIMESTAMP_NS": "ts",
    "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
}


def spark_to_duck(dtype: str) -> str | None:
    """Expected DuckDB type for a Spark dtype string; None = unchecked."""
    dtype = dtype.strip()
    if dtype.startswith("array<") and dtype.endswith(">"):
        inner = spark_to_duck(dtype[6:-1])
        return None if inner is None else inner + "[]"
    if dtype.startswith("decimal"):
        return dtype.upper().replace(" ", "")
    return _SPARK_TO_DUCK.get(dtype)


def _type_class(duck_type: str) -> str:
    base = duck_type
    depth = 0
    while base.endswith("[]"):
        base = base[:-2]
        depth += 1
    if base.startswith("DECIMAL"):
        cls = "decimal:" + base
    else:
        cls = _CLASS.get(base, base)
    return cls + "[]" * depth


def type_mismatches(spark_dtypes, duck_desc):
    """Compare Spark df.dtypes against DuckDB DESCRIBE output.

    Returns (fatal, warn): lists of (col, spark_type, duck_type).
    Fatal = the driver's typed value-hash will differ (e.g. sum(int) →
    HUGEINT, epoch() → DOUBLE); warn = cosmetic variant (timestamp unit).
    """
    duck = {name: dt for name, dt in duck_desc}
    fatal, warn = [], []
    for col, sdt in spark_dtypes:
        ddt = duck.get(col)
        if ddt is None:
            continue
        expect = spark_to_duck(sdt)
        if expect is None:
            continue
        if ddt == expect:
            continue
        rec = (col, sdt, ddt)
        if _type_class(ddt) != _type_class(expect):
            fatal.append(rec)
        else:
            warn.append(rec)
    return fatal, warn


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, (float, int)):
        return a == b or (math.isnan(a) and isinstance(b, float) and math.isnan(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # mimic the DRIVER's session: no custom configs at builder time —
        # catches anything that silently depends on get_spark's configs
        # (e.g. nanosAsLong, which is builder-time-only in Spark 4.1)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        spark_s = time.time() - t0

        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{spark_s:.1f}s]")
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        fatal, warn = type_mismatches(sdf.dtypes, [(d[0], d[1]) for d in desc])
        if fatal:
            failures.append(name)
            print(f"FAIL  {name}: oracle type widening {fatal}")
            continue
        if warn:
            print(f"warn  {name}: type variants {warn}")

        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sc} duckdb={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            continue
        bad = 0
        first = None
        for i, (x, y) in enumerate(zip(sr, dr)):
            if not all(values_equal(a, b) for a, b in zip(x, y)):
                bad += 1
                if first is None:
                    first = (i, x, y)
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: {bad}/{len(sr)} mismatched rows; first: {first}")
        else:
            print(f"OK    {name}: {len(sr)} rows [{spark_s:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
