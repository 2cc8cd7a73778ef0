"""Structural guard for the r9 grading-surface failure class.

The driver canonicalizes BOTH engines' result frames through pandas
(Spark via Arrow ``toPandas()``, DuckDB via ``.df()``) and hashes the
typed representation.  Two column classes break that surface:

- DECIMAL: DuckDB's pandas path renders float64, Spark's Arrow path
  ``object`` Decimal — equal values, different typed hash (the r9
  ``decimal_exact_battery`` red);
- array/map/struct: ``pandas.sort_values`` raises ``TypeError:
  unhashable type`` before any comparison (the r9
  ``embedding_pca_project`` ERR).

Round 10's sweep made all 292 registered surfaces scalar-only; this
test pins that invariant so a future round cannot silently reintroduce
either mechanism.  Cheap by construction: the oracle side is a DuckDB
DESCRIBE (no execution), and only the handful of non-describable /
rows-only entries fall back to building the lazy Spark plan's schema.
"""

import sys

import duckdb

sys.path.insert(0, "/root/repo")

_BANNED_MARKERS = ("DECIMAL", "[]", "STRUCT", "MAP(", "UNION(")


def _duck_views(con, sf):
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )


def _spark_banned(dtype) -> bool:
    from pyspark.sql import types as T

    return isinstance(
        dtype, (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
    )


def test_no_representation_fragile_graded_surfaces(spark, sf_dir):
    from __spark_entry__ import oracle_sql, queries

    con = duckdb.connect()
    _duck_views(con, sf_dir)
    offenders: dict[str, list] = {}
    fallback: list[str] = []
    for name, sql in oracle_sql().items():
        if sql is None:
            fallback.append(name)
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            fallback.append(name)  # non-describable — check the Spark side
            continue
        bad = [
            (d[0], d[1])
            for d in desc
            if any(m in d[1].upper() for m in _BANNED_MARKERS)
        ]
        if bad:
            offenders[name] = bad
    qs = queries()
    for name in fallback:
        df = qs[name](spark, sf_dir)
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if _spark_banned(f.dataType)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "graded output surfaces carry driver-canonicalizer-fragile "
        f"column types (cast to scalars — see r9 verdict): {offenders}"
    )


def test_guard_catches_the_r9_mechanisms():
    """Negative control: the exact column classes behind both r9 reds
    (DECIMAL surface; array surface) trip the banned-marker check."""
    con = duckdb.connect()
    desc = con.execute(
        "DESCRIBE SELECT CAST(1 AS DECIMAL(28,0)) AS sum_cents, "
        "[1.0, 2.0] AS proj, 1 AS ok"
    ).fetchall()
    bad = [
        d[0] for d in desc if any(m in d[1].upper() for m in _BANNED_MARKERS)
    ]
    assert bad == ["sum_cents", "proj"]
