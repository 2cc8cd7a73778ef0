"""Mid-stream DDL: a DDL message between micro-batches evolves the
catalog and the sink schema additively (SURVEY §7 'DDL propagation')."""

import json

from pyspark.sql import functions as F

from gravity_spark.core.catalog import Catalog, ColumnDef, TableDef
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
from gravity_spark.streaming.pipeline import file_cdc_source, run_stream


def _write(src, rows):
    src.mkdir(exist_ok=True)
    with open(src / f"p{len(list(src.iterdir()))}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_mid_stream_ddl_additive_evolution(spark, tmp_path):
    catalog = Catalog()
    catalog.put(TableDef("app", "t", [
        ColumnDef("id", "bigint", is_pk=True),
        ColumnDef("v", "varchar(10)"),
    ]))

    src = tmp_path / "cdc"
    target = ParquetMergeTarget(spark, str(tmp_path / "tgt"), ["id"], "id bigint, v string")

    def typed(df):
        # the projection consults the LIVE catalog per batch — new DDL
        # columns appear automatically
        return catalog.get("app", "t").typed_projection(df)

    # batch 1: plain inserts under the original schema
    _write(src, [
        {"type": "dml", "database": "app", "table": "t", "op": "insert",
         "data": {"id": "1", "v": "a"}, "pks": {"id": "1"}, "stream_key": "s", "seq": 1},
    ])
    q = run_stream(file_cdc_source(spark, str(src)), target, typed,
                   str(tmp_path / "ck"), catalog=catalog, current_db="app")
    q.processAllAvailable()

    # batch 2: DDL adds a column, then a row uses it
    _write(src, [
        {"type": "ddl", "database": "app", "table": "t",
         "ddl_statement": "ALTER TABLE app.t ADD COLUMN score int",
         "stream_key": "s", "seq": 2},
        {"type": "dml", "database": "app", "table": "t", "op": "insert",
         "data": {"id": "2", "v": "b", "score": "42"}, "pks": {"id": "2"},
         "stream_key": "s", "seq": 3},
    ])
    q.processAllAvailable()
    q.stop()

    assert [c.name for c in catalog.get("app", "t").columns] == ["id", "v", "score"]
    rows = {r["id"]: r for r in target.read().collect()}
    assert rows[2]["score"] == 42
    assert rows[1]["score"] is None  # pre-evolution row reads NULL
    assert rows[1]["v"] == "a"
