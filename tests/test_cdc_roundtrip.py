"""Recorded-payload CDC end-to-end: verbatim Debezium / Canal JSON
captures (as they'd arrive on a Kafka topic) through the wire decoders,
PK-update decomposition, and the merge sink — the sandbox-faithful
version of the reference's mysql↔mysql integration battery
(integration_test/mysql_mysql_test.go:37-1420): stream apply, PK
update, delete, multi-row events, DDL events, zero-dates, insert-ignore.

No broker needed: the decoders are pure DataFrame transforms, so a
static DataFrame with (value, offset[, topic, partition]) columns is
bit-identical to what spark.readStream.format("kafka") would deliver.
"""

import json

from pyspark.sql import functions as F

from gravity_spark.core.envelope import (
    decompose_pk_updates,
    from_canal_json,
    from_debezium_json,
    typed_view,
)
from gravity_spark.operators.upsert import (
    ENGINE_INSERT_IGNORE,
    ENGINE_REPLACE,
    merge_changes,
)
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget


def _dbz(op, before, after, db="demo", table="users", ts_ms=1700000000000):
    """One Debezium-JSON value, schemas.enable=false shape."""
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {"db": db, "table": table, "ts_ms": ts_ms, "server_id": 1},
            "op": op,
            "ts_ms": ts_ms + 5,
        }
    )


def _kafka_frame(spark, values):
    """(value, offset, topic, partition) — what the Kafka source yields."""
    rows = [(v, i, "demo.users", 0) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "value string, offset long, topic string, partition int")


USERS_DDL = "id long, name string, age long"


def _apply(spark, changes, engine=ENGINE_REPLACE):
    typed = typed_view(
        changes, spark.createDataFrame([], USERS_DDL).schema, ["id"]
    )
    target = spark.createDataFrame([], USERS_DDL)
    return merge_changes(target, typed, ["id"], engine)


# --- Debezium scenarios (TestMySQLToMySQLStream analogue) ----------------

def test_debezium_stream_apply(spark):
    """snapshot read + insert + update + delete → final table state."""
    captures = [
        _dbz("r", None, {"id": "1", "name": "ada", "age": "36"}),
        _dbz("c", None, {"id": "2", "name": "bob", "age": "20"}),
        _dbz("u", {"id": "2", "name": "bob", "age": "20"},
                  {"id": "2", "name": "bob", "age": "21"}),
        _dbz("c", None, {"id": "3", "name": "eve", "age": "9"}),
        _dbz("d", {"id": "3", "name": "eve", "age": "9"}, None),
    ]
    changes = from_debezium_json(_kafka_frame(spark, captures))
    got = changes.collect()
    assert [r.op for r in got] == ["insert", "insert", "update", "insert", "delete"]
    assert got[0].database == "demo" and got[0].table == "users"
    assert got[2].old == {"id": "2", "name": "bob", "age": "20"}
    assert got[2].pks == {"id": "2"}
    # per-partition Kafka offset is the InputSequence equivalent
    assert [r.seq for r in got] == [0, 1, 2, 3, 4]
    assert got[0].stream_key == "demo.users/0"

    state = {r.id: (r.name, r.age) for r in _apply(spark, changes).collect()}
    assert state == {1: ("ada", 36), 2: ("bob", 21)}


def test_debezium_pk_update_decomposes(spark):
    """PK-changing update → DELETE(old) + INSERT(new), in order
    (pkg/inputs/mysqlstream/msg.go:170-225)."""
    captures = [
        _dbz("c", None, {"id": "7", "name": "g", "age": "1"}),
        _dbz("u", {"id": "7", "name": "g", "age": "1"},
                  {"id": "8", "name": "g", "age": "1"}),  # id 7 → 8
        _dbz("u", {"id": "8", "name": "g", "age": "1"},
                  {"id": "8", "name": "g2", "age": "1"}),  # non-PK update
    ]
    changes = decompose_pk_updates(
        from_debezium_json(_kafka_frame(spark, captures))
    )
    rows = sorted(changes.collect(), key=lambda r: r.seq)
    assert [(r.op, r.pks["id"]) for r in rows] == [
        ("insert", "7"),
        ("delete", "7"),   # old image first …
        ("insert", "8"),   # … then the new image
        ("update", "8"),
    ]
    # the delete carries the OLD image as data, pks from the old values
    assert rows[1].data == {"id": "7", "name": "g", "age": "1"}

    state = {r.id: r.name for r in _apply(spark, changes).collect()}
    assert state == {8: "g2"}  # id 7 is gone — no orphan left behind


def test_debezium_non_pk_update_not_decomposed(spark):
    captures = [
        _dbz("u", {"id": "5", "name": "x", "age": "2"},
                  {"id": "5", "name": "y", "age": "2"}),
    ]
    out = decompose_pk_updates(from_debezium_json(_kafka_frame(spark, captures)))
    assert out.count() == 1
    assert out.collect()[0].op == "update"


def test_debezium_zero_date_rides_verbatim(spark):
    """TestZeroTime analogue: MySQL zero-dates arrive as strings in the
    payload map and must survive decode untouched (typed coercion is the
    catalog's job, tested in test_catalog_ddl)."""
    captures = [
        _dbz("c", None, {"id": "1", "name": "z", "age": "0",
                         "born": "0000-00-00 00:00:00"}),
    ]
    r = from_debezium_json(_kafka_frame(spark, captures)).collect()[0]
    assert r.data["born"] == "0000-00-00 00:00:00"


def test_debezium_insert_ignore_engine(spark):
    """TestMySQLBatchWithInsertIgnore analogue: first writer wins."""
    captures = [
        _dbz("c", None, {"id": "1", "name": "first", "age": "1"}),
        _dbz("c", None, {"id": "1", "name": "second", "age": "2"}),
    ]
    changes = from_debezium_json(_kafka_frame(spark, captures))
    state = {r.id: r.name for r in
             _apply(spark, changes, ENGINE_INSERT_IGNORE).collect()}
    assert state == {1: "first"}


# --- Canal scenarios -----------------------------------------------------

def test_canal_multirow_and_ddl(spark):
    """One Canal message carrying N rows explodes to N envelope rows
    (msg.go:284-331); isDdl messages surface the raw statement."""
    multirow = json.dumps(
        {
            "database": "demo",
            "table": "users",
            "type": "INSERT",
            "ts": 1700000001000,
            "pkNames": ["id"],
            "data": [
                {"id": "10", "name": "n10", "age": "10"},
                {"id": "11", "name": "n11", "age": "11"},
            ],
            "old": None,
            "isDdl": False,
            "sql": "",
        }
    )
    upd = json.dumps(
        {
            "database": "demo",
            "table": "users",
            "type": "UPDATE",
            "ts": 1700000002000,
            "pkNames": ["id"],
            "data": [{"id": "10", "name": "n10b", "age": "10"}],
            "old": [{"name": "n10"}],
            "isDdl": False,
            "sql": "",
        }
    )
    ddl = json.dumps(
        {
            "database": "demo",
            "table": "users",
            "type": "ALTER",
            "ts": 1700000003000,
            "pkNames": None,
            "data": None,
            "old": None,
            "isDdl": True,
            "sql": "ALTER TABLE users ADD COLUMN email VARCHAR(255)",
        }
    )
    raw = spark.createDataFrame(
        [(multirow, 0), (upd, 1), (ddl, 2)], "value string, offset long"
    )
    changes = from_canal_json(raw)
    rows = sorted(changes.collect(), key=lambda r: r.seq)
    assert [r.type for r in rows] == ["dml", "dml", "dml", "ddl"]
    assert [r.op for r in rows[:3]] == ["insert", "insert", "update"]
    assert rows[0].data == {"id": "10", "name": "n10", "age": "10"}
    assert rows[1].data == {"id": "11", "name": "n11", "age": "11"}
    assert rows[2].old == {"name": "n10"}
    assert rows[3].ddl_statement.startswith("ALTER TABLE users ADD COLUMN")

    dml = changes.filter(F.col("type") == "dml")
    state = {r.id: r.name for r in _apply(spark, dml).collect()}
    assert state == {10: "n10b", 11: "n11"}


# --- through the real sink (foreachBatch shape) --------------------------

def test_debezium_to_merge_sink_epochs(spark, tmp_path):
    """Two micro-batch epochs through ParquetMergeTarget, including a PK
    move in epoch 2 — the full TestMySQLToMySQLReplication shape with
    idempotent redelivery of the last epoch."""
    t = ParquetMergeTarget(spark, str(tmp_path / "users"), ["id"], USERS_DDL)

    def typed(captures):
        ch = decompose_pk_updates(
            from_debezium_json(_kafka_frame(spark, captures))
        )
        return typed_view(
            ch, spark.createDataFrame([], USERS_DDL).schema, ["id"]
        )

    epoch1 = [
        _dbz("c", None, {"id": "1", "name": "a", "age": "30"}),
        _dbz("c", None, {"id": "2", "name": "b", "age": "40"}),
    ]
    t.apply_batch(typed(epoch1), epoch_id=1)

    epoch2 = [
        _dbz("u", {"id": "2", "name": "b", "age": "40"},
                  {"id": "9", "name": "b", "age": "40"}),  # PK move 2→9
        _dbz("d", {"id": "1", "name": "a", "age": "30"}, None),
    ]
    batch2 = typed(epoch2)
    t.apply_batch(batch2, epoch_id=2)
    state = {r.id: r.name for r in t.read().collect()}
    assert state == {9: "b"}

    # redelivery of epoch 2 must be a no-op (exactly-once via idempotence)
    t.apply_batch(batch2, epoch_id=2)
    assert {r.id: r.name for r in t.read().collect()} == {9: "b"}


# --- Debezium-MongoDB (oplog tailer parity) ------------------------------

def test_debezium_mongo_decode_and_apply(spark):
    """oplog_tailer.go:188-208 semantics: insert→doc, update→full row,
    delete→EMPTY data, pks always {_id}; nested sub-documents ride as
    JSON text in the string map."""
    from gravity_spark.core.envelope import from_debezium_mongo_json

    def mongo(op, after=None, filt=None, ts=1700000000000):
        return json.dumps(
            {
                "after": after,
                "patch": None,
                "filter": filt,
                "source": {"db": "shop", "rs": "rs0", "collection": "carts",
                           "ts_ms": ts},
                "op": op,
                "ts_ms": ts + 3,
            }
        )

    captures = [
        mongo("c", after='{"_id": {"$oid": "aaa111"}, "user": "ada", '
                         '"items": [{"sku": "x", "qty": 2}]}'),
        mongo("u", after='{"_id": {"$oid": "aaa111"}, "user": "ada", '
                         '"items": [{"sku": "x", "qty": 5}]}'),
        mongo("c", after='{"_id": 7, "user": "bob"}'),
        mongo("d", filt='{"_id": 7}'),
    ]
    raw = spark.createDataFrame(
        [(v, i) for i, v in enumerate(captures)], "value string, offset long"
    )
    rows = sorted(from_debezium_mongo_json(raw).collect(), key=lambda r: r.seq)

    assert [r.op for r in rows] == ["insert", "update", "insert", "delete"]
    assert rows[0].database == "shop" and rows[0].table == "carts"
    assert rows[0].host == "rs0"
    assert rows[0].pks == {"_id": '{"$oid":"aaa111"}'}
    assert rows[1].pks == {"_id": '{"$oid":"aaa111"}'}
    # nested array survives as JSON text inside the string map
    assert json.loads(rows[1].data["items"]) == [{"sku": "x", "qty": 5}]
    # delete: empty data map, id recovered from the filter
    assert rows[3].data == {}
    assert rows[3].pks == {"_id": "7"}
    assert all(r.stream_key == "mongooplog" for r in rows)

    # final state through the replace engine, keyed by _id
    typed = from_debezium_mongo_json(raw).select(
        F.col("pks")["_id"].alias("_id"),
        F.col("data")["user"].alias("user"),
        "op", "seq",
    )
    from gravity_spark.operators.upsert import merge_changes

    empty = spark.createDataFrame([], "_id string, user string")
    state = {r._id: r.user for r in merge_changes(empty, typed, ["_id"]).collect()}
    assert state == {'{"$oid":"aaa111"}': "ada"}


# --- TiDB binlog-slave format (tidb_kafka input parity) ------------------

def test_tidb_binlog_decode_and_apply(spark):
    """binlog_tailer.go:125-222: one Binlog → N tables × M mutations
    exploded, positional columns zipped to column_info names, change_row
    as the old image, PKs from is_primary_key, TSO → seconds."""
    from gravity_spark.core.envelope import from_tidb_binlog_json

    tso = 1700000000000 << 18  # physical ms part = 1700000000000
    dml = json.dumps(
        {
            "type": "DML",
            "commit_ts": tso,
            "dml_data": {
                "tables": [
                    {
                        "schema_name": "demo",
                        "table_name": "users",
                        "column_info": [
                            {"name": "id", "mysql_type": "bigint", "is_primary_key": True},
                            {"name": "name", "mysql_type": "varchar", "is_primary_key": False},
                        ],
                        "mutations": [
                            {"type": "Insert", "row": {"columns": ["1", "ada"]}},
                            {"type": "Update",
                             "row": {"columns": ["1", "ada2"]},
                             "change_row": {"columns": ["1", "ada"]}},
                        ],
                    },
                    {
                        "schema_name": "demo",
                        "table_name": "tags",
                        "column_info": [
                            {"name": "tid", "mysql_type": "int", "is_primary_key": True},
                        ],
                        "mutations": [
                            {"type": "Insert", "row": {"columns": ["9"]}},
                            {"type": "Delete", "row": {"columns": ["9"]}},
                        ],
                    },
                ]
            },
        }
    )
    ddl = json.dumps(
        {
            "type": "DDL",
            "commit_ts": tso + (1 << 18),
            "ddl_data": {"ddl_query": "ALTER TABLE demo.users ADD COLUMN x INT"},
        }
    )
    raw = spark.createDataFrame([(dml, 0), (ddl, 1)], "value string, offset long")
    rows = sorted(from_tidb_binlog_json(raw).collect(), key=lambda r: r.seq)

    assert [(r.type, r.op) for r in rows] == [
        ("dml", "insert"), ("dml", "update"),
        ("dml", "insert"), ("dml", "delete"),
        ("ddl", None),
    ]
    assert rows[0].database == "demo" and rows[0].table == "users"
    assert rows[0].data == {"id": "1", "name": "ada"}
    assert rows[0].pks == {"id": "1"}
    assert rows[1].old == {"id": "1", "name": "ada"}
    assert rows[1].data == {"id": "1", "name": "ada2"}
    assert rows[2].table == "tags" and rows[2].pks == {"tid": "9"}
    assert rows[4].ddl_statement.startswith("ALTER TABLE demo.users")
    # TSO physical time: (tso >> 18)/1000 seconds = 1700000000
    assert int(rows[0].ts.timestamp()) == 1700000000

    # mutation order within one binlog is preserved by seq
    assert [r.seq for r in rows] == sorted(r.seq for r in rows)

    # final state: users has ada2, tags empty
    from gravity_spark.operators.upsert import merge_changes

    users = from_tidb_binlog_json(raw).filter(
        (F.col("type") == "dml") & (F.col("table") == "users")
    )
    typed = typed_view(
        users, spark.createDataFrame([], "id long, name string").schema, ["id"]
    )
    empty = spark.createDataFrame([], "id long, name string")
    state = {r.id: r.name for r in merge_changes(empty, typed, ["id"]).collect()}
    assert state == {1: "ada2"}
