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
