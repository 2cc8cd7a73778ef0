from pyspark.sql import functions as F

from gravity_spark.core.envelope import memory_changes
from gravity_spark.core.matchers import glob_to_regex, compile_matchers
from gravity_spark.operators.filters import (
    accept_filter,
    reject_filter,
    delete_dml_columns,
    rename_dml_columns,
    apply_filter_chain,
)

ROWS = [
    {"database": "test", "table": "users", "op": "insert",
     "data": {"id": 1, "name": "a"}, "pks": {"id": 1}, "seq": 1},
    {"database": "test", "table": "orders", "op": "update",
     "data": {"id": 2, "amt": 5}, "old": {"id": 2, "amt": 4}, "pks": {"id": 2}, "seq": 2},
    {"database": "prod", "table": "users", "op": "delete",
     "data": {"id": 3}, "pks": {"id": 3}, "seq": 3},
]


def test_glob_to_regex():
    assert glob_to_regex("test*") == "^test.*$"
    assert glob_to_regex("*") == "^.*$"
    assert glob_to_regex("a*b") == "^a.*b$"


def test_accept_reject(spark):
    df = memory_changes(spark, ROWS)
    assert accept_filter(df, {"match-schema": "test"}).count() == 2
    assert reject_filter(df, {"match-schema": "test"}).count() == 1
    assert accept_filter(df, {"match-table": ["users", "orders"]}).count() == 3
    assert accept_filter(df, {"match-dml-op": ["insert", "delete"]}).count() == 2
    assert accept_filter(
        df, {"match-schema": "test", "match-dml-op": "update"}
    ).count() == 1  # matchers AND together


def test_matcher_glob_star(spark):
    df = memory_changes(spark, ROWS)
    assert accept_filter(df, {"match-schema": "*"}).count() == 3
    assert accept_filter(df, {"match-table": "user*"}).count() == 2


def test_delete_columns_scoped(spark):
    df = memory_changes(spark, ROWS)
    out = delete_dml_columns(df, ["name"], {"match-table": "users"})
    rows = {r["seq"]: r for r in out.collect()}
    assert "name" not in rows[1]["data"]
    assert rows[2]["data"]["amt"] == "5"  # non-matching rows untouched


def test_rename_columns(spark):
    df = memory_changes(spark, ROWS)
    out = rename_dml_columns(df, {"amt": "amount"}, {"match-table": "orders"})
    rows = {r["seq"]: r for r in out.collect()}
    assert rows[2]["data"]["amount"] == "5"
    assert rows[2]["old"]["amount"] == "4"
    assert "amt" not in rows[2]["data"]
    assert rows[1]["data"]["name"] == "a"


def test_filter_chain(spark):
    df = memory_changes(spark, ROWS)
    out = apply_filter_chain(
        df,
        [
            {"type": "accept", "config": {"match-schema": "test"}},
            {"type": "rename-dml-column",
             "config": {"from": ["amt"], "to": ["amount"], "match-table": "orders"}},
            {"type": "python", "config": {"fn": lambda d: d.withColumn("tagged", F.lit(1))}},
        ],
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["tagged"] == 1 for r in rows)


def test_split_dead_letter_quarantines_bad_rows(spark):
    from gravity_spark.core.catalog import ColumnDef, TableDef
    from gravity_spark.core.envelope import memory_changes
    from gravity_spark.operators.filters import split_dead_letter

    tdef = TableDef("app", "t", [
        ColumnDef("id", "bigint", is_pk=True),
        ColumnDef("amount", "decimal(10,2)"),
        ColumnDef("created", "datetime"),
    ])
    rows = [
        {"database": "app", "table": "t", "op": "insert", "seq": 1,
         "data": {"id": "1", "amount": "10.50", "created": "2024-01-02 03:04:05"},
         "pks": {"id": "1"}},
        # corrupt numeric → dead
        {"database": "app", "table": "t", "op": "insert", "seq": 2,
         "data": {"id": "2", "amount": "NaN-garbage", "created": "2024-01-02 03:04:05"},
         "pks": {"id": "2"}},
        # zero-date is the reference's documented NULL coercion → CLEAN
        {"database": "app", "table": "t", "op": "insert", "seq": 3,
         "data": {"id": "3", "amount": "1.00", "created": "0000-00-00 00:00:00"},
         "pks": {"id": "3"}},
        # corrupt timestamp → dead
        {"database": "app", "table": "t", "op": "insert", "seq": 4,
         "data": {"id": "4", "amount": "2.00", "created": "not-a-time"},
         "pks": {"id": "4"}},
        # NULL value (column absent) is not corruption → clean
        {"database": "app", "table": "t", "op": "insert", "seq": 5,
         "data": {"id": "5"}, "pks": {"id": "5"}},
    ]
    clean, dead = split_dead_letter(memory_changes(spark, rows), tdef)
    clean_ids = {r["data"]["id"] for r in clean.collect()}
    dead_rows = dead.collect()
    assert clean_ids == {"1", "3", "5"}
    # the quarantined rows keep their FULL envelope for replay
    assert {r["data"]["id"] for r in dead_rows} == {"2", "4"}
    assert all(r["data"]["amount"] is not None for r in dead_rows)
    # clean side types without error under strict projection
    typed = tdef.typed_projection(clean)
    got = {r["id"]: r for r in typed.collect()}
    assert str(got[1]["amount"]) == "10.50"
    assert got[3]["created"] is None  # zero-date → NULL, not dead
