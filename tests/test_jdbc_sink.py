"""DB-API sink tests: SQL generation against the reference's statement
shapes; end-to-end write path against sqlite (REPLACE INTO is valid
sqlite, so the real foreachPartition path runs)."""

import os
import sqlite3

from gravity_spark.sinks.jdbc import (
    build_delete_sql,
    build_insert_ignore_sql,
    build_on_dup_sql,
    build_replace_sql,
    split_at_deletes,
    write_batch_dbapi,
)


def test_sql_generation():
    assert build_replace_sql("t", ["a", "b"], 2) == (
        "REPLACE INTO t (a, b) VALUES (?, ?), (?, ?)"
    )
    assert build_insert_ignore_sql("t", ["a"], 1) == (
        "INSERT IGNORE INTO t (a) VALUES (?)"
    )
    assert build_on_dup_sql("t", ["id", "v"], ["id"]) == (
        "INSERT INTO t (id, v) VALUES (?, ?) ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )
    assert build_delete_sql("t", ["id", "sub"]) == (
        "DELETE FROM t WHERE id = ? AND sub = ?"
    )


def test_split_at_deletes():
    rows = [
        (1, "a", "insert"), (2, "b", "update"),
        (3, None, "delete"), (4, None, "delete"),
        (5, "c", "insert"),
    ]
    runs = split_at_deletes(rows, 2)
    assert [len(r) for r in runs] == [2, 2, 1]
    assert runs[1][0][2] == "delete"


def test_write_batch_to_sqlite(spark, tmp_path):
    db = str(tmp_path / "target.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
        conn.execute("INSERT INTO t VALUES (1, 'old'), (2, 'stay')")

    changes = spark.createDataFrame(
        [
            (1, "new", "update", 1),   # overwrites id=1
            (3, "c", "insert", 2),     # new row
            (2, None, "delete", 3),    # removes id=2
            (2, "back", "insert", 4),  # reinserts after the delete (ordering!)
        ],
        "id long, v string, op string, seq long",
    ).coalesce(1)  # one partition → strict order for the assertion

    write_batch_dbapi(
        changes, lambda: sqlite3.connect(db), "t", ["id"], engine="replace"
    )
    with sqlite3.connect(db) as conn:
        rows = dict(conn.execute("SELECT id, v FROM t ORDER BY id").fetchall())
    assert rows == {1: "new", 2: "back", 3: "c"}
