from pyspark.sql import functions as F

from gravity_spark.operators.collapse import collapse_last_write_wins
from gravity_spark.operators.upsert import (
    ENGINE_INSERT_IGNORE,
    ENGINE_REPLACE,
    add_missing_columns,
    merge_changes,
    merge_with_conflict_detect,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, bal double"
    )


def _changes(spark):
    # id=2 updated twice (last wins), id=3 deleted, id=4 inserted then updated
    return spark.createDataFrame(
        [
            (2, "b1", 21.0, "update", 1),
            (2, "b2", 22.0, "update", 4),
            (3, "c", 30.0, "delete", 2),
            (4, "d", 40.0, "insert", 3),
            (4, "d2", 41.0, "update", 5),
        ],
        "id long, name string, bal double, op string, seq long",
    )


def test_collapse_lww(spark):
    out = collapse_last_write_wins(_changes(spark), key_cols=["id"]).collect()
    by_id = {r["id"]: r for r in out}
    assert len(out) == 3
    assert by_id[2]["name"] == "b2" and by_id[2]["seq"] == 4
    assert by_id[4]["name"] == "d2"


def test_merge_replace(spark):
    result = merge_changes(_target(spark), _changes(spark), ["id"], ENGINE_REPLACE)
    rows = {r["id"]: r for r in result.collect()}
    assert set(rows) == {1, 2, 4}  # 3 deleted
    assert rows[1]["name"] == "a"  # untouched
    assert rows[2]["name"] == "b2" and rows[2]["bal"] == 22.0
    assert rows[4]["name"] == "d2"


def test_merge_idempotent(spark):
    once = merge_changes(_target(spark), _changes(spark), ["id"], ENGINE_REPLACE)
    twice = merge_changes(once, _changes(spark), ["id"], ENGINE_REPLACE)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_merge_insert_ignore(spark):
    result = merge_changes(_target(spark), _changes(spark), ["id"], ENGINE_INSERT_IGNORE)
    rows = {r["id"]: r for r in result.collect()}
    assert set(rows) == {1, 2, 4}  # 3 deleted (sequential DELETE applies)
    assert rows[2]["name"] == "b"  # first writer (existing) wins over updates
    assert rows[4]["name"] == "d"  # fresh key: FIRST change lands


def test_merge_insert_ignore_delete_then_reinsert(spark):
    target = _target(spark)
    changes = spark.createDataFrame(
        [(1, "x1", 1.0, "update", 1),   # ignored: key exists
         (1, None, None, "delete", 2),  # removes target row
         (1, "x2", 2.0, "insert", 3),   # re-inserts
         (1, "x3", 3.0, "update", 4)],  # ignored: key exists again
        "id long, name string, bal double, op string, seq long",
    )
    rows = {r["id"]: r for r in merge_changes(target, changes, ["id"], ENGINE_INSERT_IGNORE).collect()}
    assert rows[1]["name"] == "x2"


def test_conflict_detect(spark):
    target = _target(spark)
    changes = spark.createDataFrame(
        [
            # clean update: old image matches target
            (1, "a1", 11.0, "a", 10.0, "update", 1),
            # conflicting update: old image stale
            (2, "b1", 21.0, "b-STALE", 20.0, "update", 2),
        ],
        "id long, name string, bal double, old_name string, old_bal double, op string, seq long",
    )
    merged, conflicts = merge_with_conflict_detect(target, changes, ["id"])
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["name"] == "a1"
    assert rows[2]["name"] == "b"  # conflict NOT applied
    assert [r["id"] for r in conflicts.collect()] == [2]


def test_add_missing_columns(spark):
    target = _target(spark)
    changes = spark.createDataFrame([(5,)], "id long")
    out = add_missing_columns(changes, target, {"name": "default_name"})
    r = out.collect()[0]
    assert r["name"] == "default_name" and r["bal"] is None


def test_manual_sql_engine(spark):
    from gravity_spark.operators.upsert import merge_with_manual_sql

    target = _target(spark)
    changes = _changes(spark)
    # user SQL: replace-engine semantics written by hand
    sql = """
        SELECT t.id, t.name, t.bal FROM target t
        LEFT ANTI JOIN changes c ON t.id = c.id
        UNION ALL
        SELECT c.id, c.name, c.bal FROM changes c WHERE c.op <> 'delete'
    """
    rows = {r["id"]: r for r in merge_with_manual_sql(target, changes, sql, ["id"]).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2]["name"] == "b2"


def test_collapse_native_order_types(spark):
    """The LWW ordering key keeps the order column's NATIVE type: string
    and timestamp order columns must order correctly (a long-cast would
    NULL-out strings — arbitrary winners — and truncate timestamps into
    false ties), and NULL order values must always lose to non-NULL ones
    regardless of how negative the non-NULL value is."""
    strings = spark.createDataFrame(
        [(1, "x", "2024-01-02"), (1, "y", "2024-01-10"), (1, "z", "2024-01-05")],
        "id long, v string, ord string",
    )
    out = collapse_last_write_wins(strings, key_cols=["id"], order_col="ord").collect()
    assert len(out) == 1 and out[0]["v"] == "y"

    ts = spark.createDataFrame(
        [(1, "early", "2024-01-01 00:00:00.100"), (1, "late", "2024-01-01 00:00:00.900")],
        "id long, v string, ord string",
    ).withColumn("ord", F.col("ord").cast("timestamp"))
    out = collapse_last_write_wins(ts, key_cols=["id"], order_col="ord").collect()
    assert out[0]["v"] == "late"

    # NULL loses even to a value below the old long sentinel; all-NULL
    # keys still yield a winner
    nulls = spark.createDataFrame(
        [(1, "null-seq", None), (1, "real", -(1 << 62) - 5), (2, "only-null", None)],
        "id long, v string, ord long",
    )
    rows = {r["id"]: r for r in collapse_last_write_wins(nulls, key_cols=["id"], order_col="ord").collect()}
    assert rows[1]["v"] == "real" and rows[2]["v"] == "only-null"


def test_merge_target_with_op_named_column(spark):
    """A target that itself declares a column named `op` (alongside the
    envelope's op marker) must collapse without a duplicate-attribute
    ambiguity in merge_collapsed's delete filter."""
    from gravity_spark.operators.upsert import collapse_changes, merge_collapsed

    target = spark.createDataFrame([(1, "keep")], "id long, op string")
    changes = spark.createDataFrame(
        [(2, "insert", 1), (1, "delete", 2)],
        "id long, op string, seq long",
    )
    last = collapse_changes(["id", "op"], changes, ["id"], op_col="op")
    assert last.columns.count("op") == 1
    # with op_col == a declared data column, the marker IS the data
    # column — the delete filter reads it once, unambiguously
    rows = {r["id"]: r for r in merge_collapsed(target, last, ["id"], op_col="op").collect()}
    assert set(rows) == {2} and rows[2]["op"] == "insert"


def test_merge_target_rejects_unknown_engine(spark, tmp_path):
    import pytest

    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget

    with pytest.raises(ValueError, match="unknown merge engine"):
        ParquetMergeTarget(spark, str(tmp_path / "t"), ["id"], "id long", engine="no-such-engine")


def test_collapse_first_write_wins_ascending(spark):
    """ascending=True picks the LOWEST order value per key without
    negating the column, so string/timestamp order columns work, and
    NULL still always loses (all-NULL keys still yield a winner)."""
    strings = spark.createDataFrame(
        [(1, "x", "2024-01-02"), (1, "y", "2024-01-10"), (1, "z", "2024-01-05")],
        "id long, v string, ord string",
    )
    out = collapse_last_write_wins(
        strings, key_cols=["id"], order_col="ord", ascending=True
    ).collect()
    assert len(out) == 1 and out[0]["v"] == "x"

    nulls = spark.createDataFrame(
        [(1, "null-seq", None), (1, "real", 7), (2, "only-null", None)],
        "id long, v string, ord long",
    )
    rows = {
        r["id"]: r
        for r in collapse_last_write_wins(
            nulls, key_cols=["id"], order_col="ord", ascending=True
        ).collect()
    }
    assert rows[1]["v"] == "real" and rows[2]["v"] == "only-null"


def test_merge_insert_ignore_typed_order_column(spark):
    """INSERT IGNORE with a timestamp order column: the first-wins
    collapse must not negate the order column (analysis error pre-fix);
    first non-delete change after the last delete wins."""
    target = spark.createDataFrame([(1, "t")], "id long, name string")
    changes = spark.createDataFrame(
        [
            (1, None, "delete", "2024-01-01 00:00:02"),
            (1, "after-del-early", "insert", "2024-01-01 00:00:03"),
            (1, "after-del-late", "update", "2024-01-01 00:00:04"),
            (2, "fresh-late", "update", "2024-01-01 00:00:09"),
            (2, "fresh-early", "insert", "2024-01-01 00:00:08"),
        ],
        "id long, name string, op string, seq string",
    ).withColumn("seq", F.col("seq").cast("timestamp"))
    rows = {
        r["id"]: r
        for r in merge_changes(target, changes, ["id"], ENGINE_INSERT_IGNORE).collect()
    }
    assert rows[1]["name"] == "after-del-early"
    assert rows[2]["name"] == "fresh-early"


def test_merge_insert_ignore_null_order_rules(spark):
    """NULL order values follow the collapse path's NULL-always-loses
    total order: a NULL-seq change survives only when its key saw NO
    delete at all; a NULL-seq delete (the minimum) kills only other
    NULL-seq changes, never non-NULL-seq ones."""
    target = spark.createDataFrame([(9, "t")], "id long, name string")
    changes = spark.createDataFrame(
        [
            # key 1: no delete — NULL-seq insert survives (first-wins
            # among {NULL, 5} picks the non-NULL per NULL-loses)
            (1, "null-seq", "insert", None),
            (1, "seq5", "update", 5),
            # key 2: delete at seq 3 — the NULL-seq insert is BEFORE it
            # (NULL = minimum), only seq 4 survives
            (2, "null-seq", "insert", None),
            (2, None, "delete", 3),
            (2, "seq4", "insert", 4),
            # key 3: NULL-seq delete — kills the NULL-seq insert (tie
            # loses to the delete) but not the seq-1 insert
            (3, "null-seq", "insert", None),
            (3, None, "delete", None),
            (3, "seq1", "insert", 1),
            # key 4: only a NULL-seq insert, no delete — survives
            (4, "only-null", "insert", None),
        ],
        "id long, name string, op string, seq long",
    )
    rows = {
        r["id"]: r
        for r in merge_changes(target, changes, ["id"], ENGINE_INSERT_IGNORE).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 9}
    assert rows[1]["name"] == "seq5"
    assert rows[2]["name"] == "seq4"
    assert rows[3]["name"] == "seq1"
    assert rows[4]["name"] == "only-null"
