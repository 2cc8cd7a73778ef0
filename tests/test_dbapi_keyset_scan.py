"""Real-database chunked-scan e2e: seed sqlite, keyset-scan via the
position ledger, KILL mid-scan, resume from the persisted position —
the reference's mysql-batch scanner contract
(pkg/inputs/mysqlbatch/mysql_table_scanner.go:166-331,
position_value.go:27-108). The killed batch is REDELIVERED
(at-least-once); the Spark merge sink's LWW idempotency absorbs it, so
the final table is exact."""

import sqlite3

from gravity_spark.core.positions import DbPositionStore
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget
from gravity_spark.sources.batch import dbapi_keyset_scan

N_ROWS = 95
BATCH = 10


def _seed(db: str) -> None:
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE src (id INTEGER PRIMARY KEY, v TEXT)")
        conn.executemany(
            "INSERT INTO src VALUES (?, ?)",
            [(i, f"v{i}") for i in range(1, N_ROWS + 1)],
        )


def test_keyset_scan_kill_and_resume(spark, tmp_path):
    db = str(tmp_path / "src.db")
    posdb = str(tmp_path / "pos.db")
    _seed(db)
    store = DbPositionStore(lambda: sqlite3.connect(posdb))
    target = ParquetMergeTarget(
        spark, str(tmp_path / "tgt"), ["id"], "id long, v string"
    )

    def apply(rows, epoch):
        batch = spark.createDataFrame(
            [(r[0], r[1], "insert", r[0]) for r in rows],
            "id long, v string, op string, seq long",
        )
        target.apply_batch(batch, epoch)

    # first scan: killed after 4 batches (max_batches simulates the kill)
    seen_first = 0
    for epoch, rows in enumerate(
        dbapi_keyset_scan(
            lambda: sqlite3.connect(db), "src", ["id", "v"], "id",
            batch_size=BATCH, position_store=store,
            pipeline_name="p1", max_batches=4,
        )
    ):
        apply(rows, epoch)
        seen_first += len(rows)
    assert seen_first == 4 * BATCH

    # ledger: mid-scan, not done, current strictly inside the keyspace
    state = store.get("p1")
    assert state["done"] is False
    assert state["stage"] == "batch" and state["scan_column"] == "id"
    assert 0 < state["current_key"] < N_ROWS

    # resume with a FRESH store handle (restart = new process):
    # continues strictly after current_key, finishes, marks done
    store2 = DbPositionStore(lambda: sqlite3.connect(posdb))
    resumed = list(
        dbapi_keyset_scan(
            lambda: sqlite3.connect(db), "src", ["id", "v"], "id",
            batch_size=BATCH, position_store=store2, pipeline_name="p1",
        )
    )
    first_resumed_key = resumed[0][0][0]
    assert first_resumed_key == state["current_key"] + 1
    for epoch, rows in enumerate(resumed):
        apply(rows, 100 + epoch)
    done = store2.get("p1")
    assert done["done"] is True and done["current_key"] == N_ROWS

    # the merged table holds every row exactly once
    got = {(r["id"], r["v"]) for r in target.read().collect()}
    assert got == {(i, f"v{i}") for i in range(1, N_ROWS + 1)}

    # a third scan against a done ledger yields nothing (no rescan)
    again = list(
        dbapi_keyset_scan(
            lambda: sqlite3.connect(db), "src", ["id", "v"], "id",
            batch_size=BATCH, position_store=store2, pipeline_name="p1",
        )
    )
    assert again == []


def test_keyset_scan_redelivers_unacked_batch(spark, tmp_path):
    """Kill BETWEEN yield and position flush (consumer abandons the
    generator mid-batch): the batch whose consumption never completed
    is redelivered on resume — at-least-once, never at-most-once."""
    db = str(tmp_path / "src2.db")
    posdb = str(tmp_path / "pos2.db")
    _seed(db)
    store = DbPositionStore(lambda: sqlite3.connect(posdb))

    gen = dbapi_keyset_scan(
        lambda: sqlite3.connect(db), "src", ["id", "v"], "id",
        batch_size=BATCH, position_store=store, pipeline_name="p2",
    )
    b1 = next(gen)
    b2 = next(gen)  # resuming for b2 flushed b1's position
    assert b1[0][0] == 1 and b2[0][0] == BATCH + 1
    gen.close()  # killed while b2 is in flight — its position never lands

    state = store.get("p2")
    assert state["current_key"] == BATCH  # only b1 acked

    resumed = next(
        dbapi_keyset_scan(
            lambda: sqlite3.connect(db), "src", ["id", "v"], "id",
            batch_size=BATCH, position_store=store, pipeline_name="p2",
        )
    )
    assert resumed == b2  # the in-flight batch comes back


def test_keyset_scan_no_store_full_pass(tmp_path):
    db = str(tmp_path / "src3.db")
    _seed(db)
    batches = list(
        dbapi_keyset_scan(
            lambda: sqlite3.connect(db), "src", ["id", "v"], "id",
            batch_size=BATCH,
        )
    )
    assert sum(len(b) for b in batches) == N_ROWS
    assert len(batches) == 10  # 9 full + 1 short tail
    flat = [r[0] for b in batches for r in b]
    assert flat == sorted(flat)  # keyset order
