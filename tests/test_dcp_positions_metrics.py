import time

from pyspark.sql import functions as F

from gravity_spark.core.positions import (
    PositionStore,
    batch_scan_position,
    stream_position,
)
from gravity_spark.metrics import observe_input, observe_output
from gravity_spark.operators.dcp import check, mismatching_segments, row_diff


def _pair(spark):
    source = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string"
    )
    # target: missing id=5, extra id=200, corrupted id=42
    target = (
        source.filter(F.col("id") != 5)
        .union(spark.createDataFrame([(200, "v200")], "id long, v string"))
        .withColumn("v", F.when(F.col("id") == 42, F.lit("CORRUPT")).otherwise(F.col("v")))
    )
    return source, target


def test_dcp_row_diff(spark):
    source, target = _pair(spark)
    diff = {r["id"]: r["status"] for r in row_diff(source, target, ["id"], ["v"]).collect()}
    assert diff == {5: "missing_in_target", 200: "missing_in_source", 42: "value_mismatch"}


def test_dcp_segment_short_circuit(spark):
    source, target = _pair(spark)
    seg = F.floor(F.col("id") / 10)
    bad = mismatching_segments(source, target, ["id"], seg, ["v"])
    bad_segments = {r["segment"] for r in bad.collect()}
    assert bad_segments == {0, 4, 20}  # ids 5, 42, 200
    summary, diff = check(source, target, ["id"], seg, ["v"])
    assert {r["id"] for r in diff.collect()} == {5, 42, 200}


def test_position_store_flush(tmp_path):
    p = str(tmp_path / "pos.json")
    store = PositionStore(p, flush_interval_s=999)
    store.put("pipe1", batch_scan_position("t1", "id", [0, 1], 4, current_key=123))
    assert store.get("pipe1")["done"] is False
    store.put("pipe1", stream_position("s0", {"file": "binlog.1", "pos": 4}), flush=True)

    store2 = PositionStore(p)
    assert store2.get("pipe1")["stage"] == "stream"
    assert store2.get("pipe1")["offset"]["pos"] == 4


def test_observe_metrics(spark):
    from gravity_spark.core.envelope import memory_changes

    df = memory_changes(spark, [
        {"database": "d", "table": "t", "op": "insert", "data": {"id": 1},
         "pks": {"id": 1}, "seq": 1},
        {"database": "d", "table": "t", "op": "delete", "data": {"id": 2},
         "pks": {"id": 2}, "seq": 2},
    ])
    observed, obs = observe_input(df)
    out, obs_out = observe_output(observed)
    out.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == 2 and m["n_insert"] == 1 and m["n_delete"] == 1
    assert obs_out.get["n_rows"] == 2


def test_progress_snapshot_and_listener(spark, tmp_path):
    import json as _json
    import time

    from gravity_spark.metrics import progress_snapshot
    from gravity_spark.streaming.pipeline import watermark_lag_listener

    listener = watermark_lag_listener(spark, unhealthy_after_s=60)
    try:
        src = tmp_path / "m"
        src.mkdir()
        (src / "p0.json").write_text(_json.dumps({"a": 1}) + "\n")
        stream = spark.readStream.schema("a long").format("json").load(str(src))
        q = (stream.writeStream.format("memory").queryName("mtest")
             .outputMode("append").start())
        q.processAllAvailable()
        # listener saw progress → healthy
        deadline = time.time() + 10
        while time.time() < deadline and not listener.health():
            time.sleep(0.2)
        health = listener.health()
        assert health and all(health.values())
        snap = progress_snapshot(q)
        assert snap["num_input_rows"] >= 0 and "duration_ms" in snap
        q.stop()
    finally:
        spark.streams.removeListener(listener)


def test_db_position_store_roundtrip(tmp_path):
    """Durable DB-API position repo (_gravity.gravity_positions shape,
    pkg/position_repos/mysql_repo.go:37-60): survives process restart,
    upserts by pipeline name, validates stages, deletes."""
    import sqlite3

    from gravity_spark.core.positions import DbPositionStore

    db = str(tmp_path / "gravity.db")
    factory = lambda: sqlite3.connect(db)

    s1 = DbPositionStore(factory, flush_interval_s=999)
    s1.put("pipe1", batch_scan_position("t1", "id", [0, 1], 4, current_key=123))
    s1.put("pipe1", batch_scan_position("t1", "id", [0, 1, 2], 4, current_key=200),
           flush=True)
    s1.put("pipe2", stream_position("s0", {"file": "binlog.000001", "pos": 4}),
           flush=True)

    # "restart": a fresh store on the same database resumes the positions
    s2 = DbPositionStore(factory)
    p = s2.get("pipe1")
    assert p["stage"] == "batch" and p["done_chunks"] == [0, 1, 2]
    assert p["current_key"] == 200 and not p["done"]
    assert s2.get("pipe2")["offset"] == {"file": "binlog.000001", "pos": 4}

    # the backing table has the reference's shape
    con = factory()
    rows = con.execute(
        "SELECT name, stage FROM gravity_positions ORDER BY name"
    ).fetchall()
    con.close()
    assert rows == [("pipe1", "batch"), ("pipe2", "stream")]

    s2.delete("pipe1")
    s3 = DbPositionStore(factory)
    assert s3.get("pipe1") is None and s3.get("pipe2") is not None

    import pytest

    with pytest.raises(ValueError):
        s3.put("pipe3", {"stage": "bogus"})


def test_db_position_store_resumes_chunked_scan(spark, tmp_path, sf_dir):
    """Restart mid-snapshot: chunks recorded as done are skipped on
    resume, and the union of both runs covers the table exactly once."""
    import sqlite3

    from gravity_spark.core.positions import DbPositionStore
    from gravity_spark.sources.batch import chunked_scan

    db = str(tmp_path / "scan.db")
    factory = lambda: sqlite3.connect(db)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    chunks = chunked_scan(orders, "o_orderkey", chunk_size=500)
    n_chunks = chunks.select("chunk_id").distinct().count()
    assert n_chunks > 2

    # run 1 processes chunks 0..1, records progress, "crashes"
    s1 = DbPositionStore(factory, flush_interval_s=999)
    done = [0, 1]
    run1 = chunks.filter(chunks.chunk_id.isin(done))
    n1 = run1.count()
    s1.put("snap", batch_scan_position("orders", "o_orderkey", done, n_chunks),
           flush=True)

    # run 2 resumes from the store and takes only the remainder
    s2 = DbPositionStore(factory)
    resume = s2.get("snap")
    assert resume["done_chunks"] == [0, 1] and not resume["done"]
    run2 = chunks.filter(~chunks.chunk_id.isin(resume["done_chunks"]))
    n2 = run2.count()
    assert n1 + n2 == orders.count()
    s2.put("snap", batch_scan_position(
        "orders", "o_orderkey", list(range(n_chunks)), n_chunks), flush=True)
    assert DbPositionStore(factory).get("snap")["done"]


# ---------------------------------------------------------------------
# all three position-repo backends (pkg/position_repos/: mysql / mongo /
# mem ↔ DbPositionStore / DocPositionStore / PositionStore) satisfy the
# same recovery contract
# ---------------------------------------------------------------------

import pytest  # noqa: E402


def _store_factory(kind, tmp_path):
    if kind == "file":
        p = str(tmp_path / "pos.json")
        return lambda **kw: PositionStore(p, **kw)
    if kind == "db":
        import sqlite3

        from gravity_spark.core.positions import DbPositionStore

        db = str(tmp_path / "gravity.db")
        return lambda **kw: DbPositionStore(lambda: sqlite3.connect(db), **kw)
    if kind == "doc":
        from gravity_spark.core.positions import DocPositionStore

        return lambda **kw: DocPositionStore(str(tmp_path), **kw)
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["file", "db", "doc"])
def test_position_recovery_all_backends(tmp_path, kind):
    make = _store_factory(kind, tmp_path)
    s1 = make(flush_interval_s=999)
    s1.put("pipe1", batch_scan_position("t1", "id", [0, 1], 4, current_key=123),
           flush=True)
    s1.put("pipe2", stream_position("s0", {"file": "binlog.000001", "pos": 4}),
           flush=True)

    # "restart": a fresh store resumes the positions
    s2 = make()
    p = s2.get("pipe1")
    assert p["stage"] == "batch" and p["done_chunks"] == [0, 1]
    assert s2.get("pipe2")["offset"] == {"file": "binlog.000001", "pos": 4}

    # progress then crash-before-flush loses only the unflushed delta
    s2.put("pipe1", batch_scan_position("t1", "id", [0, 1, 2, 3], 4), flush=True)
    s3 = make()
    assert s3.get("pipe1")["done"]

    s3.delete("pipe1")
    s4 = make()
    assert s4.get("pipe1") is None and s4.get("pipe2") is not None


@pytest.mark.parametrize("kind", ["file", "db", "doc"])
def test_chunked_scan_resume_all_backends(spark, tmp_path, sf_dir, kind):
    """Restart mid-snapshot on every backend: chunks recorded as done
    are skipped on resume; both runs cover the table exactly once."""
    from gravity_spark.sources.batch import chunked_scan

    make = _store_factory(kind, tmp_path)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    chunks = chunked_scan(orders, "o_orderkey", chunk_size=500)
    n_chunks = chunks.select("chunk_id").distinct().count()

    s1 = make(flush_interval_s=999)
    done = [0, 1]
    n1 = chunks.filter(chunks.chunk_id.isin(done)).count()
    s1.put("snap", batch_scan_position("orders", "o_orderkey", done, n_chunks),
           flush=True)

    s2 = make()
    resume = s2.get("snap")
    assert resume["done_chunks"] == [0, 1] and not resume["done"]
    n2 = chunks.filter(~chunks.chunk_id.isin(resume["done_chunks"])).count()
    assert n1 + n2 == orders.count()


def test_doc_store_contract_and_old_format(tmp_path):
    """Mongo-repo document semantics: version/value/last_update fields,
    empty-value and bad-stage rejection, and backward-compat decode of
    the deprecated version-less PositionEntity format
    (mongo_repo.go:139-158)."""
    import json as _json
    import os as _os

    from gravity_spark.core.positions import DocPositionStore

    s = DocPositionStore(str(tmp_path), flush_interval_s=999)
    s.put("p1", stream_position("s0", {"pos": 9}), flush=True)
    doc_path = _os.path.join(str(tmp_path), "gravity_positions", "p1.json")
    with open(doc_path) as f:
        doc = _json.load(f)
    assert doc["version"] == "1.0" and doc["name"] == "p1"
    assert doc["stage"] == "stream"
    assert _json.loads(doc["value"])["offset"] == {"pos": 9}
    assert "last_update" in doc

    with pytest.raises(ValueError):
        s.put("bad", {"stage": "bogus", "x": 1})
    with pytest.raises(ValueError):
        s.put("empty", {"stage": "stream"})  # mongo_repo.go:182-185

    # deprecated format: no version, inline start/current position
    old = {
        "name": "legacy",
        "stage": "stream",
        "start_position": {"ts": 1},
        "current_position": {"ts": 7},
        "last_update": "2019-01-01T00:00:00Z",
    }
    with open(_os.path.join(str(tmp_path), "gravity_positions", "legacy.json"), "w") as f:
        _json.dump(old, f)
    s2 = DocPositionStore(str(tmp_path))
    got = s2.get("legacy")
    assert got["stage"] == "stream"
    assert got["current_position"] == {"ts": 7}
    assert got["start_position"] == {"ts": 1}
