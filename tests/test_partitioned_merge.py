import os

from gravity_spark.sinks.parquet_merge import ParquetMergeTarget


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, dt string, v string, op string, seq long")


def test_partition_scoped_rewrite(spark, tmp_path):
    t = ParquetMergeTarget(
        spark, str(tmp_path / "tgt"), ["id"],
        "id long, dt string, v string", partition_col="dt",
    )
    t.apply_batch(_batch(spark, [
        (1, "2024-01-01", "a", "insert", 1),
        (2, "2024-01-01", "b", "insert", 2),
        (3, "2024-01-02", "c", "insert", 3),
    ]), epoch_id=0)
    assert t.partition_version("2024-01-01") == 1
    assert t.partition_version("2024-01-02") == 1

    # second batch touches only 2024-01-01
    t.apply_batch(_batch(spark, [
        (1, "2024-01-01", "a2", "update", 4),
        (2, "2024-01-01", "b", "delete", 5),
    ]), epoch_id=1)
    # untouched partition keeps its version (no rewrite)
    assert t.partition_version("2024-01-01") == 2
    assert t.partition_version("2024-01-02") == 1

    state = {(r["id"]): (r["dt"], r["v"]) for r in t.read().collect()}
    assert state == {1: ("2024-01-01", "a2"), 3: ("2024-01-02", "c")}


def test_partitioned_idempotent_redelivery(spark, tmp_path):
    t = ParquetMergeTarget(
        spark, str(tmp_path / "tgt2"), ["id"],
        "id long, dt string, v string", partition_col="dt",
    )
    batch = _batch(spark, [(1, "d1", "x", "insert", 1)])
    t.apply_batch(batch, 0)
    t.apply_batch(batch, 0)  # redelivered
    assert [ (r["id"], r["v"]) for r in t.read().collect() ] == [(1, "x")]


def test_partitioned_streaming_pipeline(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from gravity_spark.streaming.pipeline import file_cdc_source, run_stream

    src = tmp_path / "cdc"
    src.mkdir()
    with open(src / "p0.json", "w") as f:
        for r in [
            {"type": "dml", "database": "a", "table": "t", "op": "insert",
             "data": {"id": "1", "dt": "d1", "v": "a"}, "pks": {"id": "1"},
             "stream_key": "s", "seq": 1},
            {"type": "dml", "database": "a", "table": "t", "op": "insert",
             "data": {"id": "2", "dt": "d2", "v": "b"}, "pks": {"id": "2"},
             "stream_key": "s", "seq": 2},
        ]:
            f.write(_json.dumps(r) + "\n")

    t = ParquetMergeTarget(
        spark, str(tmp_path / "tgt3"), ["id"],
        "id long, dt string, v string", partition_col="dt",
    )

    def typed(df):
        return df.select(
            F.col("data").getItem("id").cast("long").alias("id"),
            F.col("data").getItem("dt").alias("dt"),
            F.col("data").getItem("v").alias("v"),
            "op", "seq",
        )

    q = run_stream(file_cdc_source(spark, str(src)), t, typed, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()
    assert {r["id"]: r["dt"] for r in t.read().collect()} == {1: "d1", 2: "d2"}


def test_partition_value_path_encoding(spark, tmp_path):
    """Partition values whose Python str() differs from Spark's
    partition-path encoding must survive the staging rename: Spark
    URL-escapes specials (space → %20, colon → %3A) and renders NULL as
    __HIVE_DEFAULT_PARTITION__, so a str(val)-keyed lookup used to see
    'no staged dir' and silently drop the live partition."""
    t = ParquetMergeTarget(
        spark, str(tmp_path / "enc"), ["id"],
        "id long, dt string, v string", partition_col="dt",
    )
    t.apply_batch(_batch(spark, [
        (1, "a b:c", "x", "insert", 1),
        (2, "plain", "y", "insert", 2),
        (3, None, "z", "insert", 3),
    ]), epoch_id=0)
    state = {r["id"]: (r["dt"], r["v"]) for r in t.read().collect()}
    assert state == {1: ("a b:c", "x"), 2: ("plain", "y"), 3: (None, "z")}
    assert t.partition_version("a b:c") == 1

    # update inside the escaped partition bumps only its version
    t.apply_batch(_batch(spark, [(1, "a b:c", "x2", "update", 4)]), epoch_id=1)
    assert t.partition_version("a b:c") == 2
    assert t.partition_version("plain") == 1
    state = {r["id"]: r["v"] for r in t.read().collect()}
    assert state == {1: "x2", 2: "y", 3: "z"}

    # genuine full delete of the escaped partition is still a delete
    t.apply_batch(_batch(spark, [(1, "a b:c", None, "delete", 5)]), epoch_id=2)
    state = {r["id"]: r["v"] for r in t.read().collect()}
    assert state == {2: "y", 3: "z"}


def test_partition_value_empty_string_rejected(spark, tmp_path):
    """'' and NULL share one __HIVE_DEFAULT_PARTITION__ path child, so
    they cannot be staged distinctly — the sink must reject '' loudly at
    apply time rather than misclassify the live partition as deleted."""
    import pytest

    t = ParquetMergeTarget(
        spark, str(tmp_path / "empt"), ["id"],
        "id long, dt string, v string", partition_col="dt",
    )
    with pytest.raises(ValueError, match="empty-string.*partition|sentinel"):
        t.apply_batch(_batch(spark, [
            (1, "", "x", "insert", 1),
            (2, None, "y", "insert", 2),
        ]), epoch_id=0)


def test_partition_value_bool_encoding(spark, tmp_path):
    """Boolean partition column: Spark renders 'true'/'false' in the
    path while Python str() gives 'True'/'False'."""
    t = ParquetMergeTarget(
        spark, str(tmp_path / "encb"), ["id"],
        "id long, flag boolean, v string", partition_col="flag",
    )
    t.apply_batch(spark.createDataFrame(
        [(1, True, "t", "insert", 1), (2, False, "f", "insert", 2)],
        "id long, flag boolean, v string, op string, seq long"), 0)
    state = {r["id"]: (r["flag"], r["v"]) for r in t.read().collect()}
    assert state == {1: (True, "t"), 2: (False, "f")}


def test_vacuum_keeps_current(spark, tmp_path):
    t = ParquetMergeTarget(spark, str(tmp_path / "tv"), ["id"], "id long, v string")
    for i in range(4):
        t.apply_batch(
            spark.createDataFrame([(1, f"v{i}", "update", i)],
                                  "id long, v string, op string, seq long"), i)
    assert t._current_version() == 4
    removed = t.vacuum(keep_last=2)
    assert removed == 2  # v1, v2 removed; v3, v4 kept
    assert [r["v"] for r in t.read().collect()] == ["v3"]

    # partitioned variant
    tp = ParquetMergeTarget(spark, str(tmp_path / "tp"), ["id"],
                            "id long, dt string, v string", partition_col="dt")
    for i in range(3):
        tp.apply_batch(
            spark.createDataFrame([(1, "d1", f"x{i}", "update", i)],
                                  "id long, dt string, v string, op string, seq long"), i)
    removed = tp.vacuum(keep_last=1)
    assert removed == 2
    assert [r["v"] for r in tp.read().collect()] == ["x2"]


def test_time_travel_read_version(spark, tmp_path):
    import pytest

    t = ParquetMergeTarget(spark, str(tmp_path / "tt"), ["id"], "id long, v string")
    for i in range(3):
        t.apply_batch(
            spark.createDataFrame([(1, f"v{i}", "update", i)],
                                  "id long, v string, op string, seq long"), i)
    # VERSION AS OF: each immutable version dir reflects state after batch i
    assert [r["v"] for r in t.read_version(1).collect()] == ["v0"]
    assert [r["v"] for r in t.read_version(2).collect()] == ["v1"]
    assert [r["v"] for r in t.read().collect()] == ["v2"]
    t.vacuum(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.read_version(1)


def test_aggregate_rollup_epoch_guard(spark, tmp_path):
    from gravity_spark.sinks.parquet_merge import AggregateRollupTarget

    t = AggregateRollupTarget(
        spark, str(tmp_path / "agg"), ["k"], ["n"], "k string, n long"
    )
    batch = spark.createDataFrame([("a", 2), ("b", 1)], "k string, n long")
    t.apply_batch(batch, epoch_id=0)
    t.apply_batch(batch, epoch_id=0)  # redelivery: must be a no-op
    assert {r["k"]: r["n"] for r in t.read().collect()} == {"a": 2, "b": 1}
    t.apply_batch(batch, epoch_id=1)  # new epoch: accumulates
    assert {r["k"]: r["n"] for r in t.read().collect()} == {"a": 4, "b": 2}


def _no_coalesce(spark):
    # AQE normally right-sizes tiny writes to one file; disable it while
    # building the fragmented state a parallel merge produces at scale
    import contextlib

    @contextlib.contextmanager
    def ctx():
        key = "spark.sql.adaptive.coalescePartitions.enabled"
        old = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, old)

    return ctx()


def test_compact_bin_packs_small_files(spark, tmp_path):
    t = ParquetMergeTarget(spark, str(tmp_path / "tc"), ["id"], "id long, v string")
    rows = [(i, f"v{i}", "insert", i) for i in range(100)]
    with _no_coalesce(spark):
        t.apply_batch(
            spark.createDataFrame(rows, "id long, v string, op string, seq long")
            .repartition(8), 0)
    before = {(r["id"], r["v"]) for r in t.read().collect()}
    v_before = t._current_version()

    stats = t.compact(target_bytes=10**9)["<table>"]
    assert stats["files_after"] == 1
    assert stats["files_before"] > 1
    # data byte-identical, new version atomically current, old readable
    assert t._current_version() == v_before + 1
    assert {(r["id"], r["v"]) for r in t.read().collect()} == before
    assert t.read_version(v_before).count() == 100
    # already-compact table: no-op, version unchanged
    assert t.compact(target_bytes=10**9)["<table>"]["files_after"] == 1
    assert t._current_version() == v_before + 1


def test_compact_partitioned(spark, tmp_path):
    t = ParquetMergeTarget(spark, str(tmp_path / "tcp"), ["id"],
                           "id long, dt string, v string", partition_col="dt")
    rows = [(i, f"d{i % 2}", f"v{i}", "insert", i) for i in range(60)]
    t.apply_batch(
        spark.createDataFrame(rows, "id long, dt string, v string, op string, seq long"), 0)
    # apply_batch now rebalances its staged write to right-sized files,
    # so fragment each partition's current version BY HAND to build the
    # accumulated-small-files state compaction exists for
    m = t._manifest()
    for val, ver in m["partitions"].items():
        src = str(tmp_path / "tcp" / f"p={val}" / f"v{ver}")
        frag = src + "_frag"
        with _no_coalesce(spark):
            spark.read.parquet(src).repartition(3).write.parquet(frag)
        import shutil
        shutil.rmtree(src)
        os.replace(frag, src)
    before = {(r["id"], r["v"]) for r in t.read().collect()}
    stats = t.compact(target_bytes=10**9)
    assert set(stats) == {"d0", "d1"}
    assert all(s["files_after"] == 1 for s in stats.values())
    assert {(r["id"], r["v"]) for r in t.read().collect()} == before
    # vacuum reclaims the pre-compaction version dirs
    assert t.vacuum(keep_last=1) == 2


def test_stream_with_compaction_cadence(spark, tmp_path):
    """Maintenance rides the stream's epoch cadence: with
    compact_every=1 each epoch's merge is followed by bin-packing to a
    single file + vacuum, and the final state still equals the LWW
    truth."""
    from pyspark.sql import functions as F

    from gravity_spark.streaming.pipeline import run_stream

    src = str(tmp_path / "src")
    with _no_coalesce(spark):
        spark.createDataFrame(
            [(i, f"v{i}", "insert", i) for i in range(40)],
            "id long, v string, op string, seq long",
        ).repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "2").parquet(src)
    )
    t = ParquetMergeTarget(spark, str(tmp_path / "tgt"), ["id"], "id long, v string")
    with _no_coalesce(spark):
        q = run_stream(
            stream, t, lambda df: df.select("id", "v", "op", "seq"),
            str(tmp_path / "ckpt"), compact_every=1,
        )
        q.processAllAvailable()
        q.stop()
    assert t.read().count() == 40
    # current version dir is bin-packed to one file
    cur = t._current_version()
    vdir = str(tmp_path / "tgt" / f"v{cur}")
    n_files = len([e for e in os.listdir(vdir) if e.endswith(".parquet")])
    assert n_files == 1


def test_changes_between_versions(spark, tmp_path):
    """Change data feed between retained versions: insert/update/delete
    classification with pre/post images, unchanged rows dropped."""
    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget

    t = ParquetMergeTarget(
        spark, str(tmp_path / "cdf"), ["id"], "id long, v string, qty long"
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "id long, v string, qty long, op string, seq long"
        )

    t.apply_batch(batch([
        (1, "a", 10, "insert", 1),
        (2, "b", 20, "insert", 2),
        (3, "c", 30, "insert", 3),
    ]))
    v1 = t._current_version()
    t.apply_batch(batch([
        (2, "b2", 21, "update", 4),   # changed
        (3, "c", 30, "update", 5),    # written but value-identical → not in CDF
        (4, "d", 40, "insert", 6),    # new
        (1, "a", 10, "delete", 7),    # gone
    ]))
    v2 = t._current_version()

    cdf = {r["id"]: r for r in t.changes_between(v1, v2).collect()}
    assert set(cdf) == {1, 2, 4}  # id=3 unchanged → absent
    assert cdf[1]["op"] == "delete" and cdf[1]["old_v"] == "a" and cdf[1]["new_v"] is None
    assert cdf[2]["op"] == "update" and cdf[2]["old_qty"] == 20 and cdf[2]["new_qty"] == 21
    assert cdf[4]["op"] == "insert" and cdf[4]["old_v"] is None and cdf[4]["new_v"] == "d"

    # symmetric sanity: reversing the versions flips inserts/deletes
    rev = {r["id"]: r["op"] for r in t.changes_between(v2, v1).collect()}
    assert rev[1] == "insert" and rev[4] == "delete" and rev[2] == "update"
