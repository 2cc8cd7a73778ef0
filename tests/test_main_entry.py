"""``python -m gravity_spark`` process entry: batch one-shot run,
ops-server surface, and stream mode with signal-clean shutdown."""

import os
import signal
import threading
import time
import urllib.request

from gravity_spark.__main__ import main

BATCH_TOML = """
name = "maindemo"

[input]
type = "memory-batch"
mode = "batch"

[input.config]
rows = [
  {database = "app", table = "users", op = "insert", data = {id = "1", v = "x"}, pks = {id = "1"}, seq = 1},
  {database = "app", table = "users", op = "insert", data = {id = "2", v = "y"}, pks = {id = "2"}, seq = 2},
]

[output]
type = "parquet-merge"

[output.config]
path = "%s"
pk = ["id"]
schema = "id string, v string"
"""


def test_main_batch_one_shot(spark, tmp_path):
    cfg = tmp_path / "pipe.toml"
    tgt = tmp_path / "tgt"
    cfg.write_text(BATCH_TOML % str(tgt))
    rc = main(["--config", str(cfg)])
    assert rc == 0
    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget

    t = ParquetMergeTarget(spark, str(tgt), pk_cols=["id"], schema_ddl="id string, v string")
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == [("1", "x"), ("2", "y")]


def test_main_batch_with_ops_and_watch_exits(spark, tmp_path, capsys):
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(BATCH_TOML % str(tmp_path / "tgt2"))
    rc = main(["--config", str(cfg), "--http-port", "0", "--watch"])
    assert rc == 0  # one-shot batch still exits; ops/watch torn down


FILE_STREAM_TOML = """
name = "mainstream"

[input]
type = "file-cdc"
mode = "stream"

[input.config]
path = "%s"

[output]
type = "parquet-merge"

[output.config]
path = "%s"
pk = ["id"]
schema = "id string, v string"
checkpoint = "%s"
"""


def test_main_stream_runs_and_stops_on_sigint(spark, tmp_path):
    import json

    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(
            json.dumps(
                {"type": "dml", "database": "app", "table": "users",
                 "op": "insert", "data": {"id": str(i), "v": f"v{i}"},
                 "pks": {"id": str(i)}, "stream_key": "s0", "seq": i}
            )
            for i in range(3)
        )
    )
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        FILE_STREAM_TOML % (str(src), str(tmp_path / "tgt3"), str(tmp_path / "ckpt"))
    )

    def interrupt_soon():
        time.sleep(8)
        os.kill(os.getpid(), signal.SIGINT)

    t = threading.Thread(target=interrupt_soon, daemon=True)
    t.start()
    rc = main(["--config", str(cfg)])
    assert rc == 0
    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget

    tgt = ParquetMergeTarget(
        spark, str(tmp_path / "tgt3"), pk_cols=["id"], schema_ddl="id string, v string"
    )
    assert sorted(r["id"] for r in tgt.read().collect()) == ["0", "1", "2"]


def test_main_stream_watch_hot_reload(spark, tmp_path):
    """Stream mode + --watch: a config edit must HOT-RELOAD the pipeline
    (build-new-then-stop-old), not exit the process — the restart race
    where the main loop saw the stopped old query as end-of-stream."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(
            json.dumps(
                {"type": "dml", "database": "app", "table": "users",
                 "op": "insert", "data": {"id": str(i), "v": f"v{i}"},
                 "pks": {"id": str(i)}, "stream_key": "s0", "seq": i}
            )
            for i in range(3)
        )
    )
    cfg = tmp_path / "pipe.toml"

    def cfg_text(n):
        return FILE_STREAM_TOML % (
            str(src), str(tmp_path / f"wtgt{n}"), str(tmp_path / f"wckpt{n}")
        )

    cfg.write_text(cfg_text(1))

    from gravity_spark.sinks.parquet_merge import ParquetMergeTarget

    def tgt(n):
        return ParquetMergeTarget(
            spark, str(tmp_path / f"wtgt{n}"), pk_cols=["id"],
            schema_ddl="id string, v string",
        )

    def editor():
        # wait for target 1 to fill, then hot-swap to target 2, then
        # wait for target 2 and shut down
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if tgt(1).read().count() == 3:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        cfg.write_text(cfg_text(2))
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if tgt(2).read().count() == 3:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        os.kill(os.getpid(), signal.SIGINT)

    t = threading.Thread(target=editor, daemon=True)
    t.start()
    rc = main(["--config", str(cfg), "--watch"])
    assert rc == 0
    assert sorted(r["id"] for r in tgt(1).read().collect()) == ["0", "1", "2"]
    assert sorted(r["id"] for r in tgt(2).read().collect()) == ["0", "1", "2"]
