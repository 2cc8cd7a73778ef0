"""Config-watch restart loop (cmd/gravity/main.go:95-105,149-173 parity):
content-change detection, invalid-config rejection (keep last good),
and supervised rebuild of a running pipeline from the new config."""

import time

from gravity_spark.plans.watch import ConfigWatcher, supervise

V3_TOML = """
name = "watchdemo"

[input]
type = "memory-batch"
mode = "batch"

[input.config]
rows = [
  {database = "app", table = "users", op = "insert", data = {id = "1", v = "x"}, pks = {id = "1"}, seq = 1},
]

[[filters]]
type = "accept"
match-table = "users"

[output]
type = "parquet-merge"

[output.config]
path = "%s"
pk = ["id"]
schema = "id string, v string"
"""


def test_watcher_fires_on_content_change(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('name = "a"\n')
    seen = []
    w = ConfigWatcher(str(p), seen.append)
    assert not w.poll_once()  # unchanged
    p.write_text('name = "b"\n')
    assert w.poll_once()
    assert seen[-1]["name"] == "b"
    assert w.reloads == 1
    # touching with the SAME content must not restart (content hash,
    # not mtime, is authoritative)
    p.write_text('name = "b"\n')
    assert not w.poll_once()
    assert w.reloads == 1


def test_watcher_rejects_invalid_and_keeps_last_good(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('name = "a"\n')
    seen = []
    w = ConfigWatcher(str(p), seen.append)
    p.write_text("not [valid toml ===")
    assert not w.poll_once()
    assert w.rejected == 1 and w.reloads == 0 and seen == []
    # invalid MODE is also rejected (config_v3.go:52-58 validation)
    p.write_text('name = "c"\n[input]\ntype = "memory-batch"\nmode = "bogus"\n')
    assert not w.poll_once()
    assert w.rejected == 2 and seen == []
    # next valid config still lands
    p.write_text('name = "d"\n')
    assert w.poll_once()
    assert seen[-1]["name"] == "d"


def test_watcher_survives_on_change_exception(tmp_path):
    # A config that PARSES but whose build raises must not kill the
    # watcher (or the running pipeline): counted rejected, next valid
    # config still lands.
    p = tmp_path / "cfg.toml"
    p.write_text('name = "a"\n')
    seen = []

    def cb(cfg):
        if cfg["name"] == "boom":
            raise RuntimeError("unknown plugin type")
        seen.append(cfg)

    w = ConfigWatcher(str(p), cb)
    p.write_text('name = "boom"\n')
    assert not w.poll_once()
    assert w.rejected == 1 and w.reloads == 0
    assert "unknown plugin" in w.last_error
    p.write_text('name = "ok"\n')
    assert w.poll_once()
    assert seen[-1]["name"] == "ok" and w.reloads == 1


def test_supervise_build_failure_keeps_old_pipeline(spark, tmp_path):
    cfg_path = tmp_path / "pipe.toml"
    cfg_path.write_text(V3_TOML % str(tmp_path / "tgt1"))
    get_pipeline, watcher = supervise(spark, str(cfg_path), poll_interval=0.05)
    try:
        p1 = get_pipeline()
        # parseable config with an unknown output type → build raises →
        # watcher rejects, p1 stays current
        cfg_path.write_text(
            'name = "bad"\n[input]\ntype = "memory-batch"\nmode = "batch"\n'
            '[input.config]\nrows = []\n[output]\ntype = "no-such-sink"\n'
        )
        deadline = time.time() + 10
        while watcher.rejected == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert watcher.rejected >= 1
        assert get_pipeline() is p1
    finally:
        watcher.stop()


def test_supervise_rebuilds_pipeline_on_change(spark, tmp_path):
    cfg_path = tmp_path / "pipe.toml"
    cfg_path.write_text(V3_TOML % str(tmp_path / "tgt1"))
    get_pipeline, watcher = supervise(spark, str(cfg_path), poll_interval=0.05)
    try:
        p1 = get_pipeline()
        p1.run_batch()
        assert [(r["id"], r["v"]) for r in p1.target.read().collect()] == [("1", "x")]
        # rewrite config pointing at a NEW target path → watcher rebuilds
        cfg_path.write_text(V3_TOML % str(tmp_path / "tgt2"))
        deadline = time.time() + 10
        while get_pipeline() is p1 and time.time() < deadline:
            time.sleep(0.05)
        p2 = get_pipeline()
        assert p2 is not p1
        p2.run_batch()
        assert [(r["id"], r["v"]) for r in p2.target.read().collect()] == [("1", "x")]
        assert str(tmp_path / "tgt2") in str(p2.target.path)
    finally:
        watcher.stop()


STREAM_TOML = """
name = "watchstream"

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


def test_supervise_auto_start_restarts_stream(spark, tmp_path):
    """Streaming supervise: the running query is tracked, stopped on a
    valid reload, and the replacement stream started — build-then-stop
    ordering (cmd/gravity/main.go:149-173 restart loop)."""
    import json
    import time as _t

    src = tmp_path / "cdc"
    src.mkdir()
    with open(src / "p0.json", "w") as f:
        f.write(json.dumps({
            "type": "dml", "database": "app", "table": "t", "op": "insert",
            "data": {"id": "1", "v": "a"}, "pks": {"id": "1"}, "seq": 1,
        }) + "\n")

    def cfg_text(n):
        return STREAM_TOML % (str(src), str(tmp_path / f"tgt{n}"),
                              str(tmp_path / f"ckpt{n}"))

    cfg_path = tmp_path / "pipe.toml"
    cfg_path.write_text(cfg_text(1))
    from gravity_spark.plans.watch import supervise

    get_pipeline, watcher = supervise(
        spark, str(cfg_path), poll_interval=0.05, auto_start=True
    )
    q1 = None
    try:
        p1 = get_pipeline()
        assert p1.is_streaming
        # the initial stream was auto-started; wait for it to apply
        deadline = _t.time() + 30
        while _t.time() < deadline:
            try:
                if p1.target.read().count() == 1:
                    break
            except Exception:
                pass
            _t.sleep(0.2)
        assert p1.target.read().count() == 1

        # reload with a new target: old stream stopped, new one started
        cfg_path.write_text(cfg_text(2))
        deadline = _t.time() + 15
        while get_pipeline() is p1 and _t.time() < deadline:
            _t.sleep(0.05)
        p2 = get_pipeline()
        assert p2 is not p1
        deadline = _t.time() + 30
        while _t.time() < deadline:
            try:
                if p2.target.read().count() == 1:
                    break
            except Exception:
                pass
            _t.sleep(0.2)
        assert p2.target.read().count() == 1
    finally:
        watcher.stop()
        for q in spark.streams.active:
            q.stop()
