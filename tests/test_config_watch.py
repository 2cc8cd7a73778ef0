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
