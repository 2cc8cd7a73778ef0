"""Config-file watch + pipeline restart (ops-plane parity).

The reference process watches its pipeline config and restarts the
running pipeline when it changes (cmd/gravity/main.go:95-105,149-173).
Spark-first restatement: a poller thread hashes the config file; on a
content change it re-parses and NORMALIZES the config (v2 configs are
converted, plugin aliases resolved — plans/config.py), then hands the
new config to a restart callback. A config that fails to parse or
validate is counted and ignored — the running pipeline keeps its last
good config, exactly the behavior an operator wants from a hot-reload
path. Polling (mtime is not enough on coarse-mtime filesystems; content
hash is authoritative) keeps this portable — no inotify dependency.
"""

from __future__ import annotations

import hashlib
import threading
import tomllib
from pathlib import Path
from typing import Any, Callable, Mapping

from gravity_spark.plans.config import normalize_pipeline_config


class ConfigWatcher:
    def __init__(
        self,
        path: str,
        on_change: Callable[[Mapping[str, Any]], None],
        poll_interval: float = 0.2,
    ) -> None:
        self.path = Path(path)
        self.on_change = on_change
        self.poll_interval = poll_interval
        self.reloads = 0
        self.rejected = 0
        self.last_error: str | None = None
        self._digest = self._read_digest()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _read_digest(self) -> str:
        try:
            return hashlib.sha256(self.path.read_bytes()).hexdigest()
        except OSError:
            return ""

    def _parse(self) -> Mapping[str, Any] | None:
        try:
            raw = tomllib.loads(self.path.read_text())
            return normalize_pipeline_config(raw)
        except Exception as e:  # invalid config → keep the old one
            self.rejected += 1
            self.last_error = str(e)
            return None

    def poll_once(self) -> bool:
        """One poll step; returns True when a valid new config fired the
        callback. Exposed for deterministic tests and for embedding in
        an existing scheduler loop."""
        digest = self._read_digest()
        if not digest or digest == self._digest:
            return False
        self._digest = digest
        cfg = self._parse()
        if cfg is None:
            return False
        try:
            self.on_change(cfg)
        except Exception as e:
            # A parseable config can still fail to BUILD (unknown plugin
            # type, bad schema). That must not kill the watcher thread —
            # count it as rejected and keep the last good pipeline
            # running, same contract as a parse failure.
            self.rejected += 1
            self.last_error = str(e)
            return False
        self.reloads += 1
        return True

    def _loop(self) -> None:
        while not self._stop.wait(self.poll_interval):
            self.poll_once()

    def start(self) -> "ConfigWatcher":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


def supervise(spark, toml_path: str, poll_interval: float = 0.2,
              auto_start: bool = False):
    """Run a pipeline under config watch: builds it, and on every valid
    config change rebuilds from the new config — the reference's
    restart-on-change loop with Spark queries as the restart unit.

    Restart ordering is build-THEN-stop: the replacement pipeline is
    constructed first, so a config that parses but fails to build
    (unknown plugin, bad schema) leaves the old pipeline and its stream
    untouched (ConfigWatcher counts it as rejected). Only after a
    successful build is the old stream stopped and — when ``auto_start``
    and the pipeline is streaming — the new stream started and tracked,
    so the next reload can stop it in turn.

    Returns (get_pipeline, watcher); call ``watcher.stop()`` then stop
    the pipeline/stream to shut down."""
    from gravity_spark.plans.pipeline import build_pipeline

    state: dict[str, Any] = {}

    def _start(cfg: Mapping[str, Any]) -> None:
        new_pipe = build_pipeline(spark, cfg)  # may raise → watcher rejects
        old_q = state.pop("query", None)
        if old_q is not None:
            old_q.stop()
        state["pipeline"] = new_pipe
        state["config"] = cfg
        if auto_start and new_pipe.is_streaming:
            state["query"] = new_pipe.start_stream()

    with open(toml_path, "rb") as f:
        _start(normalize_pipeline_config(tomllib.load(f)))
    watcher = ConfigWatcher(toml_path, _start, poll_interval).start()
    return (lambda: state["pipeline"]), watcher
