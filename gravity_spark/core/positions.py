"""Position store: pipeline → progress KV, the PositionRepo equivalent.

Reference parity:
  - pkg/position_repos/position_repos.go:25-72 — KV store
    pipeline → (meta, value-string); MySQL table _gravity.gravity_positions
  - pkg/position_cache/cache.go:13,261 — write-through cache, 5 s flush
  - pkg/inputs/mysqlbatch/position_value.go:27-108 — batch scan position
  - pkg/inputs/mysqlstream/position_value.go — binlog (file, pos, gtid)

In Spark, streaming offsets live in the checkpoint dir (authoritative);
this store carries the rest: batch-scan progress, the snapshot→stream
handoff offset (two-stage input), and operational metadata. Backed by a
JSON file with atomic replace — at cluster scale, point it at a shared
store path; the write pattern (single writer per pipeline, whole-value
swap) is the same one the reference's MySQL repo uses.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class PositionStore:
    def __init__(self, path: str, flush_interval_s: float = 5.0) -> None:
        self.path = path
        self.flush_interval_s = flush_interval_s
        self._cache: dict[str, dict[str, Any]] = {}
        self._dirty = False
        self._last_flush = 0.0
        if os.path.exists(path):
            with open(path) as f:
                self._cache = json.load(f)

    def get(self, pipeline: str) -> dict[str, Any] | None:
        return self._cache.get(pipeline)

    def put(self, pipeline: str, value: dict[str, Any], flush: bool = False) -> None:
        """Write-through cache: updates land immediately in memory and
        hit disk on the periodic flush (5 s default, matching the
        reference) or when forced."""
        self._cache[pipeline] = dict(value, updated_at=time.time())
        self._dirty = True
        now = time.time()
        if flush or (now - self._last_flush) >= self.flush_interval_s:
            self.flush()

    def delete(self, pipeline: str, flush: bool = True) -> None:
        self._cache.pop(pipeline, None)
        self._dirty = True
        if flush:
            self.flush()

    def flush(self) -> None:
        if not self._dirty:
            return
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self._cache, f, indent=2)
        os.replace(tmp, self.path)
        self._dirty = False
        self._last_flush = time.time()


def batch_scan_position(
    table: str, scan_column: str | None, done_chunks: list[int],
    total_chunks: int, current_key: Any = None,
) -> dict[str, Any]:
    """Batch scan position value (position_value.go:27-108 shape)."""
    return {
        "stage": "batch",
        "table": table,
        "scan_column": scan_column,
        "done_chunks": done_chunks,
        "total_chunks": total_chunks,
        "current_key": current_key,
        "done": len(done_chunks) >= total_chunks,
    }


def stream_position(stream_key: str, offset: Any) -> dict[str, Any]:
    """Stream position (binlog GTID / Kafka offsets JSON equivalent)."""
    return {"stage": "stream", "stream_key": stream_key, "offset": offset}
