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


#: stages the reference's PositionMeta.Validate accepts
#: (pkg/position_repos/position_repos.go meta; config.InputMode)
VALID_STAGES = {"batch", "stream", "unknown"}


class DbPositionStore:
    """Durable position repo on any DB-API connection — the
    `_gravity.gravity_positions` table (pkg/position_repos/
    mysql_repo.go:37-60) with the same shape and semantics:

        name VARCHAR PRIMARY KEY, stage VARCHAR NOT NULL,
        position TEXT, created_at, updated_at

    Same interface as PositionStore (get/put/delete/flush) so pipelines
    swap stores by construction only. Writes are write-through-cached
    and flushed on the reference's 5 s cadence or on demand; each flush
    upserts only dirty pipelines in one transaction. In the sandbox the
    conn factory is sqlite3; in production, any PEP-249 driver
    (mysqlclient etc.) — the SQL sticks to the common subset.
    """

    TABLE = "gravity_positions"

    def __init__(self, conn_factory, flush_interval_s: float = 5.0) -> None:
        self._connect = conn_factory
        self.flush_interval_s = flush_interval_s
        self._cache: dict[str, dict[str, Any]] = {}
        self._dirty: set[str] = set()
        self._deleted: set[str] = set()
        self._last_flush = 0.0
        con = self._connect()
        try:
            con.execute(
                f"""CREATE TABLE IF NOT EXISTS {self.TABLE} (
                    name VARCHAR(255) NOT NULL PRIMARY KEY,
                    stage VARCHAR(20) NOT NULL DEFAULT 'unknown',
                    position TEXT,
                    created_at TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP,
                    updated_at TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP
                )"""
            )
            con.commit()
            cur = con.execute(f"SELECT name, stage, position FROM {self.TABLE}")
            for name, stage, position in cur.fetchall():
                v = json.loads(position) if position else {}
                v["stage"] = stage
                self._cache[name] = v
        finally:
            con.close()

    def get(self, pipeline: str) -> dict[str, Any] | None:
        return self._cache.get(pipeline)

    def put(self, pipeline: str, value: dict[str, Any], flush: bool = False) -> None:
        stage = value.get("stage", "unknown")
        if stage not in VALID_STAGES:
            raise ValueError(f"invalid stage {stage!r} (PositionMeta.Validate)")
        self._cache[pipeline] = dict(value, updated_at=time.time())
        self._dirty.add(pipeline)
        self._deleted.discard(pipeline)
        now = time.time()
        if flush or (now - self._last_flush) >= self.flush_interval_s:
            self.flush()

    def delete(self, pipeline: str, flush: bool = True) -> None:
        self._cache.pop(pipeline, None)
        self._deleted.add(pipeline)
        self._dirty.discard(pipeline)
        if flush:
            self.flush()

    def flush(self) -> None:
        if not self._dirty and not self._deleted:
            return
        con = self._connect()
        try:
            for name in self._dirty:
                v = self._cache[name]
                payload = json.dumps({k: v[k] for k in v if k != "stage"})
                stage = v.get("stage", "unknown")
                con.execute(f"DELETE FROM {self.TABLE} WHERE name = ?", (name,))
                con.execute(
                    f"INSERT INTO {self.TABLE} (name, stage, position) VALUES (?, ?, ?)",
                    (name, stage, payload),
                )
            for name in self._deleted:
                con.execute(f"DELETE FROM {self.TABLE} WHERE name = ?", (name,))
            con.commit()
        finally:
            con.close()
        self._dirty.clear()
        self._deleted.clear()
        self._last_flush = time.time()


class DocPositionStore:
    """Document-store-flavor position repo — the third backend,
    matching pkg/position_repos/mongo_repo.go:84-200: one document per
    pipeline in a `gravity_positions` collection, shaped

        {version: "1.0", name, stage, value: <json string>,
         last_update: <RFC3339Nano>}

    upserted by name. In-sandbox the "collection" is a directory with
    one JSON document per pipeline (atomic file replace — same
    single-writer whole-document swap the mongo repo's UpdateOne
    upsert performs); in production the identical document contract
    runs against any document DB client.

    Reference semantics kept exactly:
      - Put validates the stage (PositionMeta.Validate) and rejects an
        empty value (mongo_repo.go:182-185);
      - Get of a VERSION-LESS document (the deprecated PositionEntity
        format) falls back to decoding start_position/current_position
        and re-marshaling them as the value string with sorted keys
        (mongo_repo.go:139-158, myJson SortMapKeys);
      - documents carry last_update as RFC3339Nano.

    Interface-compatible with PositionStore/DbPositionStore
    (get/put/delete/flush) so pipelines swap stores by construction.
    """

    COLLECTION = "gravity_positions"
    VERSION = "1.0"

    def __init__(self, root: str, flush_interval_s: float = 5.0) -> None:
        self.dir = os.path.join(root, self.COLLECTION)
        os.makedirs(self.dir, exist_ok=True)
        self.flush_interval_s = flush_interval_s
        self._cache: dict[str, dict[str, Any]] = {}
        self._dirty: set[str] = set()
        self._deleted: set[str] = set()
        self._last_flush = 0.0
        for fname in os.listdir(self.dir):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(self.dir, fname)) as f:
                doc = json.load(f)
            name = doc.get("name", fname[:-5])
            if not doc.get("version"):
                # deprecated PositionEntity format: inline mongo position
                value = {
                    "start_position": doc.get("start_position"),
                    "current_position": doc.get("current_position"),
                }
            else:
                value = json.loads(doc["value"]) if doc.get("value") else {}
            value["stage"] = doc.get("stage", "unknown")
            self._cache[name] = value

    def get(self, pipeline: str) -> dict[str, Any] | None:
        return self._cache.get(pipeline)

    def put(self, pipeline: str, value: dict[str, Any], flush: bool = False) -> None:
        stage = value.get("stage", "unknown")
        if stage not in VALID_STAGES:
            raise ValueError(f"invalid stage {stage!r} (PositionMeta.Validate)")
        if not {k: v for k, v in value.items() if k != "stage"}:
            raise ValueError("empty value")  # mongo_repo.go:182-185
        self._cache[pipeline] = dict(value, updated_at=time.time())
        self._dirty.add(pipeline)
        self._deleted.discard(pipeline)
        now = time.time()
        if flush or (now - self._last_flush) >= self.flush_interval_s:
            self.flush()

    def delete(self, pipeline: str, flush: bool = True) -> None:
        self._cache.pop(pipeline, None)
        self._deleted.add(pipeline)
        self._dirty.discard(pipeline)
        if flush:
            self.flush()

    def _doc_path(self, pipeline: str) -> str:
        return os.path.join(self.dir, f"{pipeline}.json")

    def flush(self) -> None:
        if not self._dirty and not self._deleted:
            return
        from datetime import datetime, timezone

        for name in self._dirty:
            v = self._cache[name]
            doc = {
                "version": self.VERSION,
                "name": name,
                "stage": v.get("stage", "unknown"),
                "value": json.dumps(
                    {k: v[k] for k in sorted(v) if k != "stage"}
                ),
                "last_update": datetime.now(timezone.utc).isoformat(),
            }
            tmp = self._doc_path(name) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f, indent=2)
            os.replace(tmp, self._doc_path(name))
        for name in self._deleted:
            try:
                os.remove(self._doc_path(name))
            except FileNotFoundError:
                pass
        self._dirty.clear()
        self._deleted.clear()
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
