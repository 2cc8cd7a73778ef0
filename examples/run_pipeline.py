"""Runnable walkthrough: seed a few CDC events, run the TOML pipeline,
print the merged target state.

    python examples/run_pipeline.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gravity_spark.session import get_spark
from gravity_spark.plans.pipeline import load_pipeline

BASE = "/tmp/gravity_spark_example"


def seed_events() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(f"{BASE}/cdc")
    events = [
        {"type": "dml", "database": "app", "table": "users", "op": "insert",
         "data": {"id": "1", "name": "ada", "email": "ada@x", "password": "s3cret"},
         "pks": {"id": "1"}, "stream_key": "s0", "seq": 1},
        {"type": "dml", "database": "app", "table": "users", "op": "insert",
         "data": {"id": "2", "name": "bob", "email": "bob@x", "password": "hunter2"},
         "pks": {"id": "2"}, "stream_key": "s0", "seq": 2},
        {"type": "dml", "database": "app", "table": "users", "op": "update",
         "data": {"id": "1", "name": "ada lovelace", "email": "ada@x", "password": "s3cret"},
         "pks": {"id": "1"}, "stream_key": "s0", "seq": 3},
        {"type": "dml", "database": "app", "table": "audit_log", "op": "insert",
         "data": {"id": "9"}, "pks": {"id": "9"}, "stream_key": "s0", "seq": 4},
        {"type": "dml", "database": "app", "table": "users", "op": "delete",
         "data": {"id": "2"}, "pks": {"id": "2"}, "stream_key": "s0", "seq": 5},
    ]
    with open(f"{BASE}/cdc/batch-0.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def main() -> None:
    seed_events()
    spark = get_spark("example_pipeline", cpus=4)
    toml = os.path.join(os.path.dirname(__file__), "replication_pipeline.toml")
    pipeline = load_pipeline(spark, toml)
    query = pipeline.start_stream()
    query.processAllAvailable()
    query.stop()

    print("\nfinal target state (audit_log filtered, password dropped,")
    print("user 1 collapsed to latest, user 2 deleted):")
    pipeline.target.read().orderBy("id").show(truncate=False)


if __name__ == "__main__":
    main()
