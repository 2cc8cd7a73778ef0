import json

from pyspark.sql import functions as F

from gravity_spark.core.envelope import memory_changes
from gravity_spark.sinks.esmodel import assemble_docs, to_docs
from gravity_spark.sinks.wire import to_wire_v01, to_wire_v20

ROWS = [
    {"database": "app", "table": "t", "op": "insert",
     "ts": __import__("datetime").datetime(2024, 1, 1, 12, 0, 0),
     "data": {"id": 1, "v": "a"}, "pks": {"id": 1}, "seq": 1},
    {"database": "app", "table": "t", "op": "update",
     "ts": __import__("datetime").datetime(2024, 1, 2, 12, 0, 0),
     "data": {"id": 1, "v": "b"}, "old": {"id": 1, "v": "a"},
     "pks": {"id": 1}, "seq": 2},
]


def test_wire_v01(spark):
    wire = to_wire_v01(memory_changes(spark, ROWS)).collect()
    assert len(wire) == 2
    payload = json.loads(wire[0]["value"])
    assert payload["version"] == "0.1"
    assert payload["database"] == "app"
    assert payload["type"] == "insert"
    assert payload["data"] == {"id": "1", "v": "a"}
    # same pk → same key (per-PK partition placement)
    assert wire[0]["key"] == wire[1]["key"]


def test_wire_v20_has_seq_and_rfc3339(spark):
    wire = to_wire_v20(memory_changes(spark, ROWS)).collect()
    p = json.loads(wire[1]["value"])
    assert p["version"] == "2.0.alpha"
    assert p["op"] == "update"
    assert p["seq"] == 2
    assert "T" in p["time"]
    assert p["old"] == {"id": "1", "v": "a"}


def test_esmodel_assembly(spark):
    parent = spark.createDataFrame([(1, "alice"), (2, "bob")], "uid long, name string")
    addr = spark.createDataFrame(
        [(1, "street-1", "zz")], "uid long, street string, junk string"
    )
    orders = spark.createDataFrame(
        [(1, 100, 5.0), (1, 101, 7.0), (2, 102, 9.0)],
        "uid long, oid long, amt double",
    )
    doc = assemble_docs(
        parent,
        "uid",
        one_one=[{"name": "address", "df": addr, "join-key": "uid",
                  "exclude-columns": ["junk"]}],
        one_many=[{"name": "orders", "df": orders, "join-key": "uid",
                   "order-key": "oid"}],
    )
    rows = {r["uid"]: r for r in doc.collect()}
    assert rows[1]["address"]["street"] == "street-1"
    assert "junk" not in rows[1]["address"].asDict()
    assert [o["oid"] for o in rows[1]["orders"]] == [100, 101]
    assert rows[2]["address"] is None

    docs = {r["doc_id"]: json.loads(r["doc"]) for r in to_docs(doc, "uid").collect()}
    assert docs["1"]["orders"][1]["amt"] == 7.0


def test_wire_roundtrip_streaming_schema(spark, tmp_path):
    # wire output works on a streaming DataFrame plan too (no actions)
    from gravity_spark.core.envelope import MSG_SCHEMA

    src = tmp_path / "wire-stream"
    src.mkdir()
    stream = spark.readStream.schema(MSG_SCHEMA).format("json").load(str(src))
    wired = to_wire_v01(stream)
    assert wired.isStreaming
    assert set(wired.columns) == {"key", "value"}
