import json

from pyspark.sql import functions as F

from gravity_spark.core.envelope import memory_changes
from gravity_spark.sinks.esmodel import assemble_docs, to_docs
from gravity_spark.sinks.wire import to_wire_mongo, to_wire_v01, to_wire_v20

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


def test_wire_roundtrip_v20_and_v01(spark):
    # gravity → gravity chaining: our own wire output decodes back to
    # the envelope (the reference's Deserialize panics — this exceeds
    # parity); v2.0 keeps seq + millis, v0.1 is second-precision
    from gravity_spark.sinks.wire import from_wire_v01, from_wire_v20

    src = memory_changes(spark, ROWS)
    back20 = from_wire_v20(to_wire_v20(src)).orderBy("seq").collect()
    assert [r["op"] for r in back20] == ["insert", "update"]
    assert back20[1]["old"] == {"id": "1", "v": "a"}
    assert back20[0]["seq"] == 1 and back20[1]["seq"] == 2
    assert back20[0]["ts"] == ROWS[0]["ts"]
    assert back20[0]["database"] == "app" and back20[0]["table"] == "t"

    back01 = from_wire_v01(to_wire_v01(src)).orderBy("ts").collect()
    assert [r["op"] for r in back01] == ["insert", "update"]
    assert back01[0]["data"] == {"id": "1", "v": "a"}
    assert back01[0]["ts"] == ROWS[0]["ts"]  # whole-second source times


def test_wire_mongo_both_versions(spark):
    # mongo_json.go parity: v2.0-alpha {version, database, collection,
    # data, row}; v0.1 embeds the oplog-shaped object + source name
    wire = to_wire_mongo(memory_changes(spark, ROWS)).collect()
    p = json.loads(wire[0]["value"])
    assert p["version"] == "2.0.alpha"
    assert p["collection"] == "t"
    assert p["data"] == {"id": "1", "v": "a"}
    assert p["row"] == {"id": "1"}

    w01 = to_wire_mongo(memory_changes(spark, ROWS), version="0.1").collect()
    p0 = json.loads(w01[0]["value"])
    p1 = json.loads(w01[1]["value"])
    assert p0["version"] == "0.1" and p0["collection"] == "t"
    assert p0["oplog"]["ns"] == "app.t"
    assert p0["oplog"]["op"] == "i" and p1["oplog"]["op"] == "u"
    assert p0["oplog"]["o"] == {"id": "1", "v": "a"}
    assert w01[0]["key"] == w01[1]["key"]


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


def test_esmodel_incremental_touches_one_doc(spark, tmp_path):
    """esmodel.go:297-492 parity: a single child-row change reassembles
    exactly ONE parent document; sibling docs are not rewritten."""
    from gravity_spark.sinks.esmodel import EsModelTarget

    t = EsModelTarget(
        spark,
        str(tmp_path / "es"),
        parent_table="customer",
        parent_key="cid",
        parent_schema_ddl="cid long, name string",
        one_many=[{
            "name": "orders",
            "table": "orders",
            "pk": "oid",
            "join-key": "cid",
            "order-key": "oid",
            "schema_ddl": "oid long, cid long, amount long",
        }],
    )

    def ch(rows, ddl):
        return spark.createDataFrame(rows, ddl + ", op string, seq long")

    t.apply_batch(
        {
            "customer": ch(
                [(1, "ada", "insert", 1), (2, "bob", "insert", 2), (3, "eve", "insert", 3)],
                "cid long, name string",
            ),
            "orders": ch(
                [(10, 1, 100, "insert", 4), (11, 1, 150, "insert", 5), (20, 2, 70, "insert", 6)],
                "oid long, cid long, amount long",
            ),
        },
        epoch_id=1,
    )
    assert t.last_reassembled == 3
    docs1 = {r.doc_id: r.doc for r in t.docs().collect()}
    assert set(docs1) == {"1", "2", "3"}
    assert '"amount":100' in docs1["1"] and '"amount":150' in docs1["1"]

    # epoch 2: ONE child update → only parent 1's doc reassembled
    t.apply_batch(
        {
            "orders": ch(
                [(10, 1, 999, "update", 7)], "oid long, cid long, amount long"
            )
        },
        epoch_id=2,
    )
    assert t.last_reassembled == 1
    docs2 = {r.doc_id: r.doc for r in t.docs().collect()}
    assert '"amount":999' in docs2["1"]
    assert docs2["2"] == docs1["2"] and docs2["3"] == docs1["3"]

    # epoch 3: parent delete → doc delete, siblings untouched
    t.apply_batch(
        {
            "customer": ch([(2, None, "delete", 8)], "cid long, name string"),
        },
        epoch_id=3,
    )
    docs3 = {r.doc_id: r.doc for r in t.docs().collect()}
    assert set(docs3) == {"1", "3"}


def test_esmodel_route_column_maps(spark, tmp_path):
    """Per-route include/exclude/convert (esmodel_router.go:24-59):
    parent excludes a column, child includes a subset and converts a
    type — maps applied at assembly, not stored state."""
    from gravity_spark.sinks.esmodel import EsModelTarget

    t = EsModelTarget(
        spark,
        str(tmp_path / "es2"),
        parent_table="p",
        parent_key="pid",
        parent_schema_ddl="pid long, name string, secret string",
        parent_spec={"exclude-columns": ["secret"]},
        one_many=[{
            "name": "kids",
            "table": "k",
            "pk": "kid",
            "join-key": "pid",
            "order-key": "kid",
            "schema_ddl": "kid long, pid long, v string, junk string",
            "include-columns": ["kid", "v"],
            "convert-columns": {"v": "long"},
        }],
    )

    def ch(rows, ddl):
        return spark.createDataFrame(rows, ddl + ", op string, seq long")

    t.apply_batch(
        {
            "p": ch([(1, "ada", "s3cret", "insert", 1)],
                    "pid long, name string, secret string"),
            "k": ch([(10, 1, "42", "x", "insert", 2)],
                    "kid long, pid long, v string, junk string"),
        },
        epoch_id=1,
    )
    doc = {r.doc_id: r.doc for r in t.docs().collect()}["1"]
    assert "secret" not in doc and "s3cret" not in doc
    assert "junk" not in doc
    assert '"v":42' in doc  # converted to long → unquoted JSON number
