"""Real HTTP bulk transport against an in-process ES-shaped stub.

The stub implements POST /_bulk (NDJSON, ES response shape) so the
transport — chunking, action lines, delete mapping, 429 retry — is
exercised for real over a socket, not mocked at the function level
(pkg/outputs/elasticsearch/elasticsearch.go:116-200 parity).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from gravity_spark.sinks.esmodel import http_bulk_index


class _EsStub(BaseHTTPRequestHandler):
    # class-level state shared across requests; reset per fixture
    requests: list[list[str]] = []
    docs: dict[str, str] = {}
    deletes: list[str] = []
    fail_first_with: int | None = None
    _failed_once = False
    #: live index state: index name -> {"properties": {...}}
    indices: dict[str, dict] = {}
    #: ordered log of control/data calls: ("GET"|"PUT"|"BULK", path)
    call_log: list[tuple[str, str]] = []

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        cls = _EsStub
        cls.call_log.append(("GET", self.path))
        m = self.path.strip("/").split("/")
        if len(m) == 2 and m[1] == "_mapping":
            idx = m[0]
            if idx not in cls.indices:
                self.send_error(404)
                return
            self._json(200, {idx: {"mappings": cls.indices[idx]}})
            return
        self.send_error(404)

    def do_PUT(self):  # noqa: N802
        cls = _EsStub
        cls.call_log.append(("PUT", self.path))
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])).decode() or "{}"
        )
        parts = self.path.strip("/").split("/")
        if len(parts) == 1:  # create index
            idx = parts[0]
            if idx in cls.indices:
                self.send_error(400)
                return
            cls.indices[idx] = {
                "properties": body.get("mappings", {}).get("properties", {})
            }
            self._json(200, {"acknowledged": True})
            return
        if len(parts) == 2 and parts[1] == "_mapping":  # additive update
            idx = parts[0]
            if idx not in cls.indices:
                self.send_error(404)
                return
            cls.indices[idx]["properties"].update(body.get("properties", {}))
            self._json(200, {"acknowledged": True})
            return
        self.send_error(404)

    def do_POST(self):  # noqa: N802
        cls = _EsStub
        cls.call_log.append(("BULK", self.path))
        if self.path != "/_bulk":
            self.send_error(404)
            return
        body = self.rfile.read(int(self.headers["Content-Length"])).decode("utf-8")
        lines = [ln for ln in body.split("\n") if ln]
        if cls.fail_first_with and not cls._failed_once:
            cls._failed_once = True
            self.send_error(cls.fail_first_with)
            return
        cls.requests.append(lines)
        items = []
        i = 0
        while i < len(lines):
            action = json.loads(lines[i])
            if "index" in action:
                doc = lines[i + 1]
                cls.docs[action["index"]["_id"]] = doc
                items.append({"index": {"status": 201}})
                i += 2
            elif "delete" in action:
                _id = action["delete"]["_id"]
                existed = cls.docs.pop(_id, None) is not None
                cls.deletes.append(_id)
                items.append({"delete": {"status": 200 if existed else 404}})
                i += 1
            else:
                self.send_error(400)
                return
        resp = json.dumps(
            {"errors": any(v[next(iter(v))]["status"] >= 300 for v in items), "items": items}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def es_stub():
    _EsStub.requests = []
    _EsStub.docs = {}
    _EsStub.deletes = []
    _EsStub.fail_first_with = None
    _EsStub._failed_once = False
    _EsStub.indices = {}
    _EsStub.call_log = []
    server = HTTPServer(("127.0.0.1", 0), _EsStub)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}", _EsStub
    server.shutdown()


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, doc string, op string")


def test_bulk_index_and_delete(spark, es_stub):
    url, stub = es_stub
    rows = [(str(i), json.dumps({"name": f"u{i}"}), "insert") for i in range(40)]
    rows += [("7", None, "delete"), ("9", None, "delete")]
    http_bulk_index(_docs_df(spark, rows).repartition(4), url, "users")
    # deletes may land before their inserts across partitions, so assert
    # action totals rather than final-state subtraction
    assert len(stub.deletes) == 2
    indexed = {json.loads(v)["name"] for v in stub.docs.values()}
    assert indexed <= {f"u{i}" for i in range(40)}
    total_actions = sum(
        sum(1 for ln in req if '"index"' in ln or '"delete"' in ln) for req in stub.requests
    )
    assert total_actions == 42


def test_bulk_chunking(spark, es_stub):
    url, stub = es_stub
    rows = [(str(i), json.dumps({"v": i}), "insert") for i in range(25)]
    http_bulk_index(_docs_df(spark, rows).coalesce(1), url, "t", batch_size=10)
    # 25 actions in one partition at batch_size=10 → 3 requests (10/10/5)
    sizes = sorted(len([ln for ln in req if '"index"' in ln]) for req in stub.requests)
    assert sizes == [5, 10, 10]
    assert stub.docs == {str(i): json.dumps({"v": i}) for i in range(25)}


def test_retry_on_429(spark, es_stub):
    url, stub = es_stub
    stub.fail_first_with = 429
    rows = [("1", json.dumps({"v": 1}), "insert")]
    http_bulk_index(_docs_df(spark, rows).coalesce(1), url, "t")
    assert stub.docs == {"1": json.dumps({"v": 1})}


def test_mapping_bootstrap_precedes_first_bulk(spark, es_stub):
    """Fresh index: the declared mapping is PUT before any _bulk
    (reference: checkAndSetIndex runs at output start, esmodel.go:
    541-660) — dynamic mappings never get a chance to win."""
    from gravity_spark.sinks.esmodel import mapping_properties

    url, stub = es_stub
    props = mapping_properties(
        one_one=[{"table": "profile", "mode": "object"}],
        one_many=[{"table": "orders"}],
        scalar_types={"name": "keyword"},
    )
    assert props == {
        "profile": {"type": "object"},
        "orders": {"type": "nested"},
        "name": {"type": "keyword"},
    }
    rows = [("1", json.dumps({"name": "u1"}), "insert")]
    http_bulk_index(
        _docs_df(spark, rows).coalesce(1), url, "users", ensure_mappings=props
    )
    # index created with the declared properties
    assert stub.indices["users"]["properties"] == props
    # ordering: the create PUT strictly precedes the first bulk POST
    put_i = stub.call_log.index(("PUT", "/users"))
    bulk_i = stub.call_log.index(("BULK", "/_bulk"))
    assert put_i < bulk_i
    assert stub.docs == {"1": json.dumps({"name": "u1"})}


def test_mapping_additive_update_and_conflict_warning(spark, es_stub, caplog):
    """Existing index: missing properties are added via PUT /_mapping;
    a declared property whose live type differs is a counted warning,
    not a crash (ES rejects in-place type changes — reindex territory)."""
    import logging

    from gravity_spark.sinks.esmodel import ensure_index

    url, stub = es_stub
    stub.indices["users"] = {"properties": {"name": {"type": "text"}}}
    with caplog.at_level(logging.WARNING, logger="gravity_spark.esmodel"):
        result = ensure_index(
            url, "users",
            {"name": {"type": "keyword"}, "age": {"type": "integer"}},
        )
    assert result == {"created": False, "added": ["age"], "conflicts": ["name"]}
    # additive property landed; conflicting one untouched
    assert stub.indices["users"]["properties"]["age"] == {"type": "integer"}
    assert stub.indices["users"]["properties"]["name"] == {"type": "text"}
    assert any("non-additive mapping conflict" in r.message for r in caplog.records)
    # idempotent re-run: nothing to add, same conflict count, no PUT
    puts_before = sum(1 for c in stub.call_log if c[0] == "PUT")
    result2 = ensure_index(
        url, "users", {"name": {"type": "keyword"}, "age": {"type": "integer"}}
    )
    assert result2["added"] == []
    assert sum(1 for c in stub.call_log if c[0] == "PUT") == puts_before


def test_object_subdoc_mapping_not_a_phantom_conflict(es_stub):
    """ES's GET _mapping omits "type":"object" for object fields (only
    'properties' comes back), so a declared one-one object sub-doc must
    compare equal to its live form — not warn non-additive on every
    stream start."""
    from gravity_spark.sinks.esmodel import ensure_index

    url, stub = es_stub
    # live form as ES actually returns it: no "type", only properties
    stub.indices["users"] = {"properties": {
        "profile": {"properties": {"city": {"type": "keyword"}}},
        "name": {"type": "keyword"},
    }}
    result = ensure_index(
        url, "users",
        {"profile": {"type": "object"}, "name": {"type": "keyword"}},
    )
    assert result["conflicts"] == []
    assert result["added"] == []
    # a REAL type mismatch against an object field still reports
    result2 = ensure_index(url, "users", {"profile": {"type": "nested"}})
    assert result2["conflicts"] == ["profile"]


def test_delete_of_missing_doc_is_idempotent(spark, es_stub):
    url, stub = es_stub
    rows = [("404notthere", None, "delete")]
    # stub answers status=404 for the delete; transport must treat it as
    # already-gone, not an error
    http_bulk_index(_docs_df(spark, rows).coalesce(1), url, "t")
    assert stub.deletes == ["404notthere"]


def test_esmodel_publish_bootstraps_then_bulks(spark, es_stub, tmp_path):
    """EsModelTarget.publish: mapping bootstrap derived from the model's
    route specs (child arrays → nested) strictly precedes the bulk."""
    from gravity_spark.sinks.esmodel import EsModelTarget

    url, stub = es_stub
    t = EsModelTarget(
        spark,
        str(tmp_path / "es"),
        parent_table="customer",
        parent_key="cid",
        parent_schema_ddl="cid long, name string",
        one_many=[{
            "name": "orders", "table": "orders", "pk": "oid",
            "join-key": "cid", "order-key": "oid",
            "schema_ddl": "oid long, cid long, amount long",
        }],
    )

    def ch(rows, ddl):
        return spark.createDataFrame(rows, ddl + ", op string, seq long")

    t.apply_batch(
        {
            "customer": ch([(1, "ada", "insert", 1)], "cid long, name string"),
            "orders": ch([(10, 1, 100, "insert", 2)], "oid long, cid long, amount long"),
        },
        epoch_id=1,
    )
    t.publish(url, "customers")
    assert stub.indices["customers"]["properties"] == {"orders": {"type": "nested"}}
    put_i = stub.call_log.index(("PUT", "/customers"))
    bulk_i = stub.call_log.index(("BULK", "/_bulk"))
    assert put_i < bulk_i
    assert set(stub.docs) == {"1"}
