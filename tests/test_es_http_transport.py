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

    def do_POST(self):  # noqa: N802
        cls = _EsStub
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


def test_delete_of_missing_doc_is_idempotent(spark, es_stub):
    url, stub = es_stub
    rows = [("404notthere", None, "delete")]
    # stub answers status=404 for the delete; transport must treat it as
    # already-gone, not an error
    http_bulk_index(_docs_df(spark, rows).coalesce(1), url, "t")
    assert stub.deletes == ["404notthere"]
