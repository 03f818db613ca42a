"""Live-request execution against a real (in-process) HTTP server —
parity with the reference's generate-and-fire flow
(fences/open_api/generate.py:58-84, examples/opcua_nodeset/main.py:
73-106): generated/validated request rows are executed from the
EXECUTORS, and the engine's verdict is tallied against the server's
actual accept/reject in the reference's confusion vocabulary.

The server handler validates INDEPENDENTLY (hand-written checks, no
shared code with the engine), so a diagonal confusion matrix is a real
two-implementation agreement, not a tautology.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from fences_spark.report import ConfusionCounts
from fences_spark.schema.open_api import OpenApiValidator
from fences_spark.schema.open_api_exec import (
    execute_requests,
    replay_report,
    server_confusion,
)

SPEC = {
    "info": {"title": "orders", "version": "1"},
    "paths": {
        "/orders/{id}": {
            "get": {
                "operationId": "getOrder",
                "parameters": [
                    {"name": "id", "in": "path",
                     "schema": {"type": "integer", "minimum": 1}},
                    {"name": "limit", "in": "query", "required": True,
                     "schema": {"type": "integer", "minimum": 1, "maximum": 100}},
                ],
                "responses": {"200": {"description": "ok"}},
            }
        },
        "/orders": {
            "post": {
                "operationId": "createOrder",
                "requestBody": {
                    "required": True,
                    "content": {"application/json": {"schema": {
                        "type": "object",
                        "required": ["custkey", "total"],
                        "properties": {
                            "custkey": {"type": "integer", "minimum": 1},
                            "total": {"type": "number", "exclusiveMinimum": 0},
                        },
                    }}},
                },
                "responses": {"201": {"description": "created"}},
            }
        },
    },
}


class _Handler(BaseHTTPRequestHandler):
    """Independent implementation of the same contract."""

    def log_message(self, *args):  # quiet
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        u = urlparse(self.path)
        m = re.fullmatch(r"/orders/([^/]+)", u.path)
        if not m:
            return self._reply(404, {"error": "no route"})
        oid = m.group(1)
        if not re.fullmatch(r"-?\d+", oid) or int(oid) < 1:
            return self._reply(400, {"error": "bad id"})
        q = parse_qs(u.query)
        lim = q.get("limit")
        if not lim or not re.fullmatch(r"-?\d+", lim[0]) or not (1 <= int(lim[0]) <= 100):
            return self._reply(400, {"error": "bad limit"})
        return self._reply(200, {"id": int(oid), "status": "OPEN"})

    def do_POST(self):
        u = urlparse(self.path)
        if u.path != "/orders":
            return self._reply(404, {"error": "no route"})
        n = int(self.headers.get("Content-Length") or 0)
        try:
            body = json.loads(self.rfile.read(n) or b"")
        except ValueError:
            return self._reply(400, {"error": "bad json"})
        if not isinstance(body, dict):
            return self._reply(400, {"error": "bad json"})
        ck, total = body.get("custkey"), body.get("total")
        if not isinstance(ck, int) or isinstance(ck, bool) or ck < 1:
            return self._reply(400, {"error": "bad custkey"})
        if not isinstance(total, (int, float)) or isinstance(total, bool) or total <= 0:
            return self._reply(400, {"error": "bad total"})
        return self._reply(201, {"created": True})


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


ROWS = [
    # (tag, method, path, query, body) — half valid, half each failure mode
    ("ok_get_1",      "GET",  "/orders/7",   {"limit": "10"},  None),
    ("ok_get_2",      "GET",  "/orders/123", {"limit": "100"}, None),
    ("ok_get_3",      "GET",  "/orders/1",   {"limit": "1"},   None),
    ("bad_id_alpha",  "GET",  "/orders/abc", {"limit": "10"},  None),
    ("bad_id_zero",   "GET",  "/orders/0",   {"limit": "10"},  None),
    ("missing_limit", "GET",  "/orders/7",   {},               None),
    ("big_limit",     "GET",  "/orders/7",   {"limit": "101"}, None),
    ("ok_post_1",     "POST", "/orders",     {}, '{"custkey": 5, "total": 1.5}'),
    ("ok_post_2",     "POST", "/orders",     {}, '{"custkey": 1, "total": 0.01}'),
    ("bad_post_zero", "POST", "/orders",     {}, '{"custkey": 5, "total": 0}'),
    ("bad_post_miss", "POST", "/orders",     {}, '{"custkey": 5}'),
    ("bad_post_json", "POST", "/orders",     {}, '{nope'),
]
ROWS_SCHEMA = ("tag string, method string, path string, "
               "query map<string,string>, body string")


class TestExecuteRequests:
    def test_statuses_and_bodies(self, spark, server):
        df = spark.createDataFrame(ROWS, ROWS_SCHEMA)
        out = execute_requests(df, server).collect()
        by_tag = {r["tag"]: r for r in out}
        assert by_tag["ok_get_1"]["status"] == 200
        assert json.loads(by_tag["ok_get_1"]["resp_body"]) == {"id": 7, "status": "OPEN"}
        assert by_tag["ok_post_1"]["status"] == 201
        for tag in ("bad_id_alpha", "bad_id_zero", "missing_limit",
                    "big_limit", "bad_post_zero", "bad_post_miss", "bad_post_json"):
            assert by_tag[tag]["status"] == 400, tag
        assert all(r["error"] is None for r in out)

    def test_dead_server_is_row_level(self, spark):
        df = spark.createDataFrame(ROWS[:2], ROWS_SCHEMA)
        out = execute_requests(df, "http://127.0.0.1:1", timeout_s=2).collect()
        assert all(r["status"] == 0 and r["error"] for r in out)

    def test_runs_distributed(self, spark, server):
        # multiple partitions, each issuing its own requests
        df = spark.createDataFrame(ROWS, ROWS_SCHEMA).repartition(4)
        out = execute_requests(df, server)
        assert out.filter("status in (200, 201, 400)").count() == len(ROWS)


class TestServerConfusion:
    def test_engine_agrees_with_server(self, spark, server):
        """The headline parity check: the engine's static verdict must
        equal the live server's accept/reject on EVERY row — a fully
        diagonal confusion matrix between two independent
        implementations of the same spec."""
        df = spark.createDataFrame(ROWS, ROWS_SCHEMA)
        executed, confusion = replay_report(df, OpenApiValidator(SPEC), server)
        row = confusion.collect()[0]
        counts = ConfusionCounts.from_row(row)
        assert counts.total() == len(ROWS)
        assert counts.valid_accepted == 5          # 3 GET + 2 POST valid
        assert counts.invalid_rejected == 7
        assert counts.is_diagonal()
        assert counts.accuracy() == 1.0
        # per-row agreement, not just aggregate
        dis = executed.filter(
            "(row_valid AND status >= 400) OR (NOT row_valid AND status < 400)"
        ).count()
        assert dis == 0

    def test_disagreement_is_visible(self, spark, server):
        """A server bug (here: simulated by validating against a spec
        the server does not implement) must show up off-diagonal."""
        looser = json.loads(json.dumps(SPEC))
        # engine believes limit may reach 1000 — server still caps at 100
        looser["paths"]["/orders/{id}"]["get"]["parameters"][1]["schema"]["maximum"] = 1000
        df = spark.createDataFrame(ROWS, ROWS_SCHEMA)
        validated = OpenApiValidator(looser).validate(df)
        executed = execute_requests(validated, server)
        counts = ConfusionCounts.from_row(server_confusion(executed).collect()[0])
        assert counts.valid_rejected == 1          # big_limit
        assert not counts.is_diagonal()
