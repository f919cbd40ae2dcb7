"""HTTP serving shim — the last serving-parity gap vs the reference's
FastAPI SPARQL server (fastapi_sparql_server.py:242-351, endpoints
/query /health /stats; round-2 VERDICT item 5).

Design: the heavy lifting lives in :mod:`serving` (Spark SQL over
registered views + W3C result-document renderers); this module is a thin
protocol adapter. It uses only the standard library
(``http.server.ThreadingHTTPServer``) because the container ships no
FastAPI/uvicorn — on a deployment with FastAPI available the same three
handlers map 1:1 onto route functions.

Endpoints:

* ``POST /query`` — body ``{"sql": "...", "form": "select"|"ask"|
  "construct", "limit": N}``. ``select`` → SPARQL 1.1 JSON results
  document, ``ask`` → ``{"boolean": b}``, ``construct`` →
  ``{"triples": [...], "count": n}`` — the reference's three result
  forms (rdf-workbench.py:458-468). Errors → 400 with ``{"detail": m}``.
* ``GET /health`` — liveness + table version.
* ``GET /stats`` — ledger/table summary (reference /stats).

The query language is Spark SQL over the views ``register_views``
creates (rdf_triples, rdf_annotations, batches, ...) — the engine's
declared serving surface; the SPARQL→SQL translation layer is out of
scope per SURVEY §2.11.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from .serving import register_views, to_ask_json, to_construct_json, to_sparql_json
from .streaming.cdc import CdcEngine


class QueryServer:
    """Bounded-result HTTP facade over a registered engine."""

    def __init__(
        self,
        spark: SparkSession,
        engine: CdcEngine,
        host: str = "127.0.0.1",
        port: int = 0,
        max_limit: int = 10_000,
    ):
        self.spark = spark
        self.engine = engine
        self.max_limit = max_limit
        self.views = register_views(spark, engine)
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _send(self, code: int, doc: dict) -> None:
                body = json.dumps(doc).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                if self.path == "/health":
                    self._send(200, outer.health())
                elif self.path == "/stats":
                    self._send(200, outer.stats())
                else:
                    self._send(404, {"detail": f"unknown path {self.path}"})

            def do_POST(self) -> None:
                if self.path != "/query":
                    self._send(404, {"detail": f"unknown path {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    doc = outer.query(
                        req.get("sql", ""),
                        form=req.get("form", "select"),
                        limit=int(req.get("limit", outer.max_limit)),
                    )
                    self._send(200, doc)
                except Exception as e:  # reference: 400 + detail
                    self._send(400, {"detail": f"Query error: {e}"})

        self.server = ThreadingHTTPServer((host, port), _Handler)
        self._thread: threading.Thread | None = None

    # -- handlers (also callable directly, no HTTP needed) -----------------

    def query(
        self, sql: str, form: str = "select", limit: int | None = None
    ) -> dict[str, Any]:
        if not sql.strip():
            raise ValueError("empty sql")
        if form not in ("select", "ask", "construct"):
            raise ValueError(f"unknown form {form!r}")
        lim = min(limit or self.max_limit, self.max_limit)
        df = self.spark.sql(sql)
        if form == "ask":
            return to_ask_json(df)
        if form == "construct":
            return to_construct_json(df, limit=lim)
        return to_sparql_json(df, limit=lim)

    def health(self) -> dict[str, Any]:
        ok = self.engine.table.exists()
        return {
            "status": "healthy" if ok else "empty",
            "table_version": self.engine.table.snapshot().version if ok else None,
        }

    def stats(self) -> dict[str, Any]:
        snap = self.engine.table.snapshot()
        return {
            "table_version": snap.version,
            "data_files": len(snap.files),
            "committed_batches": len(snap.committed_batches),
            "views": self.views,
        }

    # -- lifecycle ---------------------------------------------------------

    @property
    def port(self) -> int:
        return self.server.server_address[1]

    def start(self) -> "QueryServer":
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
