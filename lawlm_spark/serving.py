"""Serving tier (SURVEY §7 phase 5): the reference chatbot's HTTP
surface (reference: chatbot/app.py routes /health /collection/info
/query /search) re-exposed over the engine's parquet mirror — stdlib
http.server only, no web framework required.

Batch/online split per the SURVEY north star: heavy lifting (ingest,
indexing) is Spark batch; this tier serves single questions by running
the same hybrid-RRF plan over the mirror.  The deterministic fake LLM
answers summaries; a real client plugs in behind `summarize`.

Latency note: each request runs a local Spark job (~1-2 s on the test
mirror).  A production deployment serves the online path from Qdrant
exactly as the reference does (SURVEY §3 E2) and keeps this tier for
batch-parity debugging.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from lawlm_spark.plans.rag import rag_answer
from lawlm_spark.sources.mirror import mirror_stats, scan_mirror


class RagService:
    """Query service over a (chunks, postings) parquet mirror."""

    def __init__(self, spark: SparkSession, chunks_path: str, postings_path: str):
        self.spark = spark
        self.chunks = scan_mirror(spark, chunks_path).cache()
        self.postings = scan_mirror(spark, postings_path).cache()

    def health(self) -> dict:
        return {"status": "healthy", "engine": "lawlm_spark"}

    def collection_info(self) -> dict:
        row = mirror_stats(self.chunks, "point_id").collect()[0]
        return {
            "points_count": row["points_count"],
            "vectors_count": row["vectors_count"],
            "distinct_keys": row["distinct_keys"],
            "status": "green",
        }

    def query(self, question: str, limit: int = 3) -> dict:
        """Reference response shape: app.py:362-369."""
        t0 = time.perf_counter()
        q = self.spark.createDataFrame([(0, question)], "query_id long, question string")
        rows = rag_answer(self.chunks, self.postings, q, k=limit).collect()
        r = rows[0] if rows else None
        return {
            "question": question,
            "summary": r["summary"] if r else "",
            "sources": r["context"].split("\n\n") if r and r["context"] else [],
            "search_type": "hybrid_rrf",
            "documents_found": r["n_sources"] if r else 0,
            "processing_time": round(time.perf_counter() - t0, 3),
        }


def make_handler(service: RagService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet test output
            pass

        def _send(self, payload: dict, code: int = 200) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(service.health())
            elif self.path == "/collection/info":
                self._send(service.collection_info())
            else:
                self._send({"error": "not found"}, 404)

        def do_POST(self):
            if self.path not in ("/query", "/search"):
                self._send({"error": "not found"}, 404)
                return
            n = int(self.headers.get("Content-Length", "0"))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                question = req["question"]
            except (json.JSONDecodeError, KeyError):
                self._send({"error": "body must be JSON with 'question'"}, 400)
                return
            limit = int(req.get("limit", 3))
            self._send(service.query(question, limit))

    return Handler


def serve(service: RagService, port: int = 0) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the HTTP tier on `port` (0 = ephemeral).  Returns (server,
    thread); call server.shutdown() to stop."""
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, thread
