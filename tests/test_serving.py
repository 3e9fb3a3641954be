"""Phase-5 serving tier: reference route parity over the mirror."""

from __future__ import annotations

import json
import tempfile
import urllib.request

import pytest

from lawlm_spark.plans.rag import ingest_documents
from lawlm_spark.serving import RagService, serve
from lawlm_spark.sources.mirror import write_mirror


@pytest.fixture(scope="module")
def server(spark, docs):
    chunks, postings = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    base = tempfile.mkdtemp(prefix="serving_mirror_")
    write_mirror(chunks, base + "/chunks")
    write_mirror(postings, base + "/postings")
    svc = RagService(spark, base + "/chunks", base + "/postings")
    httpd, _ = serve(svc)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health(server):
    assert _get(server + "/health")["status"] == "healthy"


def test_collection_info(server):
    info = _get(server + "/collection/info")
    assert info["points_count"] > 0
    assert info["points_count"] == info["distinct_keys"]


def test_query_route(server):
    out = _post(server + "/query", {"question": "fast table scan join", "limit": 3})
    assert out["search_type"] == "hybrid_rrf"
    assert out["documents_found"] > 0
    assert out["summary"].startswith("[fake-llm ")
    assert len(out["sources"]) <= 3 and out["processing_time"] > 0


def test_bad_request(server):
    req = urllib.request.Request(
        server + "/query", b"not json", {"Content-Type": "application/json"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
