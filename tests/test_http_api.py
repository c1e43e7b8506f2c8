"""HTTP façade end-to-end (http_api.py vs /root/reference/api/main.py):
real sockets, real ResidentSearcher, response-shape + validation +
engine-parity checks against the library SearchAPI."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from chavinha_mini_search_engine_spark.http_api import ResidentHTTPServer


@pytest.fixture(scope="module")
def srv(built):
    s = ResidentHTTPServer(built).start()
    yield s
    s.stop()


def _get(srv, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def _get_err(srv, path):
    try:
        _get(srv, path)
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_search_endpoint_shape_and_parity(spark, built, srv):
    q = "python async programming"
    code, body = _get(
        srv, f"/api/search?q={urllib.parse.quote(q)}&search_type=bm25&limit=5"
    )
    assert code == 200
    assert body["query"] == q
    assert body["search_type"] == "bm25"
    assert body["total_hits"] == len(body["results"]) <= 5
    assert body["results"], "expected hits on the fixture corpus"
    assert set(body["results"][0]) == {
        "id", "url", "title", "snippet", "domain", "relevance", "doc_type",
    }
    assert body["search_time_ms"] > 0

    # same ranked (id, relevance) list as the library facade over the same
    # store (SearchAPI drives the Spark engine; resident==spark parity is
    # the serve suite's invariant, re-checked here over HTTP)
    from chavinha_mini_search_engine_spark.api import SearchAPI

    lib = SearchAPI(spark, built).search(q, "bm25", 5)
    assert [(r["id"], round(r["relevance"], 9)) for r in body["results"]] == [
        (r.id, round(r.relevance, 9)) for r in lib.results
    ]


def test_search_validation_http_codes(srv):
    for path, frag in [
        ("/api/search?q=", "empty"),                         # main.py:556
        ("/api/search?q=x&search_type=fuzzy", "Invalid"),    # main.py:558
        ("/api/search?q=x&limit=0", "limit"),
        ("/api/search?q=x&limit=51", "limit"),
        ("/api/search?q=x&performance_mode=turbo", "performance"),
        ("/api/search?q=x&limit=abc", "integer"),
    ]:
        code, body = _get_err(srv, path)
        assert code == 400, path
        assert frag.lower() in body["detail"].lower(), (path, body)
    code, _ = _get_err(srv, "/nope")
    assert code == 404


def test_all_search_types_over_http(srv):
    for st in ("bm25", "semantic", "hybrid"):
        code, body = _get(
            srv, f"/api/search?q=python&search_type={st}&limit=3"
        )
        assert code == 200
        assert body["search_type"] == st


def test_stats_endpoint(spark, built, srv):
    code, body = _get(srv, "/api/stats")
    assert code == 200
    assert body["total_documents"] == built.read(spark, "docs").count()
    assert body["total_documents"] == sum(
        d["document_count"] for d in body["domains"]
    )
    counts = [d["document_count"] for d in body["domains"]]
    assert counts == sorted(counts, reverse=True)


def test_health_endpoint(srv):
    code, body = _get(srv, "/health")
    assert code == 200
    assert body["status"] == "healthy"
    assert body["api"] == "up" and body["backend"] == "up"
    assert body["shards_resident"] > 0
