"""Resident serve path (operators/serve.py): rank/score parity with the
Spark SearchEngine, since both share _bm25_shard_kernel -- plus the latency
property the module exists for (no Spark jobs per query)."""

import time

import pytest

from chavinha_mini_search_engine_spark.fixtures.queries import PERF_QUERIES
from chavinha_mini_search_engine_spark.operators.search import SearchEngine
from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher

from tests.parity_cfg import CFG  # noqa: E402


@pytest.fixture(scope="module")
def resident(built):
    return ResidentSearcher(built, CFG)


@pytest.fixture(scope="module")
def engine(spark, built):
    return SearchEngine(spark, built, CFG)


def norm(rows):
    return sorted(
        ((r["id"], round(r["relevance"], 9)) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )


@pytest.mark.parametrize("st", ["bm25", "hybrid", "semantic"])
def test_resident_matches_spark_engine(resident, engine, st):
    for q in PERF_QUERIES[:5]:
        got = norm(resident.search(q, st, 10))
        exp = norm(r.asDict() for r in engine.search(q, st, 10).collect())
        assert [g[0] for g in got] == [e[0] for e in exp], (st, q, got, exp)
        for (gid, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-8, (st, q, gid, gs, es)


def test_resident_semantic_lsh_matches_engine(resident, engine):
    """semantic_mode="lsh" on the resident path must pick exactly the same
    probed-bucket candidates (and scores) as the Spark engine's lsh branch
    -- both derive probes from search.semantic_probes over the build-time
    sem_bucket attribute."""
    for q in PERF_QUERIES[:3]:
        got = norm(resident.search(q, "semantic", 10, semantic_mode="lsh"))
        exp = norm(
            r.asDict()
            for r in engine.search(q, "semantic", 10, semantic_mode="lsh").collect()
        )
        assert [g[0] for g in got] == [e[0] for e in exp], (q, got, exp)
        for (gid, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-8, (q, gid, gs, es)
    with pytest.raises(ValueError):
        resident.search("x", "semantic", 10, semantic_mode="nope")


def test_resident_enrichment_fields(resident):
    rows = resident.search("python async programming", "bm25", 5)
    assert rows and rows[0]["url"].startswith("https://")
    assert all(r["title"] for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_resident_query_is_fast(resident):
    """The point of residency: warm queries answer in milliseconds (the
    reference's resident Vespa server answers in ~10 ms; the Spark path
    pays a ~0.3-0.5 s local-mode scheduling floor per query)."""
    q = "python async programming"
    resident.search(q, "bm25", 10)  # warm
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        resident.search(q, "bm25", 10)
    per_query = (time.perf_counter() - t0) / n
    assert per_query < 0.1, f"resident bm25 query took {per_query * 1e3:.1f} ms"


def test_resident_validation(resident):
    with pytest.raises(ValueError):
        resident.search("x", "bm25", 0)
    with pytest.raises(ValueError):
        resident.search("x", "nope", 10)
