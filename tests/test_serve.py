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


@pytest.mark.slow
def test_hybrid_two_phase_degenerate_parity(spark, tmp_path_factory):
    """The two-phase hybrid exit (rank by the cheap bound, exact-blend a
    candidate prefix, extend until the next bound is below the k-th exact
    deduped score) must be LOSSLESS.  A single-shard build with >256
    matches for a corpus-wide term forces the chunked path (chunk =
    max(4k, 256)); results must equal the exhaustive oracle exactly."""
    import collections

    import numpy as np

    from chavinha_mini_search_engine_spark.fixtures.pages import generate_pages
    from chavinha_mini_search_engine_spark.functions.tokenizer import tokenize_py
    from chavinha_mini_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
    )
    from chavinha_mini_search_engine_spark.oracle.scorer import OracleIndex
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    cfg = IndexConfig(num_doc_shards=1, shard_groups=1, heavy_term_df=100,
                      num_salts=2, term_buckets=8)
    rows = generate_pages(400, include_edges=False)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages_dir = str(tmp_path_factory.mktemp("tp") / "pages")
    spark.createDataFrame(rows, schema).write.parquet(pages_dir)
    store = IndexStore(str(tmp_path_factory.mktemp("tp") / "i"), build_id="tp")
    build_index(spark, spark.read.parquet(pages_dir), store, cfg,
                with_embeddings=True, verify_text_invariant=False)

    # the most frequent token = the closest thing to a match-everything
    # stopword in the synthetic corpus
    df_count = collections.Counter()
    for r in rows:
        if r["lang"] == "en":
            df_count.update(set(tokenize_py(r["text"])))
    degenerate_term, df = df_count.most_common(1)[0]
    assert df > 256, "need a term matching >256 docs to force chunking"

    rs = ResidentSearcher(store, cfg)

    def to_odocs(df_):
        out = []
        for r in df_.collect():
            d = r.asDict()
            emb = d.pop("embedding", None)
            d["embedding"] = (
                np.asarray(emb, dtype=np.float32) if emb is not None else None
            )
            out.append(d)
        return out

    oracle = OracleIndex(to_odocs(store.read(spark, "unified")))
    for q in (degenerate_term, f"{degenerate_term} python"):
        for k in (1, 10, 50):
            got = norm(rs.search(q, "hybrid", k))
            exp = sorted(
                ((h["doc_id"], round(h["score"], 9))
                 for h in oracle.search(q, "hybrid", k)),
                key=lambda t: (-t[1], t[0]),
            )
            assert [g[0] for g in got] == [e[0] for e in exp], (q, k)
            for (gid, gs), (_, es) in zip(got, exp):
                assert abs(gs - es) < 1e-8, (q, k, gid, gs, es)


@pytest.mark.parametrize("st,mode", [
    ("bm25", "exact"), ("hybrid", "exact"),
    ("semantic", "exact"), ("semantic", "lsh"),
])
def test_sharded_fanout_matches_single_process(built, resident, st, mode):
    """Content-node decomposition: P=4 shard-subset replicas, each scoring
    a disjoint quarter of the shards (shards=), must produce candidate
    pools whose gateway merge_candidates ranks exactly like one
    all-shards search() -- the scatter/gather layer a cluster deployment
    adds must be a no-op on semantics."""
    P = 4
    replicas = [
        ResidentSearcher(built, CFG,
                         shards=[s for s in range(CFG.num_doc_shards)
                                 if s % P == r])
        for r in range(P)
    ]
    # the replicas must actually hold disjoint shard subsets
    for r, rep in enumerate(replicas):
        assert set(rep.state_by_shard) <= {s for s in range(CFG.num_doc_shards)
                                           if s % P == r}
    gateway = ResidentSearcher(built, CFG, shards=[])
    assert not gateway.state_by_shard  # gateway holds no content shards
    for q in PERF_QUERIES[:3]:
        pools = [rep.search_candidates(q, st, 10, mode) for rep in replicas]
        hits = ResidentSearcher.merge_candidates(pools, 10)
        from chavinha_mini_search_engine_spark.operators.search import _query_terms
        got = norm(gateway._enrich(hits, _query_terms(q)))
        exp = norm(resident.search(q, st, 10, semantic_mode=mode))
        assert got == exp, (st, mode, q, got, exp)


@pytest.mark.parametrize("st", ["bm25", "hybrid"])
def test_postings_cache_hot_equals_cold(built, engine, st):
    """A FRESH searcher's first pass (cold cache, block-max pruned decode)
    and its second pass (hot PostingsCache, exhaustive cached adds) must
    rank and score identically -- the cache's soundness claim -- and both
    must match the Spark engine."""
    rs = ResidentSearcher(built, CFG)
    for q in PERF_QUERIES[:5]:
        cold = norm(rs.search(q, st, 10))
        hot = norm(rs.search(q, st, 10))
        assert cold == hot, (st, q, cold, hot)
        exp = norm(r.asDict() for r in engine.search(q, st, 10).collect())
        assert [h[0] for h in hot] == [e[0] for e in exp]
        for (_, gs), (_, es) in zip(hot, exp):
            assert abs(gs - es) < 1e-8


def test_postings_cache_eviction_bound():
    import numpy as np

    from chavinha_mini_search_engine_spark.operators.search import PostingsCache

    c = PostingsCache(max_postings=100)
    for i in range(20):
        c.put(("s", "f", f"t{i}"), np.arange(10), np.ones(10))
    assert c._total <= 100
    # newest entries survive, oldest evicted
    assert c.get(("s", "f", "t19")) is not None
    assert c.get(("s", "f", "t0")) is None
