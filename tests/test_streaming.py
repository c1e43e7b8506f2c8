"""Structured Streaming operators (streaming/incremental.py)."""

import os

import pytest
from pyspark.sql import functions as F

from chavinha_mini_search_engine_spark.fixtures.pages import generate_pages
from chavinha_mini_search_engine_spark.streaming import incremental


@pytest.fixture(scope="module")
def pages_stream_dir(spark, tmp_path_factory):
    """Pages written as multiple files (so the file source micro-batches)."""
    d = str(tmp_path_factory.mktemp("stream") / "pages")
    rows = generate_pages(60, include_edges=False)
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    df.repartition(6).write.parquet(d)
    return d


def test_stream_extract_equals_batch(spark, pages_stream_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sd") / "docs")
    ckpt = str(tmp_path_factory.mktemp("sd") / "ckpt")
    q = incremental.stream_pages_to_docs(spark, pages_stream_dir, out, ckpt)
    q.awaitTermination(300)

    from chavinha_mini_search_engine_spark.operators.extract import extract_docs

    batch = extract_docs(spark.read.parquet(pages_stream_dir))
    got = sorted(
        (r["id"], r["title"], r["content"])
        for r in spark.read.parquet(out).collect()
    )
    exp = sorted((r["id"], r["title"], r["content"]) for r in batch.collect())
    assert got == exp
    assert len(got) > 0


def test_stream_resume_is_incremental(spark, pages_stream_dir, tmp_path_factory):
    """Restarting the stream with the same checkpoint reprocesses nothing."""
    out = str(tmp_path_factory.mktemp("sr") / "docs")
    ckpt = str(tmp_path_factory.mktemp("sr") / "ckpt")
    incremental.stream_pages_to_docs(spark, pages_stream_dir, out, ckpt).awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    # restart: no new files -> no new rows
    incremental.stream_pages_to_docs(spark, pages_stream_dir, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_stream_events_hourly_watermark_semantics(spark, tmp_path_factory):
    """Tumbling window + watermark: in-window late data is counted, data
    older than the watermark is dropped, open windows stay pending.
    Two sequential availableNow runs on one checkpoint give deterministic
    batch order (the file source's intra-run file order is not guaranteed).
    """
    import datetime as dt

    base = tmp_path_factory.mktemp("se")
    src, out, ckpt = str(base / "events"), str(base / "agg"), str(base / "ckpt")

    def ev_rows(specs):
        d = dt.datetime(2025, 8, 1)
        return [
            (i, d.replace(hour=h, minute=m), 1, "click", 1.0, "{}")
            for i, (h, m) in enumerate(specs)
        ]

    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    # run 1: 3 events in h10, 2 in h11 (max ts 11:30 -> watermark 10:30)
    spark.createDataFrame(
        ev_rows([(10, 5), (10, 20), (10, 40), (11, 0), (11, 30)]), schema
    ).coalesce(1).write.mode("append").parquet(src)
    incremental.stream_events_hourly(spark, src, out, ckpt, watermark="1 hour").awaitTermination(300)

    # run 2: h13 events advance the watermark to 12:00; one late-but-in-
    # watermark event (10:45) is counted, one too-late event (09:00) dropped
    spark.createDataFrame(
        ev_rows([(13, 0), (13, 10), (10, 45), (9, 0)]), schema
    ).coalesce(1).write.mode("append").parquet(src)
    incremental.stream_events_hourly(spark, src, out, ckpt, watermark="1 hour").awaitTermination(300)

    got = {
        str(r["hour"]): r["n"] for r in spark.read.parquet(out).collect()
    }
    assert got.get("2025-08-01 10:00:00") == 4, got   # 3 on-time + 1 late
    assert got.get("2025-08-01 11:00:00") == 2, got
    assert "2025-08-01 09:00:00" not in got, got      # dropped as too late
    assert "2025-08-01 13:00:00" not in got, got      # still open (pending)


@pytest.mark.slow
def test_index_deltas_searchable(spark, tmp_path_factory):
    """Base build + MULTIPLE streamed delta micro-batches: new docs become
    searchable, and per-(shard, local_id) layout stays collision-free
    across segments (each batch must offset past base + earlier deltas)."""
    from chavinha_mini_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
    )
    from chavinha_mini_search_engine_spark.operators.search import SearchEngine
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    cfg = IndexConfig(num_doc_shards=4, shard_groups=2, heavy_term_df=1000,
                      num_salts=2, term_buckets=8)
    base_dir = str(tmp_path_factory.mktemp("base") / "pages")
    rows = generate_pages(40, include_edges=False)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    spark.createDataFrame(rows[:30], schema).write.parquet(base_dir)

    store = IndexStore(str(tmp_path_factory.mktemp("bidx") / "i"), build_id="sb")
    build_index(spark, spark.read.parquet(base_dir), store, cfg,
                with_embeddings=True, verify_text_invariant=False)

    delta_dir = str(tmp_path_factory.mktemp("delta") / "pages")
    # 8 files with maxFilesPerTrigger=4 -> at least 2 micro-batches, so the
    # second batch's local_id offsets must account for the first's rows
    spark.createDataFrame(rows[30:], schema).repartition(8).write.parquet(delta_dir)
    q = incremental.stream_index_deltas(
        spark, delta_dir, store, cfg,
        checkpoint_dir=str(tmp_path_factory.mktemp("delta") / "ckpt"),
    )
    q.awaitTermination(600)

    # delta parts exist and the union parses
    parts = os.listdir(store.path("postings"))
    n_delta_parts = sum(1 for p in parts if p.startswith("delta="))
    assert n_delta_parts >= 2, f"need >=2 micro-batches, got {parts}"
    post = store.read_parts(spark, "postings")
    assert post.filter(F.col("term") == "python").count() > 0

    # (shard, local_id) is unique across base + all delta segments
    layout = (
        store.read(spark, "unified").select("shard", "local_id")
        .unionByName(
            store.read_parts(spark, "unified_delta").select("shard", "local_id")
        )
    )
    dup = (
        layout.groupBy("shard", "local_id").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0, "delta segments alias base/delta (shard, local_id) slots"

    # the running per-shard offsets persisted in the manifest must equal
    # the actual layout maxima (so later batches/restarts can skip the
    # full base+delta metadata scan)
    offs = {int(s): int(m) for s, m in store.manifest["stream_offsets"].items()}
    exp_offs = {
        int(r["shard"]): int(r["mx"])
        for r in layout.groupBy("shard").agg(F.max("local_id").alias("mx")).collect()
    }
    assert offs == exp_offs, (offs, exp_offs)

    # /api/stats must count streamed docs too (base docs + delta full_docs)
    from chavinha_mini_search_engine_spark.api import SearchAPI

    api = SearchAPI(spark, store, cfg)
    exp_total = (
        store.read(spark, "docs").count()
        + store.read_parts(spark, "unified_delta")
        .filter(F.col("doc_type") == "full_doc").count()
    )
    st_resp = api.stats()
    assert st_resp.total_documents == exp_total, (
        st_resp.total_documents, exp_total,
    )
    assert sum(d.document_count for d in st_resp.domains) == exp_total

    # a doc only present in the delta is retrievable end-to-end
    import hashlib

    from chavinha_mini_search_engine_spark.functions.tokenizer import tokenize_py

    delta_en = [r for r in rows[30:] if r["lang"] == "en"]
    target = delta_en[0]
    target_id = hashlib.md5(target["url"].encode()).hexdigest()
    # query with terms the BASE dictionary knows (delta postings inherit the
    # base term_dict; brand-new terms enter at compaction -- documented)
    terms = [t for t in tokenize_py(target["text"]) if len(t) > 4][:4]
    assert terms, "delta doc must have tokens"
    eng = SearchEngine(spark, store, cfg, cache=False)
    res = eng.search(" ".join(terms), "bm25", 50)
    ids = [r["id"] for r in res.collect()]
    assert target_id in ids, f"delta doc {target_id} not retrieved"

    # hybrid over base(+embeddings) + deltas(null embeddings) is
    # rank-identical to the oracle (delta docs' semantic arm scores 0.0
    # in both; semantic mode excludes embedding-less chunks in both).
    # Delta postings inherit the BASE corpus stats / idf (the documented
    # Lucene-segment drift, refreshed at compaction), so the oracle over
    # the union is pinned to base-only stats to model the same semantics.
    import numpy as np

    from chavinha_mini_search_engine_spark.oracle.scorer import OracleIndex

    def to_odocs(df):
        out = []
        for r in df.collect():
            d = r.asDict()
            emb = d.pop("embedding", None)
            d["embedding"] = (
                np.asarray(emb, dtype=np.float32) if emb is not None else None
            )
            out.append(d)
        return out

    base_docs_u = store.read(spark, "unified")
    union = base_docs_u.unionByName(store.read_parts(spark, "unified_delta"))
    oracle = OracleIndex(to_odocs(union))
    oracle.stats = OracleIndex(to_odocs(base_docs_u)).stats
    for st in ("hybrid", "semantic"):
        hq = " ".join(terms)
        got = sorted(
            ((r["id"], round(r["relevance"], 9)) for r in eng.search(hq, st, 20).collect()),
            key=lambda t: (-t[1], t[0]),
        )
        exp = sorted(
            ((h["doc_id"], round(h["score"], 9)) for h in oracle.search(hq, st, 20)),
            key=lambda t: (-t[1], t[0]),
        )
        assert [g[0] for g in got] == [e[0] for e in exp], f"{st} ids diverge over deltas"
        for (gid, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-8, f"{st} score drift {gid}: {gs} vs {es}"

    # --- compaction: base + deltas == from-scratch build over the union ---
    from chavinha_mini_search_engine_spark.operators.index_build import compact

    compacted = compact(
        spark, store,
        IndexStore(str(tmp_path_factory.mktemp("cmp") / "i"), build_id="cmp"),
        cfg,
    )
    full_dir = str(tmp_path_factory.mktemp("full") / "pages")
    spark.createDataFrame(rows, schema).write.parquet(full_dir)
    full = IndexStore(str(tmp_path_factory.mktemp("fidx") / "i"), build_id="full")
    build_index(spark, spark.read.parquet(full_dir), full, cfg,
                with_embeddings=False, verify_text_invariant=False)

    def table_rows(st, tbl, parts=False):
        df = st.read_parts(spark, tbl) if parts else st.read(spark, tbl)
        cols = sorted(c for c in df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())

    assert table_rows(compacted, "term_dict") == table_rows(full, "term_dict")
    assert table_rows(compacted, "corpus_stats") == table_rows(full, "corpus_stats")
    assert table_rows(compacted, "postings", parts=True) == table_rows(full, "postings", parts=True)

    eng_c = SearchEngine(spark, compacted, cfg, cache=False)
    eng_f = SearchEngine(spark, full, cfg, cache=False)
    q = " ".join(terms)
    got_c = [(r["id"], round(r["relevance"], 9)) for r in eng_c.search(q, "bm25", 20).collect()]
    got_f = [(r["id"], round(r["relevance"], 9)) for r in eng_f.search(q, "bm25", 20).collect()]
    assert got_c == got_f

    # stats() over a compacted store (no docs table: the document store
    # stays with the base segment) falls back to unified full_doc rows
    from chavinha_mini_search_engine_spark.api import SearchAPI

    s = SearchAPI(spark, compacted, cfg).stats()
    n_en = sum(1 for r in rows if r["lang"] == "en")
    assert s.total_documents == n_en
    assert s.total_documents == sum(d.document_count for d in s.domains)


# --- crash-window recovery (VERDICT r3 "What's wrong" #1) ---


@pytest.fixture(scope="module")
def crash_fixture(spark, tmp_path_factory):
    """A built base index + delta pages, copied per test (each crash test
    mutates its own store root)."""
    from chavinha_mini_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
    )
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    cfg = IndexConfig(num_doc_shards=4, shard_groups=2, heavy_term_df=1000,
                      num_salts=2, term_buckets=8)
    rows = generate_pages(40, include_edges=False)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    base_dir = str(tmp_path_factory.mktemp("cr") / "pages")
    spark.createDataFrame(rows[:28], schema).write.parquet(base_dir)
    root = str(tmp_path_factory.mktemp("cr") / "idx")
    store = IndexStore(root, build_id="crash-base")
    build_index(spark, spark.read.parquet(base_dir), store, cfg,
                with_embeddings=False, verify_text_invariant=False)
    delta_dir = str(tmp_path_factory.mktemp("cr") / "delta")
    # 8 files, maxFilesPerTrigger=4 -> 2 micro-batches
    spark.createDataFrame(rows[28:], schema).repartition(8).write.parquet(delta_dir)
    return cfg, rows, root, delta_dir


def _copy_store(src_root, tmp_path_factory):
    import shutil

    dst = str(tmp_path_factory.mktemp("crcopy") / "idx")
    shutil.copytree(src_root, dst)
    return dst


def _delta_fulldoc_ids(spark, store):
    return [
        r["id"]
        for r in store.read_parts(spark, "unified_delta")
        .filter(F.col("doc_type") == "full_doc").select("id").collect()
    ]


@pytest.mark.slow
def test_stream_crash_before_manifest_commit_heals(spark, crash_fixture,
                                                   tmp_path_factory):
    """Crash between the delta segment writes and the manifest commit:
    the orphan segment must never be served, the replayed batch must not
    alias its (shard, local_id) slots, and restart must self-heal."""
    import hashlib

    from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    cfg, rows, src_root, delta_dir = crash_fixture
    root = _copy_store(src_root, tmp_path_factory)
    store = IndexStore(root)
    ckpt = str(tmp_path_factory.mktemp("crc") / "ckpt")

    orig = IndexStore.finish_part

    def bomb(self, stage, part, metrics=None):
        if stage == "stream_deltas":
            raise RuntimeError("simulated crash before manifest commit")
        return orig(self, stage, part, metrics)

    IndexStore.finish_part = bomb
    try:
        q = incremental.stream_index_deltas(spark, delta_dir, store, cfg,
                                            checkpoint_dir=ckpt)
        with pytest.raises(Exception):
            q.awaitTermination(600)
    finally:
        IndexStore.finish_part = orig

    # fresh handle = what a restarted process sees (disk manifest)
    store2 = IndexStore(root)
    orphans = store2.orphan_parts("unified_delta")
    assert orphans, "crash run must leave an uncommitted on-disk segment"
    # the orphan is invisible to every read path
    assert not store2.has_parts("unified_delta")
    assert store2.committed_parts("postings") == [
        p for p in store2.list_parts("postings") if p.startswith("grp=")
    ]

    # restart with the same checkpoint: orphans GC'd, batches replayed
    q = incremental.stream_index_deltas(spark, delta_dir, store2, cfg,
                                        checkpoint_dir=ckpt)
    q.awaitTermination(600)

    for tbl in ("postings", "attributes_delta", "unified_delta"):
        assert store2.orphan_parts(tbl) == [], tbl

    # no (shard, local_id) aliasing across base + committed deltas
    layout = (
        store2.read(spark, "unified").select("shard", "local_id")
        .unionByName(
            store2.read_parts(spark, "unified_delta").select("shard", "local_id")
        )
    )
    dup = (layout.groupBy("shard", "local_id").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0, "replay aliased the orphan segment's slots"

    # every delta doc present EXACTLY once (no loss, no duplication)
    exp_ids = sorted(
        hashlib.md5(r["url"].encode()).hexdigest()
        for r in rows[28:] if r["lang"] == "en"
    )
    assert sorted(_delta_fulldoc_ids(spark, store2)) == exp_ids

    # persisted offsets equal the true maxima again
    offs = {int(s): int(m)
            for s, m in store2.manifest["stream_offsets"].items()}
    exp_offs = {
        int(r["shard"]): int(r["mx"])
        for r in layout.groupBy("shard").agg(F.max("local_id").alias("mx")).collect()
    }
    assert offs == exp_offs

    # the positional resident kernel loads and retrieves a delta doc
    from chavinha_mini_search_engine_spark.functions.tokenizer import tokenize_py

    target = next(r for r in rows[28:] if r["lang"] == "en")
    target_id = hashlib.md5(target["url"].encode()).hexdigest()
    terms = [t for t in tokenize_py(target["text"]) if len(t) > 4][:4]
    rs = ResidentSearcher(store2, cfg)
    ids = [h["id"] for h in rs.search(" ".join(terms), "bm25", 50)]
    assert target_id in ids


@pytest.mark.slow
def test_stream_crash_after_manifest_commit_is_idempotent(spark, crash_fixture,
                                                          tmp_path_factory):
    """Crash AFTER the manifest commit but before the stream checkpoint
    commit: the replayed micro-batch must recognize its own committed
    segment (stream_id+batch_id) and skip, not double-write the docs."""
    import hashlib

    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    cfg, rows, src_root, delta_dir = crash_fixture
    root = _copy_store(src_root, tmp_path_factory)
    store = IndexStore(root)
    ckpt = str(tmp_path_factory.mktemp("cri") / "ckpt")

    orig = IndexStore.finish_part
    fired = []

    def bomb_after(self, stage, part, metrics=None):
        out = orig(self, stage, part, metrics)
        if stage == "stream_deltas" and not fired:
            fired.append(part)
            raise RuntimeError("simulated crash after manifest commit")
        return out

    IndexStore.finish_part = bomb_after
    try:
        q = incremental.stream_index_deltas(spark, delta_dir, store, cfg,
                                            checkpoint_dir=ckpt)
        with pytest.raises(Exception):
            q.awaitTermination(600)
    finally:
        IndexStore.finish_part = orig

    store2 = IndexStore(root)
    n_committed_before = len(store2.committed_parts("unified_delta"))
    assert n_committed_before == 1

    q = incremental.stream_index_deltas(spark, delta_dir, store2, cfg,
                                        checkpoint_dir=ckpt)
    q.awaitTermination(600)

    # batch 0 was skipped on replay (its segment already committed);
    # batch 1 added exactly one more segment; zero duplicate docs
    ids = _delta_fulldoc_ids(spark, store2)
    assert len(ids) == len(set(ids)), "replay double-wrote a committed batch"
    exp_ids = sorted(
        hashlib.md5(r["url"].encode()).hexdigest()
        for r in rows[28:] if r["lang"] == "en"
    )
    assert sorted(ids) == exp_ids
    assert store2.orphan_parts("unified_delta") == []


@pytest.mark.slow
def test_tiered_compaction_matches_full_rebuild(spark, tmp_path_factory):
    """compact_tiered (run/block-grain merge, NO re-tokenize) must serve
    rank- and score-identically to compact (full re-pipeline) over the
    same base + streamed deltas, with an identical dictionary and corpus
    stats (verdict-r4 task 4)."""
    import time as _time

    from chavinha_mini_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
        compact,
        compact_tiered,
    )
    from chavinha_mini_search_engine_spark.operators.search import SearchEngine
    from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    cfg = IndexConfig(num_doc_shards=4, shard_groups=2, heavy_term_df=1000,
                      num_salts=2, term_buckets=8)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    rows = generate_pages(50, include_edges=False)
    base_dir = str(tmp_path_factory.mktemp("tc_base") / "pages")
    spark.createDataFrame(rows[:30], schema).write.parquet(base_dir)
    store = IndexStore(str(tmp_path_factory.mktemp("tc_bidx") / "i"), build_id="tcb")
    build_index(spark, spark.read.parquet(base_dir), store, cfg,
                with_embeddings=False, verify_text_invariant=False)

    delta_dir = str(tmp_path_factory.mktemp("tc_delta") / "pages")
    spark.createDataFrame(rows[30:], schema).repartition(8).write.parquet(delta_dir)
    incremental.stream_index_deltas(
        spark, delta_dir, store, cfg,
        checkpoint_dir=str(tmp_path_factory.mktemp("tc_ck") / "ckpt"),
    ).awaitTermination(600)
    assert any(
        p.startswith("delta=") for p in store.committed_parts("postings")
    ), "fixture must produce delta segments"

    t = _time.time()
    tiered = compact_tiered(
        spark, store,
        IndexStore(str(tmp_path_factory.mktemp("tc_t") / "i"), build_id="tct"),
        cfg,
    )
    tiered_wall = _time.time() - t
    t = _time.time()
    full = compact(
        spark, store,
        IndexStore(str(tmp_path_factory.mktemp("tc_f") / "i"), build_id="tcf"),
        cfg,
    )
    full_wall = _time.time() - t

    # dictionary + stats identical (df summed from delta block counts must
    # equal a recount; avgdl/n_docs re-derived from attribute lengths must
    # equal a re-tokenize)
    def rows_of(st, tbl):
        df = st.read(spark, tbl)
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())

    assert rows_of(tiered, "term_dict") == rows_of(full, "term_dict")
    assert rows_of(tiered, "corpus_stats") == rows_of(full, "corpus_stats")
    assert tiered.manifest.get("compaction") == "tiered"

    # block wellformedness on the re-tiled postings
    bl = tiered.read_parts(spark, "postings")
    assert bl.filter(F.col("n") > cfg.block_size).count() == 0
    assert bl.filter(F.col("first_local") > F.col("last_local")).count() == 0

    # serve parity: every query class, both serve paths
    from chavinha_mini_search_engine_spark.functions.tokenizer import tokenize_py

    qs = []
    for r in rows:
        ts = [t for t in tokenize_py(r["text"]) if len(t) > 3][:3]
        if ts:
            qs.append(" ".join(ts))
        if len(qs) >= 5:
            break
    eng_t = SearchEngine(spark, tiered, cfg, cache=False)
    eng_f = SearchEngine(spark, full, cfg, cache=False)
    rs_t = ResidentSearcher(tiered, cfg)
    rs_f = ResidentSearcher(full, cfg)
    for q in qs:
        got = [(r["id"], round(r["relevance"], 9))
               for r in eng_t.search(q, "bm25", 20).collect()]
        exp = [(r["id"], round(r["relevance"], 9))
               for r in eng_f.search(q, "bm25", 20).collect()]
        assert got == exp, f"spark-path divergence for {q!r}"
        rgot = [(h["id"], round(h["relevance"], 9)) for h in rs_t.search(q, "bm25", 20)]
        rexp = [(h["id"], round(h["relevance"], 9)) for h in rs_f.search(q, "bm25", 20)]
        assert rgot == rexp == got, f"resident-path divergence for {q!r}"

    # the whole point: tiered skips extract/chunk/tokenize -- even at toy
    # scale where fixed per-stage costs dominate it must not be slower
    assert tiered_wall < full_wall * 1.5, (tiered_wall, full_wall)
