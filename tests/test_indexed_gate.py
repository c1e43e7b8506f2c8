"""The driver-gate shape for the INDEXED engine (bm25_topk_indexed):
build_index_from_docs over the plain-text documents table, answer through
SearchEngine, and cross-check against (a) the independent DataFrame-scan
scorer and (b) the in-process ResidentSearcher.

The real driver gate runs the DuckDB twin (_BM25_INDEXED_SQL); this test
pins the same equivalence in-suite so a regression is caught before the
round's CORRECTNESS record.
"""

import pytest
from pyspark.sql import functions as F

from chavinha_mini_search_engine_spark.config import BM25_FULL_WEIGHTS, IndexConfig
from chavinha_mini_search_engine_spark.operators import bm25_df
from chavinha_mini_search_engine_spark.operators.index_build import (
    build_index_from_docs,
)
from chavinha_mini_search_engine_spark.operators.search import SearchEngine
from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher
from chavinha_mini_search_engine_spark.sources.tables import IndexStore

SF = "/root/testdata/sf0.001"
QUERY = "spark hash join table"


@pytest.fixture(scope="module")
def docs_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "docs_idx")
    store = IndexStore(root, build_id="test-docs-idx")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select(
            F.format_string("%012d", F.col("doc_id")).alias("id"),
            F.col("text").alias("content"),
            F.col("source").alias("domain"),
        )
    )
    cfg = IndexConfig(
        num_doc_shards=4, term_buckets=4, encode_buckets=2, shard_groups=2
    )
    build_index_from_docs(spark, docs, store, cfg)
    return store


def test_engine_matches_dataframe_scan(spark, docs_store):
    eng = SearchEngine(spark, docs_store)
    got = [
        (int(r["id"]), r["relevance"])
        for r in eng.search(QUERY, "bm25", k=10).collect()
    ]
    w = BM25_FULL_WEIGHTS["content"]
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_df.bm25_topk_df(
            spark.read.parquet(f"{SF}/documents.parquet")
            .filter(F.col("lang") == "en")
            .withColumn("doc_id", F.col("doc_id")),
            QUERY,
            k=10,
        )
        .select("doc_id", (F.col("score") * w).alias("score"))
        .collect()
    ]
    assert [g[0] for g in got] == [x[0] for x in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


def test_resident_matches_engine(spark, docs_store):
    eng = SearchEngine(spark, docs_store)
    spark_rows = [
        (r["id"], round(r["relevance"], 9))
        for r in eng.search(QUERY, "bm25", k=10).collect()
    ]
    res_rows = [
        (h["id"], round(h["relevance"], 9))
        for h in ResidentSearcher(docs_store).search(QUERY, "bm25", k=10)
    ]
    assert res_rows == spark_rows


def test_build_from_docs_resumes_noop(spark, docs_store):
    # a second call over the same store skips every stage via the manifest
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.format_string("%012d", F.col("doc_id")).alias("id"),
        F.col("text").alias("content"),
    )
    import copy

    before = copy.deepcopy(docs_store.manifest["stages"])
    build_index_from_docs(spark, docs, docs_store)
    after = docs_store.manifest["stages"]
    for stage, rec in before.items():
        assert after[stage]["status"] == "done"
        if rec.get("parts"):
            # part-checkpointed stages (postings) restamp the stage wrapper
            # but must skip every part
            for part, prec in rec["parts"].items():
                assert (
                    after[stage]["parts"][part].get("finished_ts")
                    == prec.get("finished_ts")
                ), (stage, part)
        else:
            assert after[stage].get("finished_ts") == rec.get("finished_ts"), stage
