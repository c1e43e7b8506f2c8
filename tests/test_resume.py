"""Checkpoint/resume (SURVEY.md §5.2 test 5, north_rule resumability).

Kill a build mid-postings, restart with the same build_id: completed
stages/shard-groups must be skipped (manifest timestamps untouched) and the
final tables must be identical to an uninterrupted build.
"""

import pytest

from chavinha_mini_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from chavinha_mini_search_engine_spark.sources.tables import IndexStore

CFG = IndexConfig(
    num_doc_shards=8, shard_groups=4, heavy_term_df=40, num_salts=4,
    term_buckets=16,
)


class _Boom(RuntimeError):
    pass


def _collect(store, spark, table, parts=False):
    df = store.read_parts(spark, table) if parts else store.read(spark, table)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())


@pytest.mark.slow
def test_resume_identical(spark, tiny_pages, tmp_path_factory, monkeypatch):
    # serial postings groups: the crash simulation below counts
    # finish_part calls and expects exactly 2 committed parts at the
    # "crash"; under the default concurrent submission (guide §2.6) the
    # other groups' threads would drain before the exception surfaces.
    # Concurrent-mode resume is covered by the unchanged end-state
    # assertions of every other build test.
    monkeypatch.setenv("SPARK_GRAFT_POSTINGS_JOBS", "1")
    pages = spark.read.parquet(tiny_pages)

    # uninterrupted reference build
    a = IndexStore(str(tmp_path_factory.mktemp("ra") / "idx"), build_id="bb")
    build_index(spark, pages, a, CFG, with_embeddings=False)

    # interrupted build: die after the 2nd completed postings shard-group
    b_root = str(tmp_path_factory.mktemp("rb") / "idx")
    b = IndexStore(b_root, build_id="bb")
    orig = IndexStore.finish_part
    calls = {"n": 0}

    def bomb(self, stage, part, metrics=None):
        orig(self, stage, part, metrics)
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Boom()

    IndexStore.finish_part = bomb
    try:
        with pytest.raises(_Boom):
            build_index(spark, pages, b, CFG, with_embeddings=False)
    finally:
        IndexStore.finish_part = orig

    # record what finished before the crash
    b2 = IndexStore(b_root, build_id="bb")  # reload manifest from disk
    done_parts = {
        p: v["finished_ts"]
        for p, v in b2.manifest["stages"]["postings"].get("parts", {}).items()
        if v.get("status") == "done"
    }
    assert len(done_parts) == 2
    docs_ts = b2.manifest["stages"]["docs"]["finished_ts"]

    # resume
    build_index(spark, pages, b2, CFG, with_embeddings=False)

    # completed work was skipped, not redone
    assert b2.manifest["stages"]["docs"]["finished_ts"] == docs_ts
    for p, ts in done_parts.items():
        assert b2.manifest["stages"]["postings"]["parts"][p]["finished_ts"] == ts

    # outputs identical to the uninterrupted build
    for table, parts in [
        ("unified", False), ("term_dict", False), ("corpus_stats", False),
        ("doclens", False), ("postings", True), ("attributes", False),
    ]:
        assert _collect(a, spark, table, parts) == _collect(b2, spark, table, parts), table
