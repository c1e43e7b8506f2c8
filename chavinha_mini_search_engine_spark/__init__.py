"""PySpark-native full-text search engine.

A from-scratch rebuild of the capabilities of
``marco-altran/chavinha-mini-search-engine`` (crawl -> extract -> chunk ->
index -> BM25/semantic/hybrid query) expressed Spark-first:

- DataFrame/SQL for everything relational (tokenize, tf/df/idf, stats, caps,
  dedup) so Catalyst handles pushdown, pruning and whole-stage codegen;
- Arrow-batched pandas UDFs for per-row compute (HTML extraction, chunking,
  embeddings) -- never row-at-a-time Python UDFs;
- two custom partition-level kernels where Spark has no builtin:
  a delta-gap + varbyte posting codec (``applyInPandas``) and a block-max
  WAND top-k scorer (``cogroup().applyInPandas``);
- a document-partitioned index layout (term-partitioned *build*,
  doc-sharded *serve*) so head-term skew is bounded by shard size and a
  1000-executor cluster scans shards in parallel.

Reference semantics are pinned in :mod:`.oracle` (pure Python/numpy, no
Spark) and every Spark operator is tested rank-/byte-identical against it.
"""

__version__ = "0.1.0"
