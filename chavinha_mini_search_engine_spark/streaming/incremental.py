"""Structured Streaming: incremental ingest + index deltas + windowed aggs.

The reference has no stream processor -- its incremental semantics are a
resumable crawl loop and a full re-index (SURVEY.md §2.11).  The rebuild
expresses the same capabilities Spark-first:

- ``stream_pages_to_docs``: continuous ingest of new pages (file source) ->
  the SAME Arrow extraction kernel as batch (mapInPandas works unchanged in
  Structured Streaming) -> append sink.  Exactly-once via the stream
  checkpoint; restart resumes from the last committed micro-batch -- the
  streaming twin of the crawler's state file (doc_scraper.py:237-291).
- ``stream_index_deltas``: foreachBatch turns each micro-batch of new pages
  into a posting-list DELTA segment (same block format, written under
  postings/delta=<epoch>_<batch_id>/).  The serve path (IndexStore.
  read_parts) unions base + deltas automatically -- the Lucene-segment
  pattern.  Deltas inherit the BASE build's corpus stats (idf/avgdl), so
  scores drift as the corpus grows; ``compact`` (a full rebuild from
  pages) refreshes stats -- the documented Lucene/Vespa tradeoff.
- ``stream_events_hourly``: event-time tumbling window + watermark -- the
  streaming twin of the batch ``events_hourly`` query the DuckDB oracle
  gates.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..fixtures.pages import PAGES_DDL_COLUMNS
from ..operators.extract import DOCS_SCHEMA, _extract_batches
from ..sources.tables import DOC_STORE_WRITE_OPTS, IndexStore


def stream_pages_to_docs(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source stream of pages -> extracted docs (append parquet sink)."""
    src = (
        spark.readStream.schema(PAGES_DDL_COLUMNS)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    docs = (
        src.filter(F.col("lang") == "en")
        .select("url", "warc_ts", "html")
        .mapInPandas(_extract_batches, schema=DOCS_SCHEMA)
    )
    writer = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_index_deltas(
    spark: SparkSession,
    pages_dir: str,
    store: IndexStore,
    cfg: Optional[IndexConfig] = None,
    checkpoint_dir: Optional[str] = None,
    available_now: bool = True,
):
    """Micro-batches of new pages -> posting delta segments in ``store``.

    Requires a completed base build in ``store`` (corpus stats + dictionary
    are reused for delta scoring).  Each batch appends
    postings/delta=<epoch>_<bid> and attributes/delta=... parts.
    """
    cfg = cfg or IndexConfig()
    from ..operators.chunk import chunk_docs
    from ..operators.extract import extract_docs
    from ..operators.index_build import (
        attributes,
        build_postings_for,
        tokenize_tf,
        unified_corpus,
    )

    stats = store.read(spark, "corpus_stats")
    tdict = store.read(spark, "term_dict")
    epoch = int(time.time())
    # a stable id for this (store, checkpoint) stream lineage: lets a
    # replayed micro-batch recognize its own already-committed segment
    # (crash between manifest commit and checkpoint commit) without
    # colliding with batch ids from a DIFFERENT checkpoint generation
    import hashlib

    stream_id = (
        hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]
        if checkpoint_dir else None
    )

    # Crash hygiene BEFORE trusting the persisted offsets: a writer that
    # died between the segment writes and the manifest commit left orphan
    # delta parts on disk that (a) the read paths must never union --
    # they'd alias the retry segment's (shard, local_id) slots -- and
    # (b) the stale manifest offsets know nothing about.  Their batch was
    # never checkpoint-committed either, so the source will replay it:
    # removing them is a pure self-heal (the Iceberg uncommitted-data-file
    # analog).  Steady state: zero orphans, one listdir per table.
    gc = store.gc_orphan_parts(["postings", "attributes_delta", "unified_delta"])
    if gc:
        print(f"stream_index_deltas: removed orphan uncommitted parts {gc}")

    def _current_offsets() -> dict:
        """Per-shard max local_id across base + ALL existing segments: a
        batch's local_id range must start past every previously written
        segment, or two deltas would alias the same (shard, local_id) and
        the serve kernel -- which indexes its accumulator positionally --
        would conflate distinct documents.

        The running offsets are PERSISTED in the manifest after each batch
        (``stream_offsets``), so steady-state micro-batches pay one
        manifest read instead of a full metadata scan of base + all deltas
        (which at a large base is a full-table pass per batch).  The scan
        remains the first-use fallback -- and the authority whenever the
        manifest carries no offsets, e.g. a store streamed into by an
        older build.  Defense in depth vs the crash window the persisted
        offsets opened: any delta part on disk but NOT manifest-committed
        (normally none -- GC'd at stream start) gets its maxima folded in
        so a retry can never alias it."""
        saved = store.manifest.get("stream_offsets")
        if saved is not None:
            offs = {int(s): int(m) for s, m in saved.items()}
            orphans = store.orphan_parts("unified_delta")
            for part in orphans:
                for r in (
                    spark.read.parquet(store.path("unified_delta", part))
                    .groupBy("shard").agg(F.max("local_id").alias("mx"))
                    .collect()
                ):
                    s = int(r["shard"])
                    offs[s] = max(offs.get(s, -1), int(r["mx"]))
            return offs
        seen = store.read(spark, "unified").select("shard", "local_id")
        if store.has_parts("unified_delta"):
            seen = seen.unionByName(
                store.read_parts(spark, "unified_delta").select("shard", "local_id")
            )
        return {
            int(r["shard"]): int(r["max_local"])
            for r in seen.groupBy("shard")
            .agg(F.max("local_id").alias("max_local"))
            .collect()
        }

    def _already_committed(batch_id: int) -> bool:
        """True iff THIS stream lineage already committed this micro-batch
        (crash after manifest commit, before checkpoint commit).  Keyed on
        (stream_id, batch_id): bare batch ids restart at 0 per checkpoint
        generation, so they alone cannot identify a batch."""
        if stream_id is None:
            return False
        parts = store.manifest["stages"].get("stream_deltas", {}).get("parts", {})
        return any(
            p.get("status") == "done"
            and p.get("metrics", {}).get("stream_id") == stream_id
            and p.get("metrics", {}).get("batch_id") == batch_id
            for p in parts.values()
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _already_committed(batch_id):
            return
        docs = extract_docs(batch_df).withColumn(
            "content_embedding", F.lit(None).cast("array<float>")
        )
        chunks = chunk_docs(docs).withColumn(
            "chunk_embedding", F.lit(None).cast("array<float>")
        )
        u = unified_corpus(docs, chunks, cfg)
        # shift local ids past every already-written segment's ids per shard
        # so delta postings never collide with base or earlier-delta postings
        offs = _current_offsets()
        offs_df = spark.createDataFrame(
            list(offs.items()) or [], "shard int, max_local long"
        )
        u = (
            u.join(F.broadcast(offs_df), "shard", "left")
            .withColumn(
                "local_id",
                F.col("local_id") + F.coalesce(F.col("max_local") + 1, F.lit(0)),
            )
            .drop("max_local")
        )
        part = f"delta={epoch}_{batch_id}"
        tf = tokenize_tf(u, cfg)
        blocks = build_postings_for(tf, tdict, stats, cfg)
        store.write(blocks, "postings", part=part, partition_by=["tbucket"])
        store.write(attributes(u, cfg, tf=tf), "attributes_delta", part=part)
        store.write(u, "unified_delta", part=part,
                    options=DOC_STORE_WRITE_OPTS)
        # fold this batch's maxima into the running offsets (the batch is
        # small, so this agg is over the micro-batch only) and persist them
        # with the segment commit
        batch_max = (
            store.read(spark, "unified_delta", part=part)
            .groupBy("shard").agg(F.max("local_id").alias("max_local"))
            .collect()
        )
        for r in batch_max:
            s = int(r["shard"])
            offs[s] = max(offs.get(s, -1), int(r["max_local"]))
        store.manifest["stream_offsets"] = {str(s): m for s, m in offs.items()}
        store.finish_part(
            "stream_deltas", part,
            {"batch_id": batch_id, "stream_id": stream_id},
        )

    src = (
        spark.readStream.schema(PAGES_DDL_COLUMNS)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    writer = src.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Event-time tumbling 1h window with late-data watermark -- streaming
    twin of the gated batch query (__spark_entry__._q_events_hourly)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        # small triggers so the watermark advances across micro-batches
        # (append mode emits a window only once the watermark passes it)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
