"""Inverted-index build pipeline (SURVEY.md T1-T7, §3.2).

pages -> docs -> chunks -> unified corpus -> tf/df/length stats ->
salted posting encode -> multi-way merge -> postings + term_dict +
corpus_stats + attributes, all checkpointed per stage (and per shard-group
for the postings stage) through the IndexStore manifest.

Scale design (the part that must survive 10^12 docs):

- **Document-partitioned serve layout** (like Lucene segments / Vespa
  content nodes): every doc lands in one of ``num_doc_shards`` shards
  (hash of id) with a dense ``local_id``; posting lists are built per
  (field, term, shard).  A head term's global posting list is therefore
  *structurally* split across shards -- no single task ever holds a full
  web-scale stopword list.
- **Explicit skew handling inside a shard** (north_rule): within one shard
  a term whose df exceeds ``cfg.heavy_term_df`` is salted into
  ``cfg.num_salts`` sub-runs encoded independently (T6), then multi-way
  merged into final blocks by a second ``applyInPandas`` pass (T7).  AQE
  cannot split a single hot groupBy key; this can.
- **All relational steps are DataFrame ops**: tokenize = split/filter
  (whole-stage codegen), tf = hash aggregate with map-side partial
  aggregation, df/idf = second hash aggregate, stats = tiny agg.  Python
  touches only the two kernels (encode, merge) via Arrow.
- **Shuffles**: (1) unified repartition by shard for local_id assignment,
  (2) tf groupBy (doc-keyed -- skew-free), (3) df groupBy(term),
  (4) encode groupBy(field,term,shard,salt) -- skew-bounded by
  heavy_term_df, (5) merge groupBy(field,term,shard) -- input is already
  run-compressed, tiny.  Nothing shuffles raw HTML.
- **Postings layout**: flat block rows partitioned by tbucket =
  hash(term) % term_buckets -> query-time partition pruning reads only the
  buckets of the query's terms.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.codec import delta_encode, varbyte_encode
from ..functions.tokenizer import tokens_col
from ..sources.tables import DOC_STORE_WRITE_OPTS, IndexStore
from .chunk import chunk_docs
from .embed import embed_chunks, embed_docs
from .extract import extract_docs

UNIFIED_COLS = [
    "id", "doc_type", "parent_id", "url", "domain", "title", "content",
    "description", "chunk_content", "parent_doc_type",
]

RUN_SCHEMA = (
    "field string, term string, shard int, n long, "
    "doc_bytes binary, tf_bytes binary, score_bytes binary"
)

RUN_SCHEMA_TID = (
    "tid long, shard int, n long, "
    "doc_bytes binary, tf_bytes binary, score_bytes binary"
)

# mapside partial runs: per-posting payload is (gap, tf, dl) -- all
# varbyte, ~3-4 B/posting -- instead of (gap, tf, f64 score) ~10-11 B.
# fidx indexes cfg.fields (tid = xxhash64(field, term) pins one field per
# tid, so fidx is constant per segment); the merge kernel recomputes the
# idf-free tf-norm from (tf, dl) and idf re-attaches at block grain.
RUN_SCHEMA_DL = (
    "tid long, shard int, fidx tinyint, n long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary"
)

POSTINGS_SCHEMA_TFNORM = (
    "tid long, shard int, block_idx int, first_local long, "
    "last_local long, n int, max_tfnorm double, doc_bytes binary, tf_bytes binary"
)

POSTINGS_SCHEMA_TID = (
    "tid long, shard int, block_idx int, first_local long, "
    "last_local long, n int, max_score double, doc_bytes binary, tf_bytes binary"
)

POSTINGS_SCHEMA = (
    "field string, term string, shard int, block_idx int, first_local long, "
    "last_local long, n int, max_score double, doc_bytes binary, tf_bytes binary"
)


def tbucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def fidx_col(cfg: "IndexConfig"):
    """Dense tinyint field index (position in cfg.fields) from the string
    ``field`` column -- the int stand-in the posting-grain paths carry so
    parquet scans can prune the string columns entirely."""
    return F.coalesce(*[
        F.when(F.col("field") == f, F.lit(i))
        for i, f in enumerate(cfg.fields)
    ]).cast("tinyint")


def field_col(cfg: "IndexConfig"):
    """Inverse of fidx_col: re-materialize the field STRING from the dense
    ``fidx`` tinyint.  Used only where the string is semantically required
    (the term-id hash, the vocab-grain dictionary) -- the posting-grain
    tables themselves never store it (tokenize_tf docstring)."""
    return F.element_at(
        F.array(*[F.lit(f) for f in cfg.fields]),
        F.col("fidx").cast("int") + 1,
    )


# ---------- kernels ----------
#
# Both kernels process MANY (field, term) segments per invocation: tasks are
# keyed by (shard, ekey/mkey) hash buckets, not by term, so Python/pandas
# per-group overhead is amortized over hundreds of terms while memory per
# task stays bounded (non-heavy rows are 1/E of a shard; heavy-term rows are
# additionally split across `num_salts` tasks by the salt column).


def _encode_runs_many(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (shard, ekey, salt) bucket -> one compressed sorted run per
    (field, term) segment found in it."""
    shard = int(pdf["shard"].iloc[0])
    f = pdf["field"].values.astype(object)
    t = pdf["term"].values.astype(object)
    lid = pdf["local_id"].values.astype(np.int64)
    tf = pdf["tf"].values.astype(np.int64)
    sc = pdf["score"].values.astype(np.float64)
    # sort by (field, term, local_id): factorize strings -> lexsort ints
    fcodes, _ = pd.factorize(f, sort=True)
    tcodes, _ = pd.factorize(t, sort=True)
    order = np.lexsort((lid, tcodes, fcodes))
    f, t, lid, tf, sc = f[order], t[order], lid[order], tf[order], sc[order]
    fc, tc = fcodes[order], tcodes[order]
    seg = np.flatnonzero(np.diff(fc) | np.diff(tc))
    starts = np.concatenate(([0], seg + 1))
    ends = np.concatenate((seg + 1, [len(f)]))
    rows = {k: [] for k in (
        "field", "term", "shard", "n", "doc_bytes", "tf_bytes", "score_bytes",
    )}
    for s, e in zip(starts, ends):
        rows["field"].append(f[s])
        rows["term"].append(t[s])
        rows["shard"].append(shard)
        rows["n"].append(int(e - s))
        rows["doc_bytes"].append(delta_encode(lid[s:e].astype(np.uint64)))
        rows["tf_bytes"].append(varbyte_encode(tf[s:e].astype(np.uint64)))
        rows["score_bytes"].append(sc[s:e].tobytes())
    return pd.DataFrame(rows)


def _encode_runs_many_tid(pdf: pd.DataFrame) -> pd.DataFrame:
    """Integer-keyed twin of _encode_runs_many: one (shard, ekey, salt)
    bucket -> one compressed sorted run per ``tid`` segment.  The shuffle
    rows carry an 8-byte term id instead of the (field, term) strings --
    at web-scale vocab that is the dominant share of encode-shuffle bytes
    (strings re-attach at block granularity after the merge, ~1/block_size
    the rows)."""
    shard = int(pdf["shard"].iloc[0])
    tid = pdf["tid"].values.astype(np.int64)
    lid = pdf["local_id"].values.astype(np.int64)
    tf = pdf["tf"].values.astype(np.int64)
    sc = pdf["score"].values.astype(np.float64)
    order = np.lexsort((lid, tid))
    tid, lid, tf, sc = tid[order], lid[order], tf[order], sc[order]
    seg = np.flatnonzero(np.diff(tid))
    starts = np.concatenate(([0], seg + 1))
    ends = np.concatenate((seg + 1, [len(tid)]))
    rows = {k: [] for k in (
        "tid", "shard", "n", "doc_bytes", "tf_bytes", "score_bytes",
    )}
    for s, e in zip(starts, ends):
        rows["tid"].append(int(tid[s]))
        rows["shard"].append(shard)
        rows["n"].append(int(e - s))
        rows["doc_bytes"].append(delta_encode(lid[s:e].astype(np.uint64)))
        rows["tf_bytes"].append(varbyte_encode(tf[s:e].astype(np.uint64)))
        rows["score_bytes"].append(sc[s:e].tobytes())
    return pd.DataFrame(rows)


def _encode_partial_runs(batches):
    """mapInPandas kernel: NARROW (shuffle-free) partial-run encoding.

    Accumulates input batches to ~1.5M-row chunks, then emits one
    compressed sorted run per (shard, tid) segment found in the chunk.
    Unlike the salted encode path there is NO posting-grain exchange at
    all: the only shuffle in the postings stage becomes the merge
    stage's run-grain exchange, whose rows are delta+varbyte-compressed.
    A term seen by many chunks yields many partial runs; the k-way merge
    kernel already handles arbitrary run counts per term (it was built
    for salted runs), so head-term skew needs no explicit salting here --
    any single run is bounded by the chunk size.

    The per-posting payload is (doc gap, tf, dl) -- all varbyte, ~3-4 B
    -- NOT the f64 BM25 contribution the salted paths ship (8 B/posting
    uncompressed, the dominant run payload): the merge kernel recomputes
    the idf-free tf-norm from (tf, dl), and idf multiplies in at BLOCK
    grain after the dictionary join.  That also removes the scored-tf
    dictionary join from posting grain entirely -- at web-scale vocab
    that join is a second full-corpus shuffle on this path's input.

    Segment counts per chunk approach the per-chunk vocabulary, so the
    encode is vectorized across segments (one lexsort, one gap pass, one
    varbyte_encode_segmented call per column); the only per-segment
    python work is buffer slicing.
    """
    chunk_rows = int(os.environ.get("SPARK_GRAFT_ENCODE_CHUNK", "1500000"))
    buf: list = []
    nb = 0
    # maybe_sorted: batches of one scan partition arrive in file order,
    # so when the tf table was written sortWithinPartitions(shard, tid,
    # local_id) the concatenated chunk is already in kernel order; the
    # kernel VERIFIES before skipping its sort, so unsorted producers
    # (streaming micro-batches) are still correct
    for pdf in batches:
        if len(pdf) == 0:
            continue
        buf.append(pdf)
        nb += len(pdf)
        if nb >= chunk_rows:
            yield _encode_chunk(
                pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0],
                maybe_sorted=True,
            )
            buf, nb = [], 0
    if nb:
        yield _encode_chunk(
            pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0],
            maybe_sorted=True,
        )


ENCODE_COLS = ["tid", "shard", "fidx", "local_id", "tf", "dl"]


def _is_kernel_sorted(shard: np.ndarray, tid: np.ndarray,
                      lid: np.ndarray) -> bool:
    """True iff rows are ordered by (shard, tid, local_id) -- the tf
    write order.  Three sequential diff passes; no gather."""
    if len(shard) < 2:
        return True
    ds = np.diff(shard)
    if ds.min() < 0:
        return False
    dt = np.diff(tid)
    dl_ = np.diff(lid)
    same_shard = ds == 0
    if np.any(same_shard & (dt < 0)):
        return False
    return not np.any(same_shard & (dt == 0) & (dl_ <= 0))


def _encode_partial_runs_files(batches):
    """mapInPandas kernel over (path, rg) rows: same partial-run encode
    as _encode_partial_runs, but each task reads its parquet ROW GROUPS
    directly with pyarrow instead of receiving posting rows through the
    JVM->python Arrow boundary.

    Why: scripts/boundary_probe.py measured Spark's per-row Arrow
    serialization of a 6-int-column scan at ~1.8 us/row of JVM CPU at
    local[4], inflating ~3.2x at local[16] (the single largest
    non-scaling component left in the build), while a pure-JVM scan of
    the same table costs ~0.1 us/row.  Reading the columnar pages in
    the worker (pruned to the 6 fixed-width columns) keeps the Arrow
    boundary O(runs) -- only the compressed run rows cross it -- instead
    of O(postings).  Spark still plans, schedules, retries, shuffles,
    and commits; the task payload is just a (file, row-group) unit, the
    same reader shape Petastorm/Ray data loaders use over parquet.  On
    a cluster the worker reads from the shared store (HDFS/S3) exactly
    as the JVM scan would.
    """
    import pyarrow.parquet as pq

    chunk_rows = int(os.environ.get("SPARK_GRAFT_ENCODE_CHUNK", "1500000"))
    for pdf in batches:
        for path, rg in zip(pdf["path"], pdf["rg"]):
            tbl = pq.ParquetFile(path).read_row_group(
                int(rg), columns=ENCODE_COLS
            )
            part = tbl.to_pandas()
            del tbl
            # each row group encodes independently (no cross-unit
            # concat): a slice of a row group preserves the tf write's
            # (shard, tid, local_id) order, so every chunk here takes
            # _encode_chunk's sorted fast path; chunk_rows only bounds
            # peak kernel memory for oversized row groups
            for s in range(0, len(part), chunk_rows):
                yield _encode_chunk(
                    part.iloc[s:s + chunk_rows], maybe_sorted=True
                )


def parquet_num_rows(path: str) -> int:
    """Exact row count of a parquet table from file footers -- the same
    value as ``spark.read.parquet(path).count()`` without scheduling a
    Spark job (guide §1.2: the collect_metrics actions were pure serial
    per-action latency on the build's critical path)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def _postings_part_metrics(path: str) -> list:
    """Per-shard (shard, blocks, postings, bytes) of one committed
    postings part, computed driver-side with pyarrow.  Replaces a
    read-back Spark job per shard-group (schema inference + groupBy
    exchange + collect) whose scheduling overhead dominated the build at
    small scale; the values are identical (count, sum(n),
    sum(length(doc_bytes)+length(tf_bytes)) grouped by shard)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet", partitioning="hive")
    tbl = ds.to_table(columns=["shard", "n", "doc_bytes", "tf_bytes"])
    blen = pc.add(
        pc.binary_length(tbl.column("doc_bytes")),
        pc.binary_length(tbl.column("tf_bytes")),
    )
    t2 = pa.table({
        "shard": tbl.column("shard"),
        "n": tbl.column("n"),
        "bytes": pc.cast(blen, pa.int64()),
    })
    agg = t2.group_by("shard").aggregate(
        [("n", "sum"), ("bytes", "sum"), ("shard", "count")]
    )
    return [
        {
            "shard": int(s), "postings": int(n or 0),
            "bytes": int(by or 0), "blocks": int(c),
        }
        for s, n, by, c in zip(
            agg.column("shard").to_pylist(),
            agg.column("n_sum").to_pylist(),
            agg.column("bytes_sum").to_pylist(),
            agg.column("shard_count").to_pylist(),
        )
    ]


def tf_scan_units(tf_dir: str) -> list:
    """Driver-side enumeration of (file, row_group) scan units for the
    direct-pyarrow encode path.  Footer reads only -- cheap (one small
    read per file) and equivalent to what Spark's own split planning
    does; row-group granularity keeps parallelism independent of how
    many tasks happened to write the tf table."""
    import glob as _glob

    import pyarrow.parquet as pq

    units = []
    for path in sorted(_glob.glob(os.path.join(tf_dir, "*.parquet"))):
        for rg in range(pq.ParquetFile(path).num_row_groups):
            units.append((path, rg))
    return units


def _encode_chunk(pdf: pd.DataFrame, maybe_sorted: bool = False) -> pd.DataFrame:
    from ..functions.codec import varbyte_encode_segmented

    shard = pdf["shard"].values.astype(np.int64)
    tid = pdf["tid"].values.astype(np.int64)
    fidx = pdf["fidx"].values.astype(np.int8)
    lid = pdf["local_id"].values.astype(np.int64)
    tf = pdf["tf"].values.astype(np.uint64)
    dl = pdf["dl"].values.astype(np.uint64)
    # The stats stage writes tf sortWithinPartitions(shard, tid,
    # local_id), so a chunk that stayed within one row group is already
    # in kernel order -- VERIFY (three sequential diff passes, ~free)
    # and skip the lexsort.  The lexsort's random gather is the
    # engine's least scalable pattern on shared memory systems
    # (measured 3.1x per-row inflation at 16 concurrent workers on
    # identical input, outside Spark); the sorted path replaces it with
    # sequential scans.  The check, not a trusted flag, keeps the
    # kernel correct for any producer (streaming micro-batches, legacy
    # unsorted tf tables).
    if not (maybe_sorted and _is_kernel_sorted(shard, tid, lid)):
        order = np.lexsort((lid, tid, shard))
        shard, tid, fidx, lid = shard[order], tid[order], fidx[order], lid[order]
        tf, dl = tf[order], dl[order]
    chg = (np.diff(tid) != 0) | (np.diff(shard) != 0)
    starts = np.concatenate(([0], np.flatnonzero(chg) + 1))
    ends = np.concatenate((starts[1:], [len(tid)]))
    ns = ends - starts
    gaps = lid.astype(np.uint64)
    gaps[1:] = gaps[1:] - lid[:-1].astype(np.uint64)
    gaps[starts] = lid[starts]
    doc_buf, doc_off = varbyte_encode_segmented(gaps, starts)
    tf_buf, tf_off = varbyte_encode_segmented(tf, starts)
    dl_buf, dl_off = varbyte_encode_segmented(dl, starts)
    doc_mv = memoryview(doc_buf.tobytes())
    tf_mv = memoryview(tf_buf.tobytes())
    dl_mv = memoryview(dl_buf.tobytes())
    return pd.DataFrame({
        "tid": tid[starts],
        "shard": shard[starts].astype(np.int32),
        "fidx": fidx[starts],
        "n": ns.astype(np.int64),
        "doc_bytes": [
            bytes(doc_mv[doc_off[i]:doc_off[i + 1]])
            for i in range(len(starts))
        ],
        "tf_bytes": [
            bytes(tf_mv[tf_off[i]:tf_off[i + 1]])
            for i in range(len(starts))
        ],
        "dl_bytes": [
            bytes(dl_mv[dl_off[i]:dl_off[i + 1]])
            for i in range(len(starts))
        ],
    })


def _make_merge_runs_tfnorm(block_size: int, k1: float, b: float,
                            avgdl_by_fidx: list):
    from ..functions.codec import varbyte_decode

    def _merge_many(pdf: pd.DataFrame) -> pd.DataFrame:
        """Merge mapside dl-payload partial runs: one (shard, mkey)
        bucket -> final block rows per ``tid`` segment, carrying
        ``max_tfnorm`` (the idf-free per-block score bound; idf
        multiplies in after the block-grain dictionary join).

        Fully vectorized across the WHOLE bucket, not per tid: at
        web-scale vocab the zipf tail makes most terms a handful of
        postings, so a per-tid python loop pays ~10s of us of
        interpreter/pandas overhead per TERM and dominates the stage
        (stage_scaling_probe measured the loop form at 400-690 s of
        task time for a 480k-page build whose actual codec work is
        ~30 s).  Shape mirrors _encode_partial_runs: every run payload
        in the bucket decodes in ONE varbyte pass over the concatenated
        bytes (runs are self-delimiting; per-run cumsum re-basing
        recovers absolute ids -- same single-pass decode as the serve
        kernel, search.py:294-305), one lexsort orders postings by
        (tid, id), block boundaries tile each tid segment, and the two
        output columns encode via varbyte_encode_segmented at block
        grain.  Per-block python work is only the final buffer slicing.

        tfnorm = tf / (tf + k1*(1 - b + b*dl/avgdl)) mirrors the serve
        kernel's denominator expression exactly (same f64 op order);
        the stored bound gets a 1e-12 relative bump at the join to
        cover the multiplication-association difference vs the serve
        side's fl(idf*tf/denom) (see build_postings_for).
        """
        from ..functions.codec import varbyte_encode_segmented

        shard = int(pdf["shard"].iloc[0])
        order_runs = np.argsort(pdf["tid"].values, kind="mergesort")
        run_tid = pdf["tid"].values[order_runs].astype(np.int64)
        run_n = pdf["n"].values[order_runs].astype(np.int64)
        run_fidx = pdf["fidx"].values[order_runs].astype(np.int64)
        doc_col = pdf["doc_bytes"].values[order_runs]
        tf_col = pdf["tf_bytes"].values[order_runs]
        dl_col = pdf["dl_bytes"].values[order_runs]
        total = int(run_n.sum())
        gaps = varbyte_decode(b"".join(doc_col), total)
        tfs = varbyte_decode(b"".join(tf_col), total)
        dls = varbyte_decode(b"".join(dl_col), total)
        # absolute ids: one bucket-wide cumsum, re-based per run
        run_ends = np.cumsum(run_n)
        ids_all = np.cumsum(gaps, dtype=np.uint64)
        offs = np.zeros(len(run_n), dtype=np.uint64)
        offs[1:] = ids_all[run_ends[:-1] - 1]
        ids = ids_all - np.repeat(offs, run_n)
        # order postings by (tid, id); a local_id appears at most once
        # per (shard, tid) (tf is aggregated), so the order is unique
        tid_p = np.repeat(run_tid, run_n)
        order = np.lexsort((ids, tid_p))
        ids, tfs, dls, tid_p = ids[order], tfs[order], dls[order], tid_p[order]
        fidx_p = np.repeat(run_fidx, run_n)[order]
        adl = np.asarray(avgdl_by_fidx, dtype=np.float64)[fidx_p]
        tfs_f = tfs.astype(np.float64)
        denom = tfs_f + k1 * (1.0 - b + b * dls.astype(np.float64) / adl)
        tfnorm = tfs_f / denom
        # tid segments -> block tiling (blocks are contiguous in posting
        # order, so bstarts alone segments every per-block reduction)
        chg = np.flatnonzero(np.diff(tid_p)) + 1
        seg_starts = np.concatenate(([0], chg))
        seg_ends = np.concatenate((chg, [total]))
        seg_n = seg_ends - seg_starts
        nblocks = -(-seg_n // block_size)
        bseg = np.repeat(np.arange(len(seg_n)), nblocks)
        bidx = np.arange(len(bseg)) - np.repeat(
            np.cumsum(nblocks) - nblocks, nblocks
        )
        bstarts = seg_starts[bseg] + bidx * block_size
        bends = np.minimum(bstarts + block_size, seg_ends[bseg])
        gaps_b = ids.copy()
        gaps_b[1:] = ids[1:] - ids[:-1]
        gaps_b[bstarts] = ids[bstarts]
        doc_buf, doc_off = varbyte_encode_segmented(gaps_b, bstarts)
        tf_buf, tf_off = varbyte_encode_segmented(tfs, bstarts)
        doc_mv = memoryview(doc_buf.tobytes())
        tf_mv = memoryview(tf_buf.tobytes())
        nb = len(bstarts)
        return pd.DataFrame({
            "tid": tid_p[bstarts],
            "shard": np.full(nb, shard, dtype=np.int32),
            "block_idx": bidx.astype(np.int64),
            "first_local": ids[bstarts].astype(np.int64),
            "last_local": ids[bends - 1].astype(np.int64),
            "n": (bends - bstarts).astype(np.int64),
            "max_tfnorm": np.maximum.reduceat(tfnorm, bstarts),
            "doc_bytes": [
                bytes(doc_mv[doc_off[i]:doc_off[i + 1]]) for i in range(nb)
            ],
            "tf_bytes": [
                bytes(tf_mv[tf_off[i]:tf_off[i + 1]]) for i in range(nb)
            ],
        })

    return _merge_many


def _make_merge_runs_tid(block_size: int):
    from ..functions.codec import delta_decode, varbyte_decode

    def _merge_many(pdf: pd.DataFrame) -> pd.DataFrame:
        """Integer-keyed twin of the merge kernel: one (shard, mkey)
        bucket -> final block rows per ``tid`` segment."""
        shard = int(pdf["shard"].iloc[0])
        rows = {k: [] for k in (
            "tid", "shard", "block_idx", "first_local", "last_local",
            "n", "max_score", "doc_bytes", "tf_bytes",
        )}
        for tid, g in pdf.groupby("tid", sort=False):
            ids_parts, tf_parts, sc_parts = [], [], []
            for db, tb, sb, n in zip(g["doc_bytes"], g["tf_bytes"],
                                     g["score_bytes"], g["n"]):
                ids_parts.append(delta_decode(db, int(n)))
                tf_parts.append(varbyte_decode(tb, int(n)))
                sc_parts.append(np.frombuffer(sb, dtype=np.float64))
            if len(ids_parts) == 1:
                ids, tfs, scs = ids_parts[0], tf_parts[0], sc_parts[0]
            else:
                ids = np.concatenate(ids_parts)
                tfs = np.concatenate(tf_parts)
                scs = np.concatenate(sc_parts)
                order = np.argsort(ids, kind="mergesort")
                ids, tfs, scs = ids[order], tfs[order], scs[order]
            for bi, s in enumerate(range(0, len(ids), block_size)):
                e = min(s + block_size, len(ids))
                rows["tid"].append(int(tid))
                rows["shard"].append(shard)
                rows["block_idx"].append(bi)
                rows["first_local"].append(int(ids[s]))
                rows["last_local"].append(int(ids[e - 1]))
                rows["n"].append(int(e - s))
                rows["max_score"].append(float(scs[s:e].max()))
                rows["doc_bytes"].append(delta_encode(ids[s:e]))
                rows["tf_bytes"].append(varbyte_encode(tfs[s:e]))
        return pd.DataFrame(rows)

    return _merge_many


def _make_merge_runs(block_size: int):
    from ..functions.codec import delta_decode, varbyte_decode

    def _merge_many(pdf: pd.DataFrame) -> pd.DataFrame:
        """One (shard, mkey) bucket -> final block rows for every
        (field, term) segment: multi-way merge of that term's sorted runs
        (runs hold disjoint local_id sets, so concat + mergesort)."""
        shard = int(pdf["shard"].iloc[0])
        rows = {k: [] for k in (
            "field", "term", "shard", "block_idx", "first_local", "last_local",
            "n", "max_score", "doc_bytes", "tf_bytes",
        )}
        for (field, term), g in pdf.groupby(["field", "term"], sort=False):
            ids_parts, tf_parts, sc_parts = [], [], []
            for db, tb, sb, n in zip(g["doc_bytes"], g["tf_bytes"],
                                     g["score_bytes"], g["n"]):
                ids_parts.append(delta_decode(db, int(n)))
                tf_parts.append(varbyte_decode(tb, int(n)))
                sc_parts.append(np.frombuffer(sb, dtype=np.float64))
            if len(ids_parts) == 1:
                ids, tfs, scs = ids_parts[0], tf_parts[0], sc_parts[0]
            else:
                ids = np.concatenate(ids_parts)
                tfs = np.concatenate(tf_parts)
                scs = np.concatenate(sc_parts)
                order = np.argsort(ids, kind="mergesort")
                ids, tfs, scs = ids[order], tfs[order], scs[order]
            for bi, s in enumerate(range(0, len(ids), block_size)):
                e = min(s + block_size, len(ids))
                rows["field"].append(field)
                rows["term"].append(term)
                rows["shard"].append(shard)
                rows["block_idx"].append(bi)
                rows["first_local"].append(int(ids[s]))
                rows["last_local"].append(int(ids[e - 1]))
                rows["n"].append(int(e - s))
                rows["max_score"].append(float(scs[s:e].max()))
                rows["doc_bytes"].append(delta_encode(ids[s:e]))
                rows["tf_bytes"].append(varbyte_encode(tfs[s:e]))
        return pd.DataFrame(rows)

    return _merge_many


# ---------- build stages ----------

def assign_layout(u: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Assign (shard, local_id): shard = hash(id), local_id dense per shard
    ordered by id -- deterministic, so rebuilds, resumed builds and
    compactions produce identical layouts.

    Shuffle discipline: the wide corpus rows (content, chunk_content,
    embedding) cross exactly ONE exchange.  The explicit
    ``repartition(num_doc_shards, shard)`` here already satisfies both the
    window's required distribution (clustered by shard) and the final
    partitioned write's geometry, so Catalyst inserts no further exchange
    -- round 1 shipped the wide rows through two (window + pre-write
    repartition), which was the measured scaling bottleneck
    (BENCH_SCALING.md, 525 s at 3.84M pages / local[4])."""
    u = u.withColumn(
        "shard", F.pmod(F.xxhash64("id"), F.lit(cfg.num_doc_shards)).cast("int")
    )
    u = u.repartition(cfg.num_doc_shards, "shard")
    w = Window.partitionBy("shard").orderBy("id")
    return u.withColumn("local_id", (F.row_number().over(w) - 1).cast("long"))


def unified_corpus(docs: DataFrame, chunks: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Union full docs + chunks; assign (shard, local_id)."""
    d = docs.select(
        "id", "doc_type", F.lit(None).cast("string").alias("parent_id"),
        "url", "domain", "title", "content", "description",
        F.lit("").alias("chunk_content"),
        F.lit(None).cast("string").alias("parent_doc_type"),
        F.col("content_embedding").alias("embedding"),
    )
    c = chunks.select(
        "id", "doc_type", "parent_id", "url", "domain", "title",
        F.lit("").alias("content"), F.lit("").alias("description"),
        "chunk_content", "parent_doc_type",
        F.col("chunk_embedding").alias("embedding"),
    )
    return assign_layout(d.unionByName(c), cfg)


def tokenize_tf(unified: DataFrame, cfg: IndexConfig) -> DataFrame:
    """(fidx, shard, local_id, dl, term, tf) -- all JVM-side.

    The field STRING never exists at token grain: stack emits the dense
    tinyint field index directly, so the exploded token rows, the tf
    hash-agg's keys and the sorted tf write all carry a 1-byte field id
    instead of a 5-13 byte string.  The stats stage is the build's bulk
    memory-streaming pass and the box's memory system is its scaling
    ceiling (BENCH_SCALING.md round 4), so every byte removed from the
    token/posting row is bandwidth returned to the bottleneck.  The
    string re-materializes only at vocab grain (term_dict via field_col)
    and inside the tid hash expression (field_col is a codegen
    element_at, not a stored column)."""
    n = len(cfg.fields)
    stack_expr = "stack({}, {}) as (fidx, text)".format(
        n, ", ".join(
            f"cast({i} as tinyint), {f}" for i, f in enumerate(cfg.fields)
        )
    )
    long_df = unified.select("shard", "local_id", F.expr(stack_expr))
    toks = long_df.select(
        "shard", "local_id", "fidx", tokens_col("text").alias("tokens")
    ).withColumn("dl", F.size("tokens")).filter(F.col("dl") > 0)
    exploded = toks.select(
        "fidx", "shard", "local_id", "dl", F.explode("tokens").alias("term")
    )
    return exploded.groupBy("fidx", "shard", "local_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def doclens(tf: DataFrame, cfg: IndexConfig) -> DataFrame:
    """One row per (shard, local_id) with per-field dl (null = field
    absent) -- the pivoted document-length table.

    Derived ONCE per build and materialized: both corpus_stats (avgdl /
    n_docs) and the attributes length join consume doc lengths, and at
    scale each previously re-scanned the full posting-grain tf table to
    re-derive them -- the round-3 protocol measured the stats stage as
    the worst 4N scaler (2.52x) largely from those two extra tf passes.
    tf is shard-colocated on disk, so the pivot's map-side partial agg
    collapses the per-term rows to one row per doc before the exchange
    (dl repeats on every (doc, field) row; F.first is exact).  When tf
    carries the materialized ``fidx`` int column the pivot keys on it
    instead of the ``field`` string (same values by construction), so
    this posting-grain scan too reads only int columns."""
    if "fidx" in tf.columns:
        n = len(cfg.fields)
        piv = (
            tf.groupBy("shard", "local_id")
            .pivot("fidx", list(range(n)))
            .agg(F.first("dl"))
        )
        return piv.select(
            "shard", "local_id",
            *[F.col(str(i)).alias(f) for i, f in enumerate(cfg.fields)],
        )
    return (
        tf.groupBy("shard", "local_id")
        .pivot("field", list(cfg.fields))
        .agg(F.first("dl"))
    )


def corpus_stats(tf: DataFrame, lens: Optional[DataFrame] = None,
                 cfg: Optional[IndexConfig] = None) -> DataFrame:
    """Per-field (n_docs, avgdl) over field-present docs.  Pass ``lens``
    (the materialized doclens table) to aggregate the narrow per-doc
    table instead of a full-tf distinct.  avgdl is identical either way:
    dl is integral, so Spark's avg accumulates an exact long sum before
    the one division."""
    if lens is not None:
        n = len(cfg.fields)
        stacked = lens.select(F.expr(
            "stack({}, {}) as (field, dl)".format(
                n, ", ".join(f"'{f}', {f}" for f in cfg.fields)
            )
        )).filter(F.col("dl").isNotNull())
        per_doc = stacked
    elif "field" in tf.columns:
        per_doc = tf.select("field", "shard", "local_id", "dl").distinct()
    else:
        per_doc = (
            tf.select("fidx", "shard", "local_id", "dl").distinct()
            .select(field_col(cfg).alias("field"), "dl")
        )
    return per_doc.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def write_corpus_stats_local(doclens_dir: str, out_dir: str,
                             cfg: IndexConfig) -> None:
    """Driver-side corpus_stats: per-field (n_docs, avgdl) computed with
    pyarrow from the materialized doclens table and written as one
    parquet file in the Spark-compatible schema.

    Values are identical to the Spark aggregate it replaces: dl is
    integral and per-field totals sit far below 2^53, so the double sum
    is exact under any accumulation order, and float(sum)/count is the
    same IEEE division Spark's Average performs.  The doclens read is one
    narrow columnar pass (int columns only); what this removes from the
    critical path is a whole Spark job + write for a 4-row table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    ds = pads.dataset(doclens_dir, format="parquet")
    tbl = ds.to_table(columns=list(cfg.fields))
    fields, n_docs, avgdl = [], [], []
    for f in cfg.fields:
        col = tbl.column(f)
        n = len(col) - col.null_count
        if n == 0:
            continue
        s = pc.sum(col).as_py()
        fields.append(f)
        n_docs.append(n)
        avgdl.append(float(s) / n)
    out = pa.table(
        {"field": fields, "n_docs": n_docs, "avgdl": avgdl},
        schema=pa.schema([
            pa.field("field", pa.string()), pa.field("n_docs", pa.int64()),
            pa.field("avgdl", pa.float64()),
        ]),
    )
    import uuid as _uuid
    tmp = out_dir + f".__tmp_{_uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(out, os.path.join(tmp, "part-00000.parquet"))
    if os.path.exists(out_dir):
        import shutil as _shutil
        _shutil.rmtree(out_dir)
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    os.replace(tmp, out_dir)


def term_dict(tf: DataFrame, stats: DataFrame, cfg: IndexConfig) -> DataFrame:
    """(field, term, df, idf, tbucket).  idf = ln(1 + (N-n+0.5)/(n+0.5)).

    When tf carries only the int ``fidx`` (new layout), the df agg keys
    on it and the field string materializes AFTER the agg, at vocab
    grain -- the term strings themselves still stream through this one
    agg (the single posting-grain string decode left in the build)."""
    if "field" in tf.columns:
        df_tbl = tf.groupBy("field", "term").agg(F.count(F.lit(1)).alias("df"))
    else:
        df_tbl = (
            tf.groupBy("fidx", "term").agg(F.count(F.lit(1)).alias("df"))
            .withColumn("field", field_col(cfg)).drop("fidx")
        )
    return term_dict_from_df(df_tbl, stats, cfg)


def term_dict_from_df(df_tbl: DataFrame, stats: DataFrame,
                      cfg: IndexConfig) -> DataFrame:
    """Attach idf + tbucket to a vocab-grain (field, term, df) table --
    the shared tail of term_dict, also fed directly by the stats stage's
    pre-write vocab pass when the tf parquet drops the term string."""
    j = df_tbl.join(F.broadcast(stats.select("field", "n_docs")), "field")
    return j.select(
        "field", "term", "df",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        tbucket_col(F.col("term"), cfg.term_buckets).alias("tbucket"),
    )


def scored_tf(tf: DataFrame, tdict: DataFrame, stats: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Attach the per-posting BM25 contribution (idf * tf_norm), float64.

    This is what per-block max_score upper-bounds.  The idf join is
    broadcast when the dictionary is small; at web scale it is a shuffled
    hash join on (field, term) that AQE plans -- both sides are already
    columnar and pruned to 3 columns.
    """
    if "term" not in tf.columns:
        # narrow materialized tf (term string dropped at write,
        # SPARK_GRAFT_TF_TERM=drop): re-attach (field, term, idf) in one
        # posting-grain join keyed by the int tid instead of the string pair
        names = tdict.select(
            F.xxhash64("field", "term").alias("tid"), "field", "term", "idf"
        )
        j = tf.join(names, "tid")
    else:
        if "field" not in tf.columns:
            tf = tf.withColumn("field", field_col(cfg))
        j = tf.join(tdict.select("field", "term", "idf"), ["field", "term"])
    avg_map = {r["field"]: r["avgdl"] for r in stats.collect()}
    avgdl = F.coalesce(
        *[
            F.when(F.col("field") == f, F.lit(float(v)))
            for f, v in avg_map.items()
        ],
        F.lit(1.0),
    ) if avg_map else F.lit(1.0)
    denom = F.col("tf") + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / avgdl)
    return j.withColumn("score", F.col("idf") * F.col("tf") / denom)


def _use_tid_keys() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_TERM_KEYS", "tid") != "str"


def _use_mapside_encode() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_POSTINGS", "mapside") != "salted"


def _use_pyarrow_scan() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_POSTINGS_SCAN", "pyarrow") != "jvm"


def _drop_tf_term() -> bool:
    """``SPARK_GRAFT_TF_TERM=drop`` materializes tf WITHOUT the
    posting-grain term string; a vocab-grain (field, term, df) pass runs
    BEFORE the write instead, so posting grain stores no string anywhere.

    Default stays ``keep``: the same-night A/B at 480k pages / local[16]
    (BENCH_SCALING.md round 5) showed the vocab pass re-pays the full
    tokenize cost (~31 s, comparable to the entire keep-mode tf_write of
    23.6 s) while dropping the string saves nothing measurable -- on the
    sorted (shard, tid, local_id) layout the term column dictionary-
    encodes to near-zero write cost.  Kept as a measured negative-A/B
    lever, like SPARK_GRAFT_POSTINGS=salted."""
    import os

    return os.environ.get("SPARK_GRAFT_TF_TERM", "keep") != "keep"


def build_postings_for(
    tf: DataFrame, tdict: DataFrame, stats: DataFrame, cfg: IndexConfig,
    scan_units: Optional[list] = None,
) -> DataFrame:
    """tf -> block rows (T5+T6+T7); three strategies, one output schema.

    Default ("mapside"): partial-run encoding as a NARROW map over the
    tf scan -- each ~1.5M-row input chunk emits one compressed sorted
    run per (shard, tid) it contains, so the ONLY shuffle in the stage
    is the merge exchange moving delta+varbyte-compressed runs (a few
    bytes per posting: doc gap + tf + dl, no f64 score) instead of raw
    ~36-B posting rows.  The dictionary join happens ONLY at block
    grain (idf * max_tfnorm after the merge) -- posting-grain rows
    never join anything.  Skew needs no explicit handling: any one run
    is chunk-bounded, and the k-way merge accepts arbitrary run counts
    per term.  The stored max_score gets a 1e-12 relative bump: the
    serve kernel computes fl(fl(idf*tf)/denom) while this path stores
    fl(idf * fl(max tf/denom)), which can differ by ~2 ulp (~4e-16
    relative) either way; the bump keeps the block bound a sound upper
    bound (pruning stays lossless -- a slightly larger bound can only
    skip fewer blocks) at a cost of ~1e-12 looser pruning.

    ``SPARK_GRAFT_POSTINGS=salted`` keeps the round-3 path (kept for
    A/B): scored-tf dictionary join, posting-grain shuffle to (shard,
    hash-bucket[, salt]) groups, head terms (df > heavy_term_df) salted
    by local_id into ``num_salts`` independent runs, per-posting f64
    scores shipped through both exchanges.

    All paths key the merge on ``tid = xxhash64(field, term)`` -- the
    (field, term) strings re-attach AFTER the merge at block granularity
    (~1/block_size the rows) via a dictionary join, so the on-disk
    postings schema is unchanged.  ``verify_tid_unique`` (run once per
    build in the stats stage) guards the astronomically-unlikely 64-bit
    collision, which would otherwise silently merge two terms' lists.
    ``SPARK_GRAFT_TERM_KEYS=str`` selects the legacy string-keyed
    salted path.  All three produce identical merged blocks (doc/tf
    bytes byte-identical, max_score within 1e-9 relative; asserted in
    tests/test_codec.py::test_postings_paths_identical).
    """
    if not _use_tid_keys():
        stf = scored_tf(tf, tdict, stats, cfg)
        heavy = tdict.filter(F.col("df") > cfg.heavy_term_df).select(
            "field", "term", F.lit(True).alias("_heavy")
        )
        stf = stf.join(F.broadcast(heavy), ["field", "term"], "left")
        stf = stf.withColumn(
            "salt",
            F.when(
                F.col("_heavy").isNotNull(),
                F.pmod(F.col("local_id"), F.lit(cfg.num_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        ).drop("_heavy")
        stf = stf.withColumn(
            "ekey", F.pmod(F.xxhash64("field", "term"), F.lit(cfg.encode_buckets)).cast("int")
        )
        runs = stf.groupBy("shard", "ekey", "salt").applyInPandas(
            _encode_runs_many, schema=RUN_SCHEMA
        )
        runs = runs.withColumn(
            "mkey", F.pmod(F.xxhash64("field", "term"), F.lit(cfg.encode_buckets)).cast("int")
        )
        blocks = runs.groupBy("shard", "mkey").applyInPandas(
            _make_merge_runs(cfg.block_size), schema=POSTINGS_SCHEMA
        )
        blocks = blocks.withColumn(
            "tbucket", tbucket_col(F.col("term"), cfg.term_buckets)
        )
        return blocks.repartition(cfg.term_buckets, "tbucket")

    if _use_mapside_encode():
        # map-side partial runs (default): encode is a NARROW stage over
        # the raw tf scan -- no posting-grain exchange OR join exists at
        # all.  Each input chunk yields one compressed run per (shard,
        # tid) it contains; the merge exchange below moves only those
        # compressed runs.  Head-term skew is bounded by the chunk size,
        # so the heavy-term broadcast + salt machinery is unnecessary
        # here (cfg.heavy_term_df/num_salts only affect "salted").
        if scan_units and _use_pyarrow_scan():
            # direct-pyarrow encode scan (default when the tf table is
            # materialized): the driver enumerated (file, row-group)
            # units; each task reads its row groups columnar in the
            # python worker, pruned to the 6 fixed-width ENCODE_COLS.
            # The JVM->python Arrow boundary then carries only these
            # path rows in and compressed runs out -- O(runs), not
            # O(postings).  boundary_probe.py: the per-row Arrow
            # serialization it removes cost ~1.8 us/row of JVM CPU and
            # was the dominant NON-SCALING term in the build (inflates
            # ~3.2x from local[4] to local[16]).
            spark = tf.sparkSession
            paths = spark.createDataFrame(
                [(p, r) for p, r in scan_units], "path string, rg int"
            ).repartition(len(scan_units))
            runs = paths.mapInPandas(
                _encode_partial_runs_files, schema=RUN_SCHEMA_DL
            )
        else:
            if "tid" in tf.columns and "fidx" in tf.columns:
                # materialized tf carries (tid, fidx) ints (stats stage
                # wrote them in the same codegen pass as the tf write):
                # this scan reads ONLY fixed-width int columns -- parquet
                # never decodes the posting-grain term string pages, and
                # no per-posting hash runs here
                src = tf.select("tid", "shard", "fidx", "local_id", "tf", "dl")
            elif "fidx" in tf.columns:
                # fresh tokenize output (streaming micro-batches): fidx
                # is native; the field string exists only inside the tid
                # hash expression (field_col is codegen element_at)
                src = tf.select(
                    F.xxhash64(field_col(cfg), F.col("term")).alias("tid"),
                    "shard", "fidx", "local_id", "tf", "dl",
                )
            else:
                src = tf.select(
                    F.xxhash64("field", "term").alias("tid"),
                    "shard", fidx_col(cfg).alias("fidx"), "local_id", "tf", "dl",
                )
            runs = src.mapInPandas(_encode_partial_runs, schema=RUN_SCHEMA_DL)
        runs = runs.withColumn(
            "mkey", F.pmod(F.col("tid"), F.lit(cfg.encode_buckets)).cast("int")
        )
        avg_map = {r["field"]: float(r["avgdl"]) for r in stats.collect()}
        avgdl_by_fidx = [avg_map.get(f, 1.0) for f in cfg.fields]
        blocks = runs.groupBy("shard", "mkey").applyInPandas(
            _make_merge_runs_tfnorm(cfg.block_size, cfg.k1, cfg.b,
                                    avgdl_by_fidx),
            schema=POSTINGS_SCHEMA_TFNORM,
        )
        # block-grain dictionary join attaches (field, term) AND idf;
        # max_score = idf * max_tfnorm (+1e-12 bump, see docstring)
        names = tdict.select(
            F.xxhash64("field", "term").alias("tid"), "field", "term", "idf"
        )
        blocks = blocks.join(names, "tid").drop("tid")
        blocks = blocks.select(
            "field", "term", "shard", "block_idx", "first_local",
            "last_local", "n",
            (F.col("idf") * F.col("max_tfnorm") * F.lit(1.0 + 1e-12))
            .alias("max_score"),
            "doc_bytes", "tf_bytes",
            tbucket_col(F.col("term"), cfg.term_buckets).alias("tbucket"),
        )
        # co-locate each tbucket in one task before the dynamic-partition
        # write: otherwise every task writes a file into every tbucket dir
        # (tasks x buckets small files; each local-FS commit forks chmod)
        return blocks.repartition(cfg.term_buckets, "tbucket")

    stf = scored_tf(tf, tdict, stats, cfg)
    stf = stf.withColumn("tid", F.xxhash64("field", "term"))
    heavy = tdict.filter(F.col("df") > cfg.heavy_term_df).select(
        F.xxhash64("field", "term").alias("tid"), F.lit(True).alias("_heavy")
    )
    stf = stf.join(F.broadcast(heavy), "tid", "left")
    stf = stf.withColumn(
        "salt",
        F.when(
            F.col("_heavy").isNotNull(),
            F.pmod(F.col("local_id"), F.lit(cfg.num_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    # drop the strings BEFORE the encode exchange: this select is what
    # turns the shuffle rows into (tid, shard, local_id, tf, score, salt)
    stf = stf.select(
        "tid", "shard", "local_id", "tf", "score", "salt",
        F.pmod(F.col("tid"), F.lit(cfg.encode_buckets)).cast("int").alias("ekey"),
    )
    runs = stf.groupBy("shard", "ekey", "salt").applyInPandas(
        _encode_runs_many_tid, schema=RUN_SCHEMA_TID
    )
    runs = runs.withColumn(
        "mkey", F.pmod(F.col("tid"), F.lit(cfg.encode_buckets)).cast("int")
    )
    blocks = runs.groupBy("shard", "mkey").applyInPandas(
        _make_merge_runs_tid(cfg.block_size), schema=POSTINGS_SCHEMA_TID
    )
    # re-attach (field, term) at block granularity; Catalyst/AQE picks
    # broadcast for a small dictionary, a block-grain shuffle join at
    # web-scale vocab (both fine -- blocks are ~1/block_size of postings)
    names = tdict.select(
        F.xxhash64("field", "term").alias("tid"), "field", "term"
    )
    blocks = blocks.join(names, "tid").drop("tid")
    blocks = blocks.select(
        "field", "term", "shard", "block_idx", "first_local", "last_local",
        "n", "max_score", "doc_bytes", "tf_bytes",
        tbucket_col(F.col("term"), cfg.term_buckets).alias("tbucket"),
    )
    # co-locate each tbucket in one task before the dynamic-partition write:
    # otherwise every task writes a file into every tbucket dir (tasks x
    # buckets small files; each local-FS file commit fork+execs chmod)
    return blocks.repartition(cfg.term_buckets, "tbucket")


def verify_tid_unique(tdict: DataFrame) -> None:
    """Raise if xxhash64(field, term) collides within the dictionary (the
    integer posting keys would silently merge two terms).  One hash-agg
    over the dictionary -- vocabulary-sized, not corpus-sized."""
    ncol = (
        tdict.groupBy(F.xxhash64("field", "term").alias("tid"))
        .count().filter(F.col("count") > 1).count()
    )
    if ncol:
        raise RuntimeError(
            f"{ncol} xxhash64(field, term) collisions in term_dict; "
            "set SPARK_GRAFT_TERM_KEYS=str or change the term-id seed"
        )


ATTR_SCHEMA_COLS = [
    "shard", "local_id", "id", "doc_type", "parent_id", "parent_doc_type",
    "len_title", "len_content", "len_description", "len_chunk_content",
    "embedding", "sem_bucket",
]


def attributes(unified: DataFrame, cfg: IndexConfig,
               tf: Optional[DataFrame] = None,
               lens: Optional[DataFrame] = None) -> DataFrame:
    """Per-doc serve-side attributes: lengths per field + embedding +
    precomputed semantic-LSH bucket.

    The Vespa-attribute analog (doc.sd `attribute` fields): everything the
    scorer needs at query time without touching the document store.
    ``sem_bucket`` (sign bits of the embedding against deterministic
    hyperplanes) is the HNSW-analog access path: semantic_mode="lsh"
    prunes candidates to the query's probed buckets.  Null embedding
    (with_embeddings=False builds, streamed deltas) -> null bucket, i.e.
    such docs are only reachable via exact semantic mode or after
    compaction re-embeds them.

    Pass ``lens`` (the materialized pivoted doclens table, one row per
    doc) -- or, failing that, ``tf`` (the tokenize_tf output, which
    already carries per-field dl) -- to derive len_* without
    RE-TOKENIZING the whole corpus a second time -- at 100 TB
    tokenization is a full-corpus pass worth doing exactly once.  With
    ``lens`` this stage touches no posting-grain data at all; with only
    ``tf`` it must first collapse the full posting-grain table.  Fields
    a doc lacks
    get len 0, which is what F.size(tokens) returned (and the scorer only
    dereferences lengths for docs a posting reaches, i.e. dl > 0 fields).
    """
    from .similarity import _hyperplanes

    u = unified
    if lens is not None or tf is not None:
        if lens is None:
            lens = doclens(tf, cfg)
        lens = lens.select(
            "shard", "local_id",
            *[F.coalesce(F.col(f), F.lit(0)).alias(f"len_{f}") for f in cfg.fields],
        )
        # shuffle-hash, not sort-merge: the hash table is built from the
        # NARROW lens side, so the wide unified rows (text + embedding)
        # stream through without being sorted (an SMJ here re-sorts the
        # whole corpus and spills at high task concurrency)
        u = u.join(lens.hint("shuffle_hash"), ["shard", "local_id"], "left")
        for f in cfg.fields:
            u = u.withColumn(f"len_{f}", F.coalesce(F.col(f"len_{f}"), F.lit(0)))
    else:
        for f in cfg.fields:
            u = u.withColumn(f"len_{f}", F.size(tokens_col(f)))
    # Arrow-batched numpy matmul, NOT the catalyst aggregate/zip_with fold:
    # higher-order-function lambdas are interpreted per element (no
    # whole-stage codegen), which made this stage the build bottleneck;
    # one (batch x dim) @ (dim x planes) product per Arrow batch is ~100x
    # cheaper.  Query-side probes (search.SearchEngine._semantic_probes)
    # use the same numpy float64 dot, so build and query buckets agree.
    planes = _hyperplanes(cfg.embedding_dim, cfg.sem_lsh_planes, cfg.sem_lsh_seed)
    dim = cfg.embedding_dim
    weights = np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64)

    @F.pandas_udf("int")
    def _bucket(embs: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(embs), dtype="Int32")
        ok = [
            i for i, v in enumerate(embs)
            if v is not None and len(v) == dim
        ]
        # slice the matmul at a fixed row grain so peak kernel memory is
        # independent of the session Arrow batch size (the postings stage
        # raises maxRecordsPerBatch session-wide, and this stage now runs
        # concurrently with it -- guide §2.6)
        for s in range(0, len(ok), 4096):
            sl = ok[s:s + 4096]
            x = np.stack([embs.iloc[i] for i in sl]).astype(np.float64)
            bits = (x @ planes.T) > 0
            out.iloc[sl] = (bits * weights).sum(axis=1).astype(np.int32)
        return out

    u = u.withColumn("sem_bucket", _bucket(F.col("embedding")))
    # cfg-derived projection (== ATTR_SCHEMA_COLS for the default schema):
    # a custom-field index carries exactly its own len_* columns
    cols = [
        "shard", "local_id", "id", "doc_type", "parent_id",
        "parent_doc_type",
    ] + [f"len_{f}" for f in cfg.fields] + ["embedding", "sem_bucket"]
    return u.select(*cols)


# ---------- orchestrator ----------

def _tag_jobs(spark: SparkSession, stage: str) -> None:
    """Label subsequent Spark jobs with the build stage.  Shows up in the
    UI/event logs and lets scripts/shuffle_probe.py attribute shuffle
    bytes to build stages deterministically (wall-clock attribution on a
    noisy multi-tenant host is unreliable)."""
    spark.sparkContext.setJobGroup(f"build:{stage}", f"index build stage {stage}")


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    store: IndexStore,
    cfg: Optional[IndexConfig] = None,
    with_embeddings: bool = True,
    verify_text_invariant: bool = True,
    collect_metrics: bool = True,
) -> IndexStore:
    """Full checkpoint-resumable build.  Re-running after an interruption
    skips stages (and postings shard-groups) marked done in the manifest.

    ``collect_metrics=False`` drops the row-count / per-shard lineage jobs
    (2-3 extra Spark actions per stage) -- for throughput benchmarks where
    the serial per-action latency would dominate small inputs.
    """
    cfg = cfg or IndexConfig()
    # persist the physical layout in the manifest: the serve side MUST use
    # the same shard/bucket geometry (SearchEngine reads it back)
    from dataclasses import asdict
    cfg_dict = asdict(cfg)
    cfg_dict["fields"] = list(cfg_dict["fields"])
    store.manifest["index_config"] = cfg_dict
    store._write_manifest()
    t_all = time.time()

    # stage: docs
    if not store.stage_done("docs"):
        store.begin_stage("docs")
        _tag_jobs(spark, "docs")
        t = time.time()
        # the Arrow extraction kernel parallelizes per input partition; a
        # source with few files (common for small synthetic inputs) would
        # idle most cores.  Real CC dumps have thousands of files, so this
        # repartition is a no-op at scale.
        target_par = spark.sparkContext.defaultParallelism * 2
        if pages.rdd.getNumPartitions() < target_par:
            pages = pages.repartition(target_par)
        docs = extract_docs(pages)
        if with_embeddings:
            docs = embed_docs(docs)
        else:
            docs = docs.withColumn(
                "content_embedding", F.lit(None).cast("array<float>")
            )
        store.write(docs, "docs")
        if verify_text_invariant:
            from .extract import verify_extraction_parity
            bad = verify_extraction_parity(pages, store.read(spark, "docs"))
            assert bad == 0, f"{bad} rows violate byte-identical extraction"
        m = {"wall_sec": time.time() - t}
        if collect_metrics:
            n = parquet_num_rows(store.path("docs"))
            m.update(rows=n, docs_per_sec=n / max(m["wall_sec"], 1e-9))
        store.finish_stage("docs", m)

    docs = store.read(spark, "docs")

    # stage: chunks
    if not store.stage_done("chunks"):
        store.begin_stage("chunks")
        _tag_jobs(spark, "chunks")
        t = time.time()
        ch = chunk_docs(docs)
        if with_embeddings:
            ch = embed_chunks(ch)
        else:
            ch = ch.withColumn("chunk_embedding", F.lit(None).cast("array<float>"))
        store.write(ch, "chunks")
        m = {"wall_sec": time.time() - t}
        if collect_metrics:
            m["rows"] = parquet_num_rows(store.path("chunks"))
        store.finish_stage("chunks", m)

    chunks = store.read(spark, "chunks")

    _index_stages_from_unified(
        spark, store, cfg,
        make_unified=lambda: unified_corpus(docs, chunks, cfg),
        collect_metrics=collect_metrics,
    )

    store.manifest["total_wall_sec"] = time.time() - t_all
    store._write_manifest()
    return store


def build_index_from_docs(
    spark: SparkSession,
    docs: DataFrame,
    store: IndexStore,
    cfg: Optional[IndexConfig] = None,
    *,
    with_chunks: bool = True,
    with_embeddings: bool = False,
    collect_metrics: bool = False,
) -> IndexStore:
    """Index an ALREADY-EXTRACTED docs table (skips the pages->html->docs
    extraction stage of :func:`build_index`; every downstream stage --
    chunks, unified, stats, postings, attributes -- is the same code path,
    so the resulting store serves through SearchEngine/ResidentSearcher
    unchanged).

    ``docs`` needs ``id`` (string, unique) and ``content``; the remaining
    projection columns (url/domain/title/description/keywords/
    code_snippets/crawled_at/doc_type) are filled with deterministic
    defaults when absent.  This is the entry point for corpora that are
    born as text rather than HTML (the reference only ever ingests crawl
    JSON, indexer/indexer.py:404-430; text-born tables are the common case
    for a training-data pipeline, and the driver's bm25_topk_indexed gate
    builds through here to check the postings/WAND engine against the
    DuckDB oracle on the plain-text documents table).
    """
    cfg = cfg or IndexConfig()
    from dataclasses import asdict
    cfg_dict = asdict(cfg)
    cfg_dict["fields"] = list(cfg_dict["fields"])
    store.manifest["index_config"] = cfg_dict
    store._write_manifest()
    t_all = time.time()

    defaults = {
        "url": F.lit(""),
        "domain": F.lit(""),
        "title": F.lit(""),
        "description": F.lit(""),
        "keywords": F.lit(""),
        "code_snippets": F.lit(None).cast("array<string>"),
        "crawled_at": F.lit("2026-01-01 00:00:00").cast("timestamp"),
        "doc_type": F.lit("full_doc"),
    }
    for c, e in defaults.items():
        if c not in docs.columns:
            docs = docs.withColumn(c, e)

    if not store.stage_done("docs"):
        store.begin_stage("docs")
        _tag_jobs(spark, "docs")
        t = time.time()
        d = docs
        if with_embeddings:
            d = embed_docs(d)
        elif "content_embedding" not in d.columns:
            d = d.withColumn(
                "content_embedding", F.lit(None).cast("array<float>")
            )
        store.write(d, "docs")
        m = {"wall_sec": time.time() - t}
        if collect_metrics:
            n = parquet_num_rows(store.path("docs"))
            m.update(rows=n, docs_per_sec=n / max(m["wall_sec"], 1e-9))
        store.finish_stage("docs", m)

    docs = store.read(spark, "docs")

    if not store.stage_done("chunks"):
        store.begin_stage("chunks")
        _tag_jobs(spark, "chunks")
        t = time.time()
        if with_chunks:
            ch = chunk_docs(docs)
            if with_embeddings:
                ch = embed_chunks(ch)
            else:
                ch = ch.withColumn(
                    "chunk_embedding", F.lit(None).cast("array<float>")
                )
        else:
            from .chunk import CHUNKS_SCHEMA
            ch = spark.createDataFrame(
                [], CHUNKS_SCHEMA + ", chunk_embedding array<float>"
            )
        store.write(ch, "chunks")
        m = {"wall_sec": time.time() - t}
        if collect_metrics:
            m["rows"] = parquet_num_rows(store.path("chunks"))
        store.finish_stage("chunks", m)

    chunks = store.read(spark, "chunks")

    _index_stages_from_unified(
        spark, store, cfg,
        make_unified=lambda: unified_corpus(docs, chunks, cfg),
        collect_metrics=collect_metrics,
    )

    store.manifest["total_wall_sec"] = time.time() - t_all
    store._write_manifest()
    return store


def _index_stages_from_unified(
    spark: SparkSession,
    store: IndexStore,
    cfg: IndexConfig,
    make_unified,
    collect_metrics: bool = True,
) -> None:
    """unified -> stats -> postings -> attributes (shared by the full build
    and by delta compaction)."""
    # stage: unified corpus with (shard, local_id)
    if not store.stage_done("unified"):
        store.begin_stage("unified")
        _tag_jobs(spark, "unified")
        t = time.time()
        u = make_unified()
        # assign_layout already hash-partitioned by shard at write geometry
        # (1 task -> 1 partition dir: small-file + fork control); a second
        # repartition here would shuffle the wide rows again
        # doc-store layout (1 MB row groups + dictionary off): the serve
        # path point-fetches <=k docs by id from this table, and the
        # write-side cost of small groups is dictionary churn, not the
        # groups themselves -- rationale + A/B in tables.DOC_STORE_WRITE_OPTS
        store.write(u, "unified", partition_by=["shard"],
                    options=DOC_STORE_WRITE_OPTS)
        store.finish_stage("unified", {"wall_sec": time.time() - t})

    unified = store.read(spark, "unified")

    # stage: tf + stats + dictionary
    if not store.stage_done("stats"):
        store.begin_stage("stats")
        _tag_jobs(spark, "stats")
        t = time.time()
        # ONE doc-grain exchange replaces TWO posting-grain ones: hash-
        # partitioning unified by shard BEFORE tokenize lets Catalyst
        # elide both the tokenize groupBy's exchange (HashPartitioning
        # on `shard` satisfies ClusteredDistribution over the agg keys,
        # which include shard) and the pre-write layout repartition
        # (grp = pmod(shard) is a function of shard, so shard-hashed
        # partitions are already (grp, shard)-colocated).  The bytes
        # moved drop from ~2x posting-grain rows (tf agg exchange +
        # layout repartition; shuffle_probe measured the stats stage at
        # 1376.8 MB @480k pages) to one pass over the doc-grain text
        # (~300 MB @480k) -- and on the one-box protocol, shuffle bytes
        # through a shared memory system are exactly the non-scaling
        # resource (BENCH_SCALING.md round 4).  Plan shape (1 exchange
        # vs 2) is asserted in tests/test_plans.py.
        tf = tokenize_tf(
            unified.repartition(
                spark.sparkContext.defaultParallelism * 2, "shard"
            ),
            cfg,
        )
        tf = tf.withColumn(
            "grp", F.pmod(F.col("shard"), F.lit(cfg.shard_groups)).cast("int")
        )
        # precompute the int term id in the SAME codegen pass as the tf
        # write: every posting-grain consumer downstream (doclens pivot,
        # mapside postings encode) then scans fixed-width int columns
        # only and parquet prunes the string pages -- the term string is
        # decoded at posting grain exactly once more (term_dict's df
        # agg), everywhere else at block/term grain.  tokenize_tf emits
        # fidx natively (no field string at token grain); tid must hash
        # the STRING field name to stay identical to the query side's
        # xxhash64(field, term), so field_col re-derives it inside the
        # hash expression only.
        tf = tf.withColumn(
            "tid", F.xxhash64(field_col(cfg), F.col("term"))
        )
        # tf stays co-located by shard on disk -- this is a LAYOUT
        # INVESTMENT, not just small-file control: every downstream
        # consumer aggregates on (shard, local_id)-prefixed keys
        # (corpus_stats distinct, attributes' lens pivot), and shard-
        # colocated input lets their map-side partial aggs collapse rows
        # before shuffling.  A/B at 3.84M pages (BENCH_SCALING.md round 3):
        # dropping shard colocation saved ~117 s in `stats` at local[4]
        # but doubled the attributes stage at BOTH parallelism levels
        # (hash-scattered (shard, local_id) rows defeat partial
        # aggregation), a net loss at the 4N level.  The colocation now
        # comes from the doc-grain pre-tokenize repartition above, which
        # the agg preserves, instead of a second posting-grain exchange.
        # sortWithinPartitions(shard, tid, local_id): the posting-grain
        # sort happens ONCE here, in Tungsten's spill-aware radix sort,
        # instead of per-chunk in the python encode kernel.  The encode's
        # np.lexsort was the build's least scalable kernel on shared
        # memory systems: its random gather over the chunk working set
        # saturates memory-level parallelism, measured OUTSIDE Spark at
        # 3.1x per-row inflation from 4 -> 16 concurrent processes on
        # identical input (mp.Pool mimic, BENCH_SCALING.md round 4) --
        # a sorted tf scan turns the kernel into a sequential pass.  The
        # (shard, local_id) clustering also feeds the doclens/stats
        # partial aggs the layout comment above describes.
        sub = {}
        drop_term = _drop_tf_term()
        if drop_term:
            # vocab-grain dictionary pass BEFORE the write (verdict r4
            # task 3): the posting-grain tf parquet then stores NO string
            # anywhere -- the term column otherwise rides the Tungsten
            # radix sort as row payload and pays a per-row dictionary
            # encode in the parquet writer solely so term_dict can
            # aggregate it later.  This pass re-runs tokenize+tf-agg
            # (the doc-grain exchange itself is stage-skipped -- same
            # shuffle lineage), but its df agg collapses to vocab grain
            # map-side, so nothing posting-grain moves or lands.
            # MEASURED NET LOSS at 480k/local[16] (BENCH_SCALING.md
            # round 5): the re-tokenize costs ~the whole keep-mode
            # tf_write; default stays keep (_drop_tf_term docstring).
            t2 = time.time()
            term_df = (
                tf.groupBy("fidx", "term")
                .agg(F.count(F.lit(1)).alias("df"))
                .select(
                    field_col(cfg).alias("field"), "term", "df",
                )
            )
            store.write(term_df, "term_df")
            sub["term_df_sec"] = round(time.time() - t2, 1)
            tf_w = tf.select(
                "grp", "tid", "shard", "fidx", "local_id", "dl", "tf"
            )
        else:
            tf_w = tf
        store.write(
            # grp leads the sort so the dynamic-partition writer's
            # required ordering (partition cols first) is satisfied by
            # prefix -- otherwise FileFormatWriter inserts its own
            # non-stable sort by grp and destroys the inner order
            tf_w.sortWithinPartitions("grp", "shard", "tid", "local_id"),
            "tf", partition_by=["grp"],
        )
        sub["tf_write_sec"] = round(time.time() - t, 1)
        tf = store.read(spark, "tf")
        # one doc-grain pass over tf feeds BOTH corpus_stats and the
        # attributes length join (previously each re-scanned full tf)
        t2 = time.time()
        store.write(doclens(tf, cfg), "doclens")
        sub["doclens_sec"] = round(time.time() - t2, 1)
        t2 = time.time()
        # driver-side pyarrow aggregation over the just-written doclens
        # table: same values as the Spark agg (see write_corpus_stats_
        # local), no Spark job for a 4-row output
        write_corpus_stats_local(
            store.path("doclens"), store.path("corpus_stats"), cfg
        )
        sub["corpus_stats_sec"] = round(time.time() - t2, 1)
        t2 = time.time()
        if drop_term:
            # idf attaches to the pre-computed vocab-grain df table; no
            # posting-grain scan happens here at all
            td = term_dict_from_df(
                store.read(spark, "term_df"),
                store.read(spark, "corpus_stats"), cfg,
            )
        else:
            td = term_dict(tf, store.read(spark, "corpus_stats"), cfg)
        store.write(td.repartition(cfg.term_buckets, "tbucket"),
                    "term_dict", partition_by=["tbucket"])
        sub["term_dict_sec"] = round(time.time() - t2, 1)
        # tid-collision verification moved off the serial critical path:
        # it runs as a concurrent task of the postings pool below (always,
        # not only on a fresh stats stage -- strictly more checking)
        store.finish_stage("stats", {"wall_sec": time.time() - t, **sub})

    tf = store.read(spark, "tf")
    stats = store.read(spark, "corpus_stats")
    td = store.read(spark, "term_dict")

    # stage: postings, checkpointed per shard-group
    store.begin_stage("postings")
    _tag_jobs(spark, "postings")
    # Arrow batch size, scoped to this stage: the session default (4096)
    # bounds per-batch memory for WIDE rows (html pages, embeddings), but
    # the postings stage ships narrow rows (6 int columns into the encode
    # kernel, ~150-B compressed runs into the merge), where 4096-row
    # batches make JVM-side per-batch overhead the dominant scan cost
    # (stage_scaling_probe: 1.6-7 us/row of executor CPU on a 6-int scan)
    arrow_batch = os.environ.get("SPARK_GRAFT_POSTINGS_ARROW_BATCH", "32768")
    prev_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", arrow_batch)

    def _one_group(g: int) -> None:
        part = f"grp={g}"
        # job group/description are thread-local: label inside the worker
        _tag_jobs(spark, "postings")
        spark.sparkContext.setJobDescription(f"postings {part}")
        t = time.time()
        tf_g = tf.filter(F.col("grp") == g)
        # (file, row-group) units of this group's tf partition dir, for
        # the direct-pyarrow encode scan (build_postings_for falls back
        # to the DataFrame scan when the list is empty or disabled)
        units = tf_scan_units(store.path("tf", part))
        blocks = build_postings_for(tf_g, td, stats, cfg, scan_units=units)
        store.write(blocks, "postings", part=part, partition_by=["tbucket"])
        wall = time.time() - t
        if collect_metrics:
            # driver-side pyarrow aggregation -- same values as the former
            # read-back Spark job (groupBy shard: count, sum n, sum payload
            # lengths), no job scheduling on the critical path
            shard_rows = _postings_part_metrics(store.path("postings", part))
            tot_post = sum(r["postings"] for r in shard_rows)
            store.finish_part("postings", part, {
                "blocks": sum(r["blocks"] for r in shard_rows),
                "postings": tot_post,
                "bytes_compressed": sum(r["bytes"] for r in shard_rows),
                "postings_per_sec": tot_post / max(wall, 1e-9),
                "wall_sec": wall,
            })
            store.append_metrics(spark, [
                (store.build_id, "postings", r["shard"], r["postings"],
                 0.0, float(r["postings"]) / max(wall, 1e-9),
                 0, r["bytes"], wall)
                for r in shard_rows
            ])
        else:
            store.finish_part("postings", part, {"wall_sec": wall})

    def _attributes_task() -> None:
        # stage: attributes (consumes the materialized doclens table -- no
        # second tokenization, no posting-grain re-scan; tf fallback keeps
        # stores built before doclens existed resumable).  Depends only on
        # stats-stage outputs, so it runs CONCURRENTLY with the postings
        # groups (guide §2.6) and back-fills their serial tails.
        store.begin_stage("attributes")
        _tag_jobs(spark, "attributes")
        spark.sparkContext.setJobDescription("attributes")
        t = time.time()
        lens = store.read(spark, "doclens") if store.exists("doclens") else None
        store.write(
            attributes(unified, cfg, tf=tf, lens=lens)
            .repartition(cfg.num_doc_shards, "shard"),
            "attributes", partition_by=["shard"],
        )
        store.finish_stage("attributes", {"wall_sec": time.time() - t})

    pending = [
        g for g in range(cfg.shard_groups)
        if not store.stage_done("postings", f"grp={g}")
    ]
    # Overlap the independent jobs (guide §2.6): each postings group's
    # stages have serial tails (global merge exchange, 1-task dirs of the
    # dynamic-partition write) that leave most cores idle; concurrent
    # submission back-fills them with the next group's (and the attributes
    # stage's) tasks.  Memory per TASK is unchanged (the scheduler still
    # caps concurrent tasks at the core count), so the overlap is safe at
    # any scale; the env knob keeps the serial order reproducible for A/Bs.
    n_jobs = int(os.environ.get("SPARK_GRAFT_POSTINGS_JOBS", "0")) \
        or min(len(pending), 4)
    tasks = [(lambda g=g: _one_group(g)) for g in pending]
    if not store.stage_done("attributes"):
        tasks.append(_attributes_task)
    if _use_tid_keys():
        # 64-bit tid collision guard (verify_tid_unique docstring): a
        # vocab-sized job that used to sit serially at the end of the
        # stats stage; as a pool task it hides under the postings groups.
        # Unconditional (even on a no-op resume) so that "this invocation
        # returned" always implies "the served dictionary was verified" --
        # a raise here propagates before finish_stage("postings").
        def _verify_task():
            _tag_jobs(spark, "postings")
            spark.sparkContext.setJobDescription("verify tid uniqueness")
            verify_tid_unique(td)

        tasks.append(_verify_task)
    if len(tasks) > 1 and n_jobs > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(n_jobs + 1, len(tasks))) as pool:
            futures = [pool.submit(t) for t in tasks]
            for f in futures:
                f.result()
    else:
        for t_ in tasks:
            t_()
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_batch)
    store.finish_stage("postings")

    # stage: graph (optional) -- per-shard HNSW over stored embeddings,
    # the Vespa hnsw-attribute analog (doc.sd:55-60); serve's
    # semantic_mode="graph" loads it (operators/graph_ann.py docstring)
    if cfg.graph_ann and not store.stage_done("graph"):
        store.begin_stage("graph")
        _tag_jobs(spark, "graph")
        t = time.time()
        from .graph_ann import build_graph_table
        store.write(
            build_graph_table(store.read(spark, "attributes"), cfg),
            "graph", partition_by=["shard"],
        )
        store.finish_stage("graph", {"wall_sec": time.time() - t})


def compact(
    spark: SparkSession,
    base: IndexStore,
    out: IndexStore,
    cfg: Optional[IndexConfig] = None,
    collect_metrics: bool = True,
) -> IndexStore:
    """Merge the base segment with all streamed delta segments into a fresh
    consolidated index (the Lucene force-merge analog).

    Corpus statistics, the term dictionary (including terms that only exist
    in deltas) and all posting lists are recomputed from the union, so the
    compacted index scores exactly like a from-scratch build over the same
    corpus (tested in tests/test_streaming.py).  ``out`` is stage-
    checkpointed like a normal build.  The document store tables
    (docs/chunks) stay in the base store.
    """
    if cfg is None:
        saved = base.manifest.get("index_config")
        if saved:
            saved = dict(saved)
            saved["fields"] = tuple(saved.get("fields", ()))
            cfg = IndexConfig(**saved)
        else:
            cfg = IndexConfig()
    from dataclasses import asdict
    cfg_dict = asdict(cfg)
    cfg_dict["fields"] = list(cfg_dict["fields"])
    out.manifest["index_config"] = cfg_dict
    out.manifest["compacted_from"] = base.build_id
    out._write_manifest()

    def make_unified():
        u = base.read(spark, "unified")
        if base.has_parts("unified_delta"):
            u = u.unionByName(base.read_parts(spark, "unified_delta"))
        return assign_layout(u.drop("shard", "local_id"), cfg)

    _index_stages_from_unified(spark, out, cfg, make_unified, collect_metrics)
    return out


def compact_tiered(
    spark: SparkSession,
    base: IndexStore,
    out: IndexStore,
    cfg: Optional[IndexConfig] = None,
) -> IndexStore:
    """Tiered delta compaction: merge base + streamed delta segments into a
    consolidated index re-tokenizing ONLY the delta documents (verdict-r4
    task 4 -- ``compact`` re-runs the full pipeline from text, which at
    100 TB with continuous ingest is a full rebuild per compaction; here
    the base tier's text is never touched).

    Everything base-sized re-derives from already-materialized artifacts:

    - corpus stats (n_docs/avgdl per field) from the union of attribute
      length columns -- exact: the same integral dl values a full rebuild
      would aggregate, so avgdl is bit-identical;
    - the dictionary df from base term_dict df + a re-tokenize of the
      delta docs only (the stored delta segments inner-joined the BASE
      dictionary at stream time, so brand-new terms were dropped there by
      design and must enter here); idf re-derives from the updated
      (df, n_docs) with the same expression;
    - base posting blocks pass through payload-unchanged with only their
      block-grain max_score rebounded under the new stats (sound
      inflation, see the postings stage comment); fresh delta postings
      encode from the delta re-tokenize.  No posting-grain byte of the
      base tier is decoded or moved beyond the block-table rewrite;
    - attributes / unified by segment concatenation (delta local_ids were
      offset past every earlier segment at stream time, so the per-shard
      id space is already dense and disjoint).

    The result scores EXACTLY like a full rebuild over the same corpus
    (same raw tf, dl, df, n_docs, avgdl, and the same fl op order in the
    kernels); only the internal (shard, local_id) layout differs (a full
    rebuild re-interleaves ids).  Rank/score parity vs ``compact`` is
    asserted in tests/test_streaming.py.  Document-store tables
    (docs/chunks) stay in ``base``, as with ``compact``.
    """
    if cfg is None:
        saved = base.manifest.get("index_config")
        if saved:
            saved = dict(saved)
            saved["fields"] = tuple(saved.get("fields", ()))
            cfg = IndexConfig(**saved)
        else:
            cfg = IndexConfig()
    from dataclasses import asdict
    cfg_dict = asdict(cfg)
    cfg_dict["fields"] = list(cfg_dict["fields"])
    out.manifest["index_config"] = cfg_dict
    out.manifest["compacted_from"] = base.build_id
    out.manifest["compaction"] = "tiered"
    out._write_manifest()
    t_all = time.time()

    # unified: segment concat, ids kept (dense + disjoint by construction)
    if not out.stage_done("unified"):
        out.begin_stage("unified")
        t = time.time()
        u = base.read(spark, "unified")
        if base.has_parts("unified_delta"):
            u = u.unionByName(
                base.read_parts(spark, "unified_delta")
            )
        out.write(u.repartition(cfg.num_doc_shards, "shard"), "unified",
                  partition_by=["shard"], options=DOC_STORE_WRITE_OPTS)
        out.finish_stage("unified", {"wall_sec": time.time() - t})

    # attributes: segment concat
    if not out.stage_done("attributes"):
        out.begin_stage("attributes")
        t = time.time()
        a = base.read(spark, "attributes")
        if base.has_parts("attributes_delta"):
            a = a.unionByName(base.read_parts(spark, "attributes_delta"))
        out.write(a.repartition(cfg.num_doc_shards, "shard"), "attributes",
                  partition_by=["shard"])
        out.finish_stage("attributes", {"wall_sec": time.time() - t})

    attrs = out.read(spark, "attributes")

    # stats + dictionary: vocab/doc-grain only, no corpus pass
    if not out.stage_done("stats"):
        out.begin_stage("stats")
        t = time.time()
        nf = len(cfg.fields)
        stacked = attrs.select(F.expr(
            "stack({}, {}) as (field, dl)".format(
                nf, ", ".join(f"'{f}', len_{f}" for f in cfg.fields)
            )
        )).filter(F.col("dl") > 0)
        out.write(
            stacked.groupBy("field").agg(
                F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
            ),
            "corpus_stats",
        )
        stats = out.read(spark, "corpus_stats")
        base_df = base.read(spark, "term_dict").select("field", "term", "df")
        if base.has_parts("unified_delta"):
            # delta docs RE-TOKENIZE (they are the small tier); the stored
            # delta segments cannot source the dictionary because their
            # postings inner-joined the BASE dictionary at stream time --
            # brand-new terms were dropped there by design and enter the
            # index here (streaming/incremental.py docstring)
            delta_tf = tokenize_tf(
                base.read_parts(spark, "unified_delta"), cfg
            )
            delta_df = (
                delta_tf.groupBy("fidx", "term")
                .agg(F.count(F.lit(1)).alias("df_delta"))
                .select(field_col(cfg).alias("field"), "term", "df_delta")
            )
            new_df = (
                base_df.join(delta_df, ["field", "term"], "full")
                .select(
                    "field", "term",
                    (F.coalesce(F.col("df"), F.lit(0))
                     + F.coalesce(F.col("df_delta"), F.lit(0))).alias("df"),
                )
            )
        else:
            new_df = base_df
        td = term_dict_from_df(new_df, stats, cfg)
        out.write(td.repartition(cfg.term_buckets, "tbucket"),
                  "term_dict", partition_by=["tbucket"])
        out.finish_stage("stats", {"wall_sec": time.time() - t})

    stats = out.read(spark, "corpus_stats")
    td = out.read(spark, "term_dict")

    # postings: base blocks pass through PAYLOAD-UNCHANGED; only the
    # block-grain max_score rebounds under the new stats.  stored bound =
    # idf_old * max_tfnorm (+eps); tfnorm is monotone-increasing in avgdl
    # (a larger avgdl shrinks every denominator), so
    # max_tfnorm_new <= max_tfnorm_old * max(1, avgdl_new/avgdl_old):
    # for avgdl_new >= old, tf + C*r >= r*(tf + C) for r =
    # old/new <= 1 gives tfnorm_new <= tfnorm_old/r; for avgdl_new < old
    # the old bound is already an upper bound.  new max_score =
    # old/idf_old * idf_new * inflation * (1+1e-12) (the extra eps covers
    # the division's rounding).  Pruning stays lossless -- serve recomputes
    # exact scores from the raw (tf, dl) either way -- bounds merely get
    # (1 + avgdl-drift) looser per tiered compaction; a periodic full
    # ``compact`` re-tightens them.  Zero posting-grain work for the base
    # tier: the A/B that motivated this (scripts/compaction_bench.py,
    # 120k pages) measured a decode-and-retile kernel at 2.2x the cost of
    # the from-scratch mapside encode, i.e. physical re-blocking pays
    # MORE than it saves; segment-consolidation semantics (Lucene tiered
    # merge policy) are the scalable shape.
    if not out.stage_done("postings"):
        out.begin_stage("postings")
        t = time.time()
        old_avg = {
            r["field"]: float(r["avgdl"])
            for r in base.read(spark, "corpus_stats").collect()
        }
        new_avg = {r["field"]: float(r["avgdl"]) for r in stats.collect()}
        inflate = F.coalesce(
            *[
                F.when(
                    F.col("field") == f,
                    F.lit(max(1.0, new_avg.get(f, 1.0) / old_avg.get(f, 1.0))),
                )
                for f in cfg.fields
            ],
            F.lit(1.0),
        )
        base_parts = [
            p for p in base.committed_parts("postings")
            if not p.startswith("delta=")
        ]
        post = spark.read.parquet(base.path("postings", base_parts[0]))
        for p in base_parts[1:]:
            post = post.unionByName(
                spark.read.parquet(base.path("postings", p))
            )
        old_idf = base.read(spark, "term_dict").select(
            "field", "term", F.col("idf").alias("idf_old")
        )
        reb = (
            post.join(old_idf, ["field", "term"])
            .join(td.select("field", "term", "idf"), ["field", "term"])
            .withColumn(
                "max_score",
                F.col("max_score") / F.col("idf_old") * F.col("idf")
                * inflate * F.lit(1.0 + 1e-12),
            )
            .drop("idf_old", "idf")
        )
        out.write(reb.repartition(cfg.term_buckets, "tbucket"),
                  "postings", part="grp=0", partition_by=["tbucket"])
        out.finish_part("postings", "grp=0", {"wall_sec": time.time() - t})
        # delta postings REGENERATE from the delta re-tokenize (the stored
        # delta parts dropped base-dictionary-unknown terms at stream time
        # and carry stale-stats bounds): superseded, not merged
        if base.has_parts("unified_delta"):
            t2 = time.time()
            delta_tf = tokenize_tf(
                base.read_parts(spark, "unified_delta"), cfg
            )
            fresh = build_postings_for(delta_tf, td, stats, cfg)
            out.write(fresh, "postings", part="grp=1",
                      partition_by=["tbucket"])
            out.finish_part("postings", "grp=1",
                            {"wall_sec": time.time() - t2})
        out.finish_stage("postings", {"wall_sec": time.time() - t})

    # graph (optional): per-shard HNSW over the merged attributes
    if cfg.graph_ann and not out.stage_done("graph"):
        out.begin_stage("graph")
        t = time.time()
        from .graph_ann import build_graph_table
        out.write(build_graph_table(attrs, cfg), "graph",
                  partition_by=["shard"])
        out.finish_stage("graph", {"wall_sec": time.time() - t})

    out.manifest["total_wall_sec"] = time.time() - t_all
    out._write_manifest()
    return out
