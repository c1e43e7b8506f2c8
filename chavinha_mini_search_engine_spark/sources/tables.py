"""Index storage + checkpoint manifest.

The design target is an Iceberg catalog (north_rule): every stage is one
atomic Iceberg commit and the checkpoint manifest row is written in the
same transaction.  This sandbox has no Iceberg runtime jars, so the store
falls back to parquet directories with rename-based atomic commits and a
JSON manifest -- the *resume semantics* (stage- and shard-group-level
skip of completed work, per-partition lineage + metrics) are identical and
tested (tests/test_resume.py).  On a real cluster, set ``iceberg_table``
naming and the writes below become ``df.writeTo(...)`` -- the call sites
are isolated here on purpose.

Layout under ``root``:
  manifest.json                 -- build_id, per-stage status + metrics
  docs/ chunks/ unified/        -- document tables (unified partitioned by shard)
  term_dict/ corpus_stats/      -- broadcastable stats
  doclens/                      -- per-(shard, local_id) field lengths
  postings/grp=K/               -- posting lists, committed per shard-group
  attributes/                   -- per-(shard, local_id) norms + embeddings
  build_metrics/                -- per-stage, per-partition lineage rows
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


# Writer options for the doc-store tables (unified / unified_delta), the
# only tables the serve path point-fetches by id:
# - 1 MB row groups: the footer-cached fetcher (_DocFetcher) decodes only
#   row groups whose id min/max match; with the 128 MB default one group
#   spans a whole shard and every <=k-row fetch decompresses the full
#   content column (measured 9.2 ms vs 29-36 ms p50 per 10-doc fetch at
#   1 MB vs 4-16 MB groups, 15k-doc shard).
# - dictionary encoding OFF: the wide columns (content, url, title, id)
#   are unique strings, so the writer builds and abandons a dictionary
#   per column chunk -- 30x more chunks at 1 MB groups.  Measured on a
#   4 GB 256-partition write: 1 MB+dict anti-scales (11.4/6.5 s at
#   local[4]/local[16] vs 6.5/2.1 for 128 MB) while 1 MB+nodict restores
#   default-block walls AND scaling (6.4/2.3 s); on-disk size is
#   byte-identical (snappy catches the low-cardinality columns' repeats
#   at page grain).  This is what made the unified stage the build's
#   worst scaler in the round-4 official pair (BENCH_SCALING.md).
DOC_STORE_WRITE_OPTS = {
    "parquet.block.size": str(1 << 20),
    "parquet.enable.dictionary": "false",
}


class IndexStore:
    def __init__(self, root: str, build_id: Optional[str] = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.json")
        m = self._read_manifest()
        if build_id is not None and m.get("build_id") not in (None, build_id):
            # a different build owns this dir: start fresh
            shutil.rmtree(root)
            os.makedirs(root, exist_ok=True)
            m = {}
        self.manifest = m or {
            "build_id": build_id or uuid.uuid4().hex,
            "stages": {},
        }
        if not m:
            # only materialize a fresh manifest; opening an existing store
            # must not write (concurrent read-only openers -- e.g. several
            # serving replicas attaching to one index -- would race on the
            # manifest tmp file)
            self._write_manifest()
        # unique-per-instance tmp suffix so any two writers that do race
        # (same store opened twice for building) still never collide
        self._tmp_tag = uuid.uuid4().hex[:8]
        # manifest mutations are serialized: postings shard-groups commit
        # from concurrent driver threads (guide §2.6 job overlap)
        self._manifest_lock = threading.Lock()

    @property
    def build_id(self) -> str:
        return self.manifest["build_id"]

    # --- manifest ---
    def _read_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {}

    def _write_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp_" + getattr(self, "_tmp_tag", "0")
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def stage_done(self, stage: str, part: Optional[str] = None) -> bool:
        st = self.manifest["stages"].get(stage)
        if not st:
            return False
        if part is None:
            return st.get("status") == "done"
        return st.get("parts", {}).get(part, {}).get("status") == "done"

    def begin_stage(self, stage: str) -> None:
        with self._manifest_lock:
            self.manifest["stages"].setdefault(
                stage, {"status": "running", "parts": {}}
            )["started_ts"] = time.time()
            self._write_manifest()

    def finish_stage(self, stage: str, metrics: Optional[dict] = None) -> None:
        with self._manifest_lock:
            st = self.manifest["stages"][stage]
            st["status"] = "done"
            st["finished_ts"] = time.time()
            if metrics:
                st["metrics"] = metrics
            self._write_manifest()

    def finish_part(self, stage: str, part: str, metrics: Optional[dict] = None) -> None:
        with self._manifest_lock:
            st = self.manifest["stages"].setdefault(stage, {"status": "running", "parts": {}})
            st.setdefault("parts", {})[part] = {
                "status": "done",
                "finished_ts": time.time(),
                "metrics": metrics or {},
            }
            self._write_manifest()

    # Tables whose top-level part dirs are committed individually via
    # ``finish_part`` under the listed manifest stage(s).  Every other
    # table is committed whole (one atomic rename in ``write``), so its
    # top-level entries are hive partition dirs / data files, not parts.
    _PART_STAGES = {
        "postings": ("postings", "stream_deltas"),
        "attributes_delta": ("stream_deltas",),
        "unified_delta": ("stream_deltas",),
    }

    def _done_part_names(self, stages) -> set:
        done = set()
        for st in stages:
            for p, info in self.manifest["stages"].get(st, {}).get("parts", {}).items():
                if info.get("status") == "done":
                    done.add(p)
        return done

    def list_parts(self, table: str) -> list:
        """Raw on-disk top-level entries of a table (tmp/hidden excluded)."""
        base = self.path(table)
        if not os.path.exists(base):
            return []
        return sorted(
            d for d in os.listdir(base)
            if not d.startswith(("_", ".")) and "__tmp" not in d
        )

    def committed_parts(self, table: str) -> list:
        """On-disk parts that the manifest has committed.

        The disk listing alone is NOT the source of truth: a writer that
        crashed between the (rename-atomic) part write and the manifest
        commit leaves an orphan part that must never be served — serving
        it would alias (shard, local_id) slots against the retry's
        segment (the positional serve accumulator then conflates distinct
        documents).  Iceberg gets this for free (uncommitted data files
        are invisible to snapshots); this is the parquet-dir analog.
        Whole-table-committed tables return their full listing (their
        rename IS the commit)."""
        entries = self.list_parts(table)
        stages = self._PART_STAGES.get(table)
        if stages is None:
            return entries
        done = self._done_part_names(stages)
        return [d for d in entries if d in done]

    def orphan_parts(self, table: str) -> list:
        """On-disk parts with no manifest commit (crashed-writer leftovers)."""
        stages = self._PART_STAGES.get(table)
        if stages is None:
            return []
        done = self._done_part_names(stages)
        return [d for d in self.list_parts(table) if d not in done]

    def gc_orphan_parts(self, tables=None) -> dict:
        """Remove uncommitted part dirs.  Safe by construction: an orphan
        part's batch was never committed to the stream checkpoint either
        (the manifest part commit happens before foreachBatch returns),
        so the source replays it.  Returns {table: [removed parts]}."""
        removed = {}
        for table in (tables or self._PART_STAGES):
            dead = self.orphan_parts(table)
            for d in dead:
                shutil.rmtree(os.path.join(self.path(table), d), ignore_errors=True)
            if dead:
                removed[table] = dead
        return removed

    def has_parts(self, table: str) -> bool:
        return bool(self.committed_parts(table))

    # --- table io (Iceberg writeTo on a real catalog) ---
    def path(self, table: str, part: Optional[str] = None) -> str:
        p = os.path.join(self.root, table)
        return os.path.join(p, part) if part else p

    def write(self, df: DataFrame, table: str, part: Optional[str] = None,
              partition_by: Optional[list] = None,
              options: Optional[dict] = None) -> str:
        """Atomic-ish: write to tmp, rename into place.

        ``options`` passes parquet writer options through -- the doc store
        (unified/unified_delta) sets a small ``parquet.block.size`` so
        point lookups decode a bounded row group instead of a whole
        shard's column chunk (serve-path enrichment reads <=k rows by id;
        one 128 MB-default row group makes the id-sorted min/max stats
        useless and every fetch decompress the full content column)."""
        final = self.path(table, part)
        tmp = final + f".__tmp_{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if options:
            w = w.options(**options)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(tmp, final)
        return final

    def read(self, spark: SparkSession, table: str, part: Optional[str] = None) -> DataFrame:
        return spark.read.parquet(self.path(table, part))

    def read_parts(self, spark: SparkSession, table: str) -> DataFrame:
        base = self.path(table)
        # manifest-committed parts only (never serve a crashed writer's
        # orphan segment -- see committed_parts)
        parts = [os.path.join(base, d) for d in self.committed_parts(table)]
        if not parts:
            raise FileNotFoundError(
                f"no committed parts for table {table!r} (gate callers on "
                f"has_parts); on disk: {self.list_parts(table)}"
            )
        # parts may use different key names (grp=, delta=), so read each
        # separately (inner partition dirs like tbucket= stay consistent)
        # and union -- the Lucene-segment view of base + delta segments
        dfs = [spark.read.parquet(p) for p in parts]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def exists(self, table: str, part: Optional[str] = None) -> bool:
        return os.path.exists(self.path(table, part))

    # build_metrics schema (FIXTURES.md): kept identical to what the
    # previous Spark `createDataFrame(...).write.parquet` emitted so old
    # and new part files union cleanly under one reader.
    _METRICS_FIELDS = (
        ("build_id", "string"), ("stage", "string"), ("shard", "int32"),
        ("rows", "int64"), ("docs_per_sec", "float64"),
        ("postings_per_sec", "float64"), ("bytes_in", "int64"),
        ("bytes_compressed", "int64"), ("wall_sec", "float64"),
    )

    def append_metrics(self, spark: SparkSession, rows: list) -> None:
        """Per-partition lineage/metrics rows (FIXTURES.md build_metrics).

        Written driver-side with pyarrow: the rows are per-shard scalars
        (KBs), so a Spark `createDataFrame + coalesce(1).write` job here
        was pure scheduling overhead -- one of 4+ such actions that made
        the postings stage spend 3x its actual compute wall in metrics
        bookkeeping (OPTIMIZATION_r06.md).  Schema and file layout are
        unchanged; `spark` stays in the signature for call-site compat."""
        if not rows:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [pa.field(n, getattr(pa, t)()) for n, t in self._METRICS_FIELDS]
        )
        cols = list(zip(*rows))
        tbl = pa.table(
            {f[0]: list(c) for f, c in zip(self._METRICS_FIELDS, cols)},
            schema=schema,
        )
        out = self.path("build_metrics", f"part={uuid.uuid4().hex[:8]}")
        tmp = out + f".__tmp_{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(tbl, os.path.join(tmp, "part-00000.parquet"))
        if os.path.exists(out):
            shutil.rmtree(out)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        os.replace(tmp, out)
