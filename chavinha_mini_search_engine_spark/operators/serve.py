"""Driver-resident serve path: the latency story (SURVEY.md §3.1, O1).

``SearchEngine`` answers queries with a Spark job per query -- correct and
the right shape for cluster-scale scatter/gather, but local-mode job
scheduling puts a ~0.3-0.5 s floor under every query, which is what
BENCH_r01 measured against the reference's ~10 ms resident Vespa server
(BASELINE.md).  This module is the resident analog: load the index ONCE
into in-process numpy/pandas structures (the Vespa content node's
memory-mapped attributes + hot posting pages, api/main.py:348-530 serving
loop), then answer each query with zero Spark jobs.

Scale story: at cluster scale each serving replica holds exactly its
document shards' slice of these structures (attributes + postings are both
partitioned by shard on disk, so a replica loads only its partitions); a
scatter/gather layer merges per-shard top-k -- the same global merge
``search()`` does across its in-process shards.  Here one process holds
all shards, matching the reference's single-node Vespa.

Rank/score parity with SearchEngine is asserted in tests/test_serve.py:
both paths share the numpy scoring core (operators/search.py score_shard /
topk_dedup -- the Spark path wraps it in the applyInPandas kernel), so
scoring, pruning, dedup and enrichment semantics are identical by
construction.  Here the pandas->numpy conversion (shard_state/post_groups)
runs ONCE at load; warm queries touch no pandas at all.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from ..config import (
    DEFAULT_LIMIT,
    MAX_LIMIT,
    IndexConfig,
)
from ..oracle.embedder import embed_text
from ..sources.tables import IndexStore
from .search import _dynamic_snippet, _query_terms, clean_snippet

ATTR_COLS = [
    "shard", "local_id", "id", "doc_type", "parent_id", "parent_doc_type",
    "len_title", "len_content", "len_description", "len_chunk_content",
    "embedding", "sem_bucket",
]
DOC_COLS = ["id", "url", "domain", "title", "content", "chunk_content"]
POST_COLS = [
    "field", "term", "shard", "block_idx", "first_local", "last_local",
    "n", "max_score", "doc_bytes", "tf_bytes",
]


def _read_parts_arrow(
    root: str, columns: List[str], part_names: Optional[List[str]] = None,
    filter=None,
) -> pd.DataFrame:
    """Union a store table as pandas -- pure pyarrow, no Spark.

    ``part_names`` (from ``IndexStore.committed_parts``) restricts a
    per-part-committed table (postings, *_delta) to manifest-committed
    segments, each read as its own dataset -- an orphan part left by a
    crashed writer must never reach the positional serve accumulator.
    Without it (whole-table-committed tables), a table whose top-level
    dirs share one hive key (shard=, tbucket=) is one dataset (keeping
    the key as a column)."""
    if part_names is not None:
        parts = [os.path.join(root, d) for d in part_names]
    else:
        entries = [
            d for d in os.listdir(root)
            if not d.startswith(("_", ".")) and "__tmp" not in d
        ]
        keys = {d.split("=", 1)[0] for d in entries if "=" in d}
        parts = (
            [os.path.join(root, d) for d in sorted(entries)]
            if len(keys) > 1 else [root]
        )
    frames = []
    for p in parts:
        ds = pads.dataset(p, format="parquet", partitioning="hive")
        cols = [c for c in columns if c in ds.schema.names]
        f = filter if filter is None or "shard" in ds.schema.names else None
        frames.append(ds.to_table(columns=cols, filter=f).to_pandas())
    return pd.concat(frames, ignore_index=True)


class _DocFetcher:
    """Point-fetch of <=k doc rows by id from the parquet doc store.

    The serving analog of a doc-store lookup (Vespa's summary fetch):
    per-query cost must be O(hits), not O(files).  A generic
    ``pyarrow.dataset`` scan pays ~3-8 ms of scan setup PER FILE PER
    QUERY (fragment stat evaluation + reader construction), which at 64
    shards made a 10-hit enrichment cost ~80 ms warm -- dwarfing
    scoring.  Here each touched file's footer is parsed once and its
    per-row-group id min/max statistics cached (unified is id-sorted
    within shard and written with ~1 MB row groups, so stats prune to
    one row group per hit); a fetch decodes only matching row groups,
    one thread per file (pyarrow releases the GIL during decode).
    """

    # decoded-row-group summary cache entries shared by all fetchers in
    # the process (the Vespa summary-cache analog): repeated hits on hot
    # documents skip the ~0.4 ms/row-group parquet decode entirely.
    # Bounded LRU; ~1 MB decoded per entry at the doc-store row-group
    # size, so the default caps resident cache memory at ~64 MB.
    CACHE_ROW_GROUPS = int(os.environ.get("SPARK_GRAFT_SUMMARY_CACHE_RGS", "64"))

    def __init__(self, root: Optional[str] = None):
        from collections import OrderedDict

        self._by_shard: Dict[Optional[int], List[str]] = {}
        self._meta: Dict[str, tuple] = {}
        self._pool = None  # decode pool for LARGE fetches, created on use
        self._rg_cache: "OrderedDict[tuple, object]" = OrderedDict()
        self._cache_lock = threading.Lock()
        if root:
            self.add_root(root)

    def add_root(self, root: str) -> None:
        for d in sorted(os.listdir(root)):
            p = os.path.join(root, d)
            if d.startswith(("_", ".")) or "__tmp" in d:
                continue
            if d.startswith("shard=") and os.path.isdir(p):
                s = int(d.split("=", 1)[1])
                for f in sorted(os.listdir(p)):
                    if f.endswith(".parquet"):
                        self._by_shard.setdefault(s, []).append(
                            os.path.join(p, f))
            elif d.endswith(".parquet"):
                # un-partitioned file (e.g. a streaming delta part):
                # candidate for any shard, checked once per fetch
                self._by_shard.setdefault(None, []).append(p)
            elif os.path.isdir(p):
                self.add_root(p)

    def _file_meta(self, path: str) -> tuple:
        m = self._meta.get(path)
        if m is None:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(path)
            md = pf.metadata
            col = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "id"
            ) if md.num_row_groups else 0
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col).statistics
                if st is None or not st.has_min_max:
                    mins.append(None)  # no stats -> never prune this rg
                    maxs.append(None)
                else:
                    mins.append(st.min)
                    maxs.append(st.max)
            m = (pf, mins, maxs)
            self._meta[path] = m
        return m

    def fetch(self, ids: List[str], columns: List[str],
              shard_of, num_shards: int) -> Dict[str, tuple]:
        """ids -> {id: row tuple in ``columns`` order (sans id)}.
        ``shard_of(id, num_shards)`` is the build's xxhash shard twin."""
        import pyarrow as pa
        import pyarrow.compute as pc

        wanted_by_shard: Dict[Optional[int], List[str]] = {}
        for i in ids:
            wanted_by_shard.setdefault(shard_of(i, num_shards), []).append(i)
        tasks: List[Tuple[str, List[str]]] = []
        for s, wanted in wanted_by_shard.items():
            for path in self._by_shard.get(s, ()):
                tasks.append((path, wanted))
        for path in self._by_shard.get(None, ()):
            tasks.append((path, list(ids)))

        cols_key = tuple(columns)

        def read_rg(path, pf, rg):
            key = (path, rg, cols_key)
            with self._cache_lock:
                t = self._rg_cache.get(key)
                if t is not None:
                    self._rg_cache.move_to_end(key)
                    return t
            t = pf.read_row_groups([rg], columns=columns, use_threads=False)
            with self._cache_lock:
                self._rg_cache[key] = t
                while len(self._rg_cache) > self.CACHE_ROW_GROUPS:
                    self._rg_cache.popitem(last=False)
            return t

        def one(task):
            path, wanted = task
            pf, mins, maxs = self._file_meta(path)
            rgs = [
                i for i in range(len(mins))
                if mins[i] is None
                or any(mins[i] <= w <= maxs[i] for w in wanted)
            ]
            if not rgs:
                return None
            tbl = pa.concat_tables([read_rg(path, pf, rg) for rg in rgs])
            return tbl.filter(pc.is_in(tbl.column("id"),
                                       value_set=pa.array(wanted)))

        # serial below a task threshold: a <=k-hit fetch touches ~k files
        # x 1 row group, and an A/B on exactly that shape measured the
        # thread pool 3-4x SLOWER than a serial loop (GIL handoff + pool
        # dispatch dwarf the ~0.4 ms GIL-released decode per group).
        # Thread-parallel decode only pays off when a fetch touches many
        # files (wide delta fan-out, large k).
        if len(tasks) > 16:
            # persistent pool, not per-query: spawning + joining a fresh
            # ThreadPoolExecutor per fetch costs ~1-2 ms of thread churn
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=8)
            results = list(self._pool.map(one, tasks))
        else:
            results = [one(t) for t in tasks]
        out: Dict[str, tuple] = {}
        rest = [c for c in columns if c != "id"]
        for tbl in results:
            if tbl is None or tbl.num_rows == 0:
                continue
            d = {c: tbl.column(c).to_pylist() for c in columns}
            for j in range(tbl.num_rows):
                out[d["id"][j]] = tuple(d[c][j] for c in rest)
        return out


class ResidentSearcher:
    """In-process searcher over a built IndexStore (see module docstring).

    ``shards``: optional shard-id subset — the content-node deployment
    shape.  A replica constructed with a subset loads ONLY those shards'
    attribute states / posting groups / graph rows (the tables are
    hive-partitioned by shard on disk, so the pyarrow reads prune at the
    directory level) and answers ``search_candidates`` for them; a
    gateway (any process holding the term dictionary + doc handles, e.g.
    a ``shards=()`` instance) merges candidate sets from all replicas
    with ``merge_candidates`` and enriches — identical semantics to a
    single all-shards ``search()`` because that method is now literally
    the composition of the two halves over one process's shards.
    """

    def __init__(self, store: IndexStore, cfg: Optional[IndexConfig] = None,
                 shards: Optional[List[int]] = None):
        self.shards = None if shards is None else {int(s) for s in shards}
        if cfg is None:
            saved = store.manifest.get("index_config")
            if saved:
                saved = dict(saved)
                saved["fields"] = tuple(saved.get("fields", ()))
                cfg = IndexConfig(**saved)
        self.cfg = cfg or IndexConfig()

        # corpus stats + term dictionary -> plain dicts
        stats = _read_parts_arrow(store.path("corpus_stats"), ["field", "n_docs", "avgdl"])
        self.stats = {
            r.field: (int(r.n_docs), float(r.avgdl)) for r in stats.itertuples()
        }
        td = _read_parts_arrow(store.path("term_dict"), ["field", "term", "df", "idf"])
        self.term_dict: Dict[Tuple[str, str], Tuple[float, int]] = {
            (r.field, r.term): (float(r.idf), int(r.df)) for r in td.itertuples()
        }

        # attributes -> ONE fused numpy state covering every local shard
        # (per-shard dense local-id spaces laid out back-to-back, ascending
        # shard order) + zero-copy per-shard views.  The pandas->numpy
        # conversion happens ONCE here instead of on every query, and warm
        # queries score ALL shards in one numpy pass over the fused state
        # instead of a python loop of ~15 small-array calls per term per
        # shard (the dominant resident-latency term once pandas was gone).
        from .search import fused_state, post_groups, state_view

        # shard-subset (content-node) pruning: hive shard= tables prune at
        # the directory level, the tbucket-partitioned postings table
        # filters rows (a cluster deployment would co-partition postings
        # by shard per node; the filter is the single-disk stand-in)
        shard_filter = None
        if self.shards is not None:
            import pyarrow.compute as pc

            shard_filter = pc.field("shard").isin(sorted(self.shards))

        # cfg-derived so a custom-schema store (fewer indexed fields ->
        # fewer len_* columns) loads; the default equals ATTR_COLS
        attr_cols = [
            "shard", "local_id", "id", "doc_type", "parent_id",
            "parent_doc_type",
        ] + [f"len_{f}" for f in self.cfg.fields] + ["embedding", "sem_bucket"]
        attrs = _read_parts_arrow(store.path("attributes"), attr_cols,
                                  filter=shard_filter)
        if store.has_parts("attributes_delta"):
            attrs = pd.concat(
                [attrs, _read_parts_arrow(
                    store.path("attributes_delta"), attr_cols,
                    part_names=store.committed_parts("attributes_delta"),
                    filter=shard_filter)],
                ignore_index=True,
            )
        if len(attrs):
            self.fused, self.shard_offsets = fused_state(attrs)
            off_items = sorted(self.shard_offsets.items())
            bounds = [o for _, o in off_items] + [self.fused.n_docs]
            self.state_by_shard = {
                s: state_view(self.fused, bounds[i], bounds[i + 1])
                for i, (s, _) in enumerate(off_items)
            }
        else:  # gateway instance (shards=[]): no content resident
            self.fused, self.shard_offsets = None, {}
            self.state_by_shard = {}

        # postings -> dict[(field, term, shard)] -> block array group
        # (field, term, firsts, lasts, maxs, ns, doc_bytes, tf_bytes)
        post = _read_parts_arrow(
            store.path("postings"), POST_COLS,
            part_names=store.committed_parts("postings"),
            filter=shard_filter,
        )
        self.post_by_key: Dict[Tuple[str, str, int], tuple] = {}
        for s, g in post.groupby("shard", sort=False):
            for grp in post_groups(g):
                self.post_by_key[(grp[0], grp[1], int(s))] = grp

        # fused posting groups: block ranges globalized with the shard
        # offsets + per-block base offsets for the decode (search.
        # score_shard `boffs`), so one score_shard call covers all local
        # shards.  Payload byte objects are shared with post_by_key.
        by_ft: Dict[Tuple[str, str], list] = {}
        for (f, t, s), grp in self.post_by_key.items():
            if s in self.shard_offsets:
                by_ft.setdefault((f, t), []).append((s, grp))
        self.post_fused: Dict[Tuple[str, str], tuple] = {}
        for (f, t), lst in by_ft.items():
            lst.sort(key=lambda e: e[0])
            firsts, lasts, maxs, ns, docb, tfb, boffs = [], [], [], [], [], [], []
            for s, grp in lst:
                off = self.shard_offsets[s]
                firsts.append(grp[2] + off)
                lasts.append(grp[3] + off)
                maxs.append(grp[4])
                ns.append(grp[5])
                docb.append(grp[6])
                tfb.append(grp[7])
                boffs.append(np.full(len(grp[2]), off, dtype=np.int64))
            self.post_fused[(f, t)] = (
                f, t, np.concatenate(firsts), np.concatenate(lasts),
                np.concatenate(maxs), np.concatenate(ns),
                np.concatenate(docb), np.concatenate(tfb),
                np.concatenate(boffs),
            )

        # doc store for enrichment: kept LAZY -- content is the widest
        # column in the system, and a resident dict of every content string
        # would scale RAM with total corpus bytes.  Per-shard point-fetch
        # structures instead (_DocFetcher): unified is hive-partitioned by
        # shard (derivable driver-side from the hit id) and id-SORTED
        # within each shard partition (assign_layout orders local_id by
        # id) with bounded ~1 MB row groups (tables.write), so a fetch
        # parses each touched file's footer ONCE (cached id min/max per
        # row group) and then decodes only the <=k matching row groups,
        # thread-parallel across shards.  The generic pyarrow dataset
        # scan this replaces cost ~8 ms of scan setup per shard file per
        # query -- 80 ms for a 10-hit enrichment, dwarfing scoring.
        # hot-postings cache: decoded (positions, query-independent BM25
        # contribution) per (shard, field, term), LRU-bounded -- see
        # search.PostingsCache for the soundness argument
        from .search import PostingsCache

        self._postings_cache = PostingsCache()
        self._doc_fetcher = _DocFetcher(store.path("unified"))
        if store.has_parts("unified_delta"):
            for part in store.committed_parts("unified_delta"):
                self._doc_fetcher.add_root(
                    os.path.join(store.path("unified_delta"), part))

        # graph-ANN (HNSW) serve structures: persisted per-shard rows if
        # the build ran with cfg.graph_ann (the Vespa hnsw-attribute
        # analog), rebuilt lazily per shard otherwise; frozen graphs are
        # cached per shard after first use
        self._graph_rows_by_shard: Dict[int, pd.DataFrame] = {}
        if store.exists("graph"):
            grows = _read_parts_arrow(
                store.path("graph"), ["shard", "local_id", "level", "nbrs"],
                filter=shard_filter,
            )
            self._graph_rows_by_shard = {
                int(s): g for s, g in grows.groupby("shard")
            }
        self._graphs: Dict[int, tuple] = {}

    # -- query path (zero Spark jobs) --

    def search_candidates(
        self, query: str, search_type: str = "bm25",
        k: int = DEFAULT_LIMIT, semantic_mode: str = "exact",
    ) -> Optional[Tuple[np.ndarray, ...]]:
        """Scatter half of the query: score THIS process's shards and
        return its candidate pool as 7 aligned arrays (ids, sort keys,
        dedup keys, parents, doc_types, parent_doc_types, scores), or
        None if nothing matched locally.  Each per-shard selection is
        already top-k-deduped, so a pool holds <= k * n_local_shards
        rows -- the scatter/gather payload a content node ships to the
        gateway.  ``search()`` is exactly merge+enrich over one
        process's pool, so rank/score parity tests on it cover this
        decomposition by construction."""
        if not 1 <= k <= MAX_LIMIT:
            raise ValueError(f"limit must be in [1, {MAX_LIMIT}]")
        if search_type not in ("bm25", "semantic", "hybrid"):
            raise ValueError(f"invalid search_type {search_type}")
        if semantic_mode not in ("exact", "lsh", "graph"):
            raise ValueError(f"invalid semantic_mode {semantic_mode}")

        terms = _query_terms(query)
        from .search import _query_fields_weights

        fields, weights = _query_fields_weights(self.cfg, search_type)
        term_payload = {
            (f, t): (weights[f], self.term_dict[(f, t)][0])
            for f in fields for t in terms
            if (f, t) in self.term_dict and weights.get(f)
        }
        if search_type != "semantic" and not term_payload:
            return None
        qvec = embed_text(query) if search_type in ("semantic", "hybrid") else None
        q64 = np.asarray(qvec, dtype=np.float64) if qvec is not None else None
        avgdl = {f: self.stats.get(f, (0, 1.0))[1] or 1.0 for f in self.cfg.fields}

        probes = None
        if search_type == "semantic" and semantic_mode == "lsh":
            # HNSW-analog pruning, mirroring SearchEngine.search's lsh
            # branch: restrict candidates to chunks whose build-time
            # hyperplane bucket (attributes.sem_bucket) is within
            # probe_radius hamming bits of the query's bucket.
            from .search import semantic_probes

            probes = semantic_probes(self.cfg, qvec)

        # fused numpy core (same score_shard/topk_dedup the Spark kernel
        # wraps per shard): ONE pass over the fused all-local-shards state
        from .search import score_shard, topk_dedup

        full_only = search_type == "bm25"
        if search_type == "semantic" and semantic_mode == "graph":
            # graph mode stays per-shard: HNSW graphs are built/persisted
            # per content shard (the Vespa content-node analog)
            sel_ids, sel_sort, sel_keys = [], [], []
            sel_parents, sel_dts, sel_pdts, sel_scores = [], [], [], []
            for shard, state in self.state_by_shard.items():
                cand, scores = self._graph_search(shard, state, q64, k)
                if not len(cand):
                    continue
                keep, s = topk_dedup(state, cand, scores, k)
                sel_ids.append(state.ids[keep])
                sel_sort.append(state.ids_sort[keep])
                sel_keys.append(state.dedup_keys[keep])
                sel_parents.append(state.parents[keep])
                sel_dts.append(state.doc_types[keep])
                sel_pdts.append(state.parent_doc_types[keep])
                sel_scores.append(s)
            if not sel_ids:
                return None
            return tuple(
                np.concatenate(x)
                for x in (sel_ids, sel_sort, sel_keys, sel_parents,
                          sel_dts, sel_pdts, sel_scores)
            )

        state = self.fused
        if state is None:
            return None
        if search_type == "semantic":
            groups = []
        else:
            groups = [
                self.post_fused[key]
                for (f, t) in term_payload
                if (key := (f, t)) in self.post_fused
            ]
            if not groups:
                return None
        cand, scores = score_shard(
            state, groups, term_payload, avgdl, self.cfg.k1, self.cfg.b,
            k, search_type, q64, full_only, probe_buckets=probes,
            decode_cache=self._postings_cache, cache_shard=None,
        )
        if not len(cand):
            return None
        keep, s = topk_dedup(state, cand, scores, k)
        return (
            state.ids[keep], state.ids_sort[keep], state.dedup_keys[keep],
            state.parents[keep], state.doc_types[keep],
            state.parent_doc_types[keep], s,
        )

    @staticmethod
    def merge_candidates(
        pools: List[Optional[Tuple[np.ndarray, ...]]], k: int
    ) -> List[tuple]:
        """Gather half: global merge across candidate pools (one per
        content node) -- parent dedup + deterministic tie-break (D1), as
        in SearchEngine's window.  Input order is irrelevant: the sort
        key (score, ids_sort) is a total order because ids_sort is
        unique per doc and a doc lives in exactly one shard, so any
        partition of shards over processes merges identically."""
        pools = [p for p in pools if p is not None]
        if not pools:
            return []
        ids, sort, keys, parents, dts, pdts, scores = (
            np.concatenate([p[i] for p in pools]) for i in range(7)
        )
        order = np.lexsort((sort, -scores))
        _, first = np.unique(keys[order], return_index=True)
        keep = order[np.sort(first)[:k]]
        return [
            (ids[i], parents[i], dts[i], pdts[i], float(scores[i]))
            for i in keep
        ]

    def search_candidates_filled(
        self, query: str, search_type: str = "bm25",
        k: int = DEFAULT_LIMIT, semantic_mode: str = "exact",
    ) -> Tuple[Optional[Tuple[np.ndarray, ...]], Dict[str, tuple]]:
        """Scatter half + SPECULATIVE summary fill in one round trip: the
        candidate pool plus doc rows for this node's local top-k.

        Eliminates the gateway's second fill round trip (measured as the
        dominant scatter fixed cost, ~6.5-10.6 ms/query at P=4 --
        scripts/scatter_probe.py): every node fills its own likely
        winners concurrently while the gateway is still collecting pools.
        Sound because a global winner is always inside its node's local
        top-k-by-dedup-key: if >= k dedup keys beat a doc on its own node,
        those same keys' global best scores are >= their local ones, so
        they beat it globally too and the doc cannot enter the merged
        top-k.  (Keys CAN span nodes -- chunks shard by chunk id -- but
        cross-node collapse only raises a key's best score, never lowers
        it.)  The gateway still backstops any miss with its own fetch
        (run_scatter in scripts/query_scaling_bench.py)."""
        pool = self.search_candidates(query, search_type, k, semantic_mode)
        if pool is None:
            return None, {}
        hits = ResidentSearcher.merge_candidates([pool], k)
        rows = self.fill_docrows([str(h[0]) for h in hits])
        return pool, rows

    def search(self, query: str, search_type: str = "bm25",
               k: int = DEFAULT_LIMIT, semantic_mode: str = "exact") -> List[dict]:
        pool = self.search_candidates(query, search_type, k, semantic_mode)
        if pool is None:
            return []
        hits = self.merge_candidates([pool], k)
        return self._enrich(hits, _query_terms(query))

    def _graph_for(self, shard: int, state, dim: int):
        """(HnswGraph, subset positions) for a shard, cached.  Prefers the
        build-time persisted graph table; falls back to a lazy in-memory
        build over the shard's embedded chunk docs (same deterministic
        construction, so both paths answer identically).

        Streamed delta docs are not in the persisted base graph, so graph
        mode reaches them only after compaction — the same reachability
        caveat as lsh mode's null sem_bucket (index_build.attributes
        docstring); exact mode always sees them."""
        hit = self._graphs.get(shard)
        if hit is not None:
            return hit
        from .graph_ann import build_hnsw, graph_from_rows

        m64, has = state.embmat(dim)
        rows = self._graph_rows_by_shard.get(shard)
        if rows is not None and len(rows):
            rows = rows.sort_values("local_id")
            sub = rows["local_id"].to_numpy(dtype=np.int64)
            g = graph_from_rows(
                sub, rows["level"].to_numpy(),
                rows["nbrs"].to_numpy(), m=self.cfg.graph_m,
            )
        else:
            sub = np.flatnonzero(has & ~state.is_full)
            g = (
                build_hnsw(
                    m64[sub], m=self.cfg.graph_m,
                    ef_construction=self.cfg.graph_ef_construction,
                    seed=self.cfg.graph_seed,
                )
                if len(sub) else None
            )
        self._graphs[shard] = (g, sub)
        return g, sub

    def _graph_search(self, shard: int, state, q64: np.ndarray, k: int):
        """Per-shard HNSW query -> (positions, closeness) in the same
        closeness(angular) units as exact semantic mode."""
        from .graph_ann import search_hnsw

        g, sub = self._graph_for(shard, state, len(q64))
        if g is None or not len(sub):
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        m64, _ = state.embmat(len(q64))
        # over-fetch beyond k so cross-shard merge + parent dedup still
        # sees enough distinct candidates (same reason the lsh path scores
        # every probed bucket)
        idx, sims = search_hnsw(
            m64[sub], g, q64, max(k * 2, k + 8),
            ef_search=max(self.cfg.graph_ef_search, k * 2),
        )
        cl = 1.0 / (1.0 + np.arccos(np.clip(sims, -1.0, 1.0)))
        return sub[idx], cl

    def _fetch_docrows(self, ids: List[str]) -> Dict[str, tuple]:
        """Fetch the <=k hit rows from the parquet doc store: shard files
        located via the driver-side xxhash twin, row groups pruned via
        cached footer statistics (_DocFetcher).  Resident RAM therefore
        never holds the corpus' content strings (serve-path scale
        requirement)."""
        from ..functions.xxhash import spark_pmod_bucket

        return self._doc_fetcher.fetch(
            ids, DOC_COLS, spark_pmod_bucket, self.cfg.num_doc_shards)

    def fill_docrows(self, ids: List[str]) -> Dict[str, tuple]:
        """Two-phase summary fill (the Vespa match-then-fill analog,
        reference config/vespa/services.xml content cluster): a gateway
        that merged candidate ids across content nodes asks each OWNING
        node for just its hits' doc rows, so the ≤k-row doc-store fetch
        is parallel across nodes and hits each node's warm footer cache.
        Pass the result to ``_enrich(..., docrows=...)``."""
        return self._fetch_docrows(ids)

    def _enrich(self, hits: List[tuple], terms: List[str],
                docrows: Optional[Dict[str, tuple]] = None) -> List[dict]:
        """hits: [(id, parent_id, doc_type, parent_doc_type, score)] in
        final rank order.  ``docrows`` (optional) is a prefetched
        fill_docrows result; when absent the gateway fetches itself."""
        if not hits:
            return []
        if docrows is None:
            docrows = self._fetch_docrows([str(h[0]) for h in hits])
        out = []
        for rank, (hid, parent_id, doc_type, parent_doc_type, score) \
                in enumerate(hits, 1):
            m = docrows.get(hid)
            url, domain, title, content, chunk_content = m or ("", "", "", "", "")
            if doc_type == "chunk":
                snippet = chunk_content or ""
                rid = parent_id or hid
            else:
                snippet = _dynamic_snippet(content or "", terms)
                rid = hid
            out.append({
                "rank": rank, "id": rid, "url": url,
                "title": title or "Untitled",
                "snippet": clean_snippet(snippet), "domain": domain,
                "relevance": float(score),
                "doc_type": parent_doc_type or doc_type or "general",
            })
        return out
