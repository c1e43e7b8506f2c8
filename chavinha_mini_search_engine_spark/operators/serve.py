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
both paths share ``_bm25_shard_kernel`` (operators/search.py), so scoring,
pruning, dedup and enrichment semantics are identical by construction.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from ..config import (
    BM25_CHUNK_WEIGHTS,
    BM25_FULL_WEIGHTS,
    DEFAULT_LIMIT,
    INDEXED_FIELDS,
    MAX_LIMIT,
    IndexConfig,
)
from ..oracle.embedder import embed_text
from ..sources.tables import IndexStore
from .search import _bm25_shard_kernel, _dynamic_snippet, _query_terms, clean_snippet

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


def _read_parts_arrow(root: str, columns: List[str]) -> pd.DataFrame:
    """Union a store table as pandas -- pure pyarrow, no Spark.

    A table whose top-level dirs share one hive key (shard=, tbucket=) is
    one dataset (keeping the key as a column); a table whose part names
    mix keys (postings: grp=/delta=) is read part by part -- inside a part
    the inner partitioning is consistent again."""
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
        frames.append(ds.to_table(columns=cols).to_pandas())
    return pd.concat(frames, ignore_index=True)


class ResidentSearcher:
    """In-process searcher over a built IndexStore (see module docstring)."""

    def __init__(self, store: IndexStore, cfg: Optional[IndexConfig] = None):
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

        # attributes -> one pandas frame per shard, sorted by local_id
        attrs = _read_parts_arrow(store.path("attributes"), ATTR_COLS)
        if store.exists("attributes_delta"):
            attrs = pd.concat(
                [attrs, _read_parts_arrow(store.path("attributes_delta"), ATTR_COLS)],
                ignore_index=True,
            )
        self.attr_by_shard: Dict[int, pd.DataFrame] = {
            int(s): g.sort_values("local_id").reset_index(drop=True)
            for s, g in attrs.groupby("shard")
        }

        # postings -> dict[(field, term, shard)] -> block frame
        post = _read_parts_arrow(store.path("postings"), POST_COLS)
        self.post_by_key: Dict[Tuple[str, str, int], pd.DataFrame] = {
            (f, t, int(s)): g.reset_index(drop=True)
            for (f, t, s), g in post.groupby(["field", "term", "shard"], sort=False)
        }

        # doc store for enrichment: kept LAZY -- content is the widest
        # column in the system, and a resident dict of every content string
        # would scale RAM with total corpus bytes.  Instead hold pyarrow
        # dataset handles and fetch only the <=k hit rows per query:
        # unified is hive-partitioned by shard (derivable driver-side from
        # the hit id, _enrich) and id-SORTED within each shard partition
        # (assign_layout orders local_id by id), so the per-query fetch
        # prunes to the hits' shard dirs and then to 1-2 row groups via
        # parquet min/max stats on id.
        self._doc_datasets = self._doc_handles(store.path("unified"))
        if store.exists("unified_delta"):
            self._doc_datasets += self._doc_handles(store.path("unified_delta"))

        self._empty_post = pd.DataFrame({c: [] for c in POST_COLS})

    @staticmethod
    def _doc_handles(root: str) -> list:
        entries = [
            d for d in os.listdir(root)
            if not d.startswith(("_", ".")) and "__tmp" not in d
        ]
        keys = {d.split("=", 1)[0] for d in entries if "=" in d}
        parts = (
            [os.path.join(root, d) for d in sorted(entries)]
            if len(keys) > 1 else [root]
        )
        return [pads.dataset(p, format="parquet", partitioning="hive") for p in parts]

    # -- query path (zero Spark jobs) --

    def search(self, query: str, search_type: str = "bm25",
               k: int = DEFAULT_LIMIT, semantic_mode: str = "exact") -> List[dict]:
        if not 1 <= k <= MAX_LIMIT:
            raise ValueError(f"limit must be in [1, {MAX_LIMIT}]")
        if search_type not in ("bm25", "semantic", "hybrid"):
            raise ValueError(f"invalid search_type {search_type}")
        if semantic_mode not in ("exact", "lsh"):
            raise ValueError(f"invalid semantic_mode {semantic_mode}")

        terms = _query_terms(query)
        fields = (
            ["title", "content", "description"] if search_type == "bm25"
            else list(INDEXED_FIELDS)
        )
        weights = BM25_FULL_WEIGHTS if search_type == "bm25" else {
            **BM25_FULL_WEIGHTS, "chunk_content": BM25_CHUNK_WEIGHTS["chunk_content"],
        }
        term_payload = {
            (f, t): (weights[f], self.term_dict[(f, t)][0])
            for f in fields for t in terms
            if (f, t) in self.term_dict and weights.get(f)
        }
        if search_type != "semantic" and not term_payload:
            return []
        qvec = embed_text(query) if search_type in ("semantic", "hybrid") else None
        avgdl = {f: self.stats.get(f, (0, 1.0))[1] or 1.0 for f in INDEXED_FIELDS}
        kernel = _bm25_shard_kernel(
            term_payload, avgdl, self.cfg.k1, self.cfg.b, k, search_type,
            qvec, full_only=(search_type == "bm25"),
        )

        probes = None
        if search_type == "semantic" and semantic_mode == "lsh":
            # HNSW-analog pruning, mirroring SearchEngine.search's lsh
            # branch: restrict candidates to chunks whose build-time
            # hyperplane bucket (attributes.sem_bucket) is within
            # probe_radius hamming bits of the query's bucket.
            from .search import semantic_probes

            probes = set(semantic_probes(self.cfg, qvec))

        outs = []
        for shard, attr in self.attr_by_shard.items():
            if search_type == "semantic":
                if probes is not None:
                    attr = attr[attr["sem_bucket"].isin(probes)]
                    if attr.empty:
                        continue
                post = self._empty_post
            else:
                blocks = [
                    self.post_by_key[key]
                    for (f, t) in term_payload
                    if (key := (f, t, shard)) in self.post_by_key
                ]
                if not blocks:
                    continue
                post = pd.concat(blocks, ignore_index=True)
            outs.append(kernel(post, attr))
        if not outs:
            return []
        merged = pd.concat(outs, ignore_index=True)
        if merged.empty:
            return []
        # global parent dedup + deterministic tie-break (D1), as in
        # SearchEngine's window
        merged["dedup_key"] = merged["parent_id"].where(
            merged["parent_id"].notna(), merged["id"]
        )
        merged = merged.sort_values(["score", "id"], ascending=[False, True])
        merged = merged.drop_duplicates("dedup_key", keep="first").head(k)
        return self._enrich(merged, terms)

    def _fetch_docrows(self, ids: List[str]) -> Dict[str, tuple]:
        """Fetch the <=k hit rows from the parquet doc store: shard dirs
        pruned via the driver-side xxhash twin, row groups pruned via the
        id-sorted parquet statistics.  Resident RAM therefore never holds
        the corpus' content strings (serve-path scale requirement)."""
        import pyarrow.compute as pc

        from ..functions.xxhash import spark_pmod_bucket

        shards = sorted(
            {spark_pmod_bucket(i, self.cfg.num_doc_shards) for i in ids}
        )
        out: Dict[str, tuple] = {}
        for ds in self._doc_datasets:
            filt = pc.field("id").isin(ids)
            if "shard" in ds.schema.names:
                filt = pc.field("shard").isin(shards) & filt
            tbl = ds.to_table(columns=DOC_COLS, filter=filt)
            for r in tbl.to_pandas().itertuples():
                out[r.id] = (r.url, r.domain, r.title, r.content, r.chunk_content)
        return out

    def _enrich(self, hits: pd.DataFrame, terms: List[str]) -> List[dict]:
        docrows = self._fetch_docrows(list(hits["id"]))
        out = []
        for rank, h in enumerate(hits.itertuples(), 1):
            m = docrows.get(h.id)
            url, domain, title, content, chunk_content = m or ("", "", "", "", "")
            if h.doc_type == "chunk":
                snippet = chunk_content or ""
                rid = h.parent_id or h.id
            else:
                snippet = _dynamic_snippet(content or "", terms)
                rid = h.id
            out.append({
                "rank": rank, "id": rid, "url": url,
                "title": title or "Untitled",
                "snippet": clean_snippet(snippet), "domain": domain,
                "relevance": float(h.score),
                "doc_type": h.parent_doc_type or h.doc_type or "general",
            })
        return out
