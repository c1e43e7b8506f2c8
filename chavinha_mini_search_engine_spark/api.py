"""Search API facade -- parameter/validation/response parity with the
reference FastAPI layer (/root/reference/api/main.py) as a library.

The reference exposes:
- GET /api/search?q=&search_type=&limit=   (api/main.py:547-570)
- GET /api/stats                           (api/main.py:576-665)
- GET /health                              (api/main.py:696-725)

This module reproduces the semantics without pinning an HTTP framework
(none is needed for a Spark engine; wrapping these in FastAPI is a
10-line exercise).  Validation rules mirror api/main.py:551-564.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from time import time
from typing import List, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_LIMIT, MAX_LIMIT, SEARCH_TYPES
from .operators.search import SearchEngine
from .sources.tables import IndexStore


@dataclass
class SearchResult:
    id: str
    url: str
    title: str
    snippet: str
    domain: str
    relevance: float
    doc_type: str


@dataclass
class SearchResponse:
    query: str
    results: List[SearchResult]
    total_hits: int                 # deduplicated count (api/main.py:523)
    search_time_ms: float
    search_type: str
    embedding_time_ms: Optional[float] = None
    performance_mode: str = "ultra"  # echoed back (api/main.py:552)


@dataclass
class DomainStat:
    domain: str
    document_count: int


@dataclass
class StatsResponse:
    total_documents: int
    domains: List[DomainStat] = field(default_factory=list)


class SearchAPI:
    def __init__(self, spark: SparkSession, store: IndexStore, cfg=None):
        self.spark = spark
        self.engine = SearchEngine(spark, store, cfg)
        self.store = store

    def search(self, q: str, search_type: str = "hybrid",
               limit: int = DEFAULT_LIMIT,
               performance_mode: str = "ultra") -> SearchResponse:
        """Mirrors GET /api/search validation (api/main.py:551-564):
        empty q -> 400-equivalent ValueError; search_type whitelist;
        limit in [1, 50]; performance_mode normal|ultra (api/main.py:552,
        a rank-profile-tuning switch in Vespa -- identical first-phase
        expressions, doc.sd:214-256 -- so it does not alter ranking)."""
        if not q or not q.strip():
            raise ValueError("Query cannot be empty")
        if search_type not in SEARCH_TYPES:
            raise ValueError(
                f"search_type must be one of {', '.join(SEARCH_TYPES)}"
            )
        if not 1 <= limit <= MAX_LIMIT:
            raise ValueError(f"limit must be between 1 and {MAX_LIMIT}")
        t0 = time()
        rows = (
            self.engine.search(q, search_type, limit, performance_mode)
            .orderBy("rank").collect()
        )
        ms = (time() - t0) * 1000.0
        results = [
            SearchResult(
                id=r["id"], url=r["url"], title=r["title"], snippet=r["snippet"],
                domain=r["domain"], relevance=r["relevance"], doc_type=r["doc_type"],
            )
            for r in rows
        ]
        return SearchResponse(
            query=q, results=results, total_hits=len(results),
            search_time_ms=ms, search_type=search_type,
            performance_mode=performance_mode,
        )

    def stats(self, max_domains: int = 1000) -> StatsResponse:
        """Mirrors GET /api/stats: total full-doc count (A2) + per-domain
        counts capped at 1000 groups sorted desc (A1, api/main.py:609-655);
        fallback total = sum of domain counts (A3).

        A compacted store (operators/index_build.compact) carries no docs
        table -- the document store stays with the base segment -- so fall
        back to the full_doc rows of the compacted unified corpus.  Either
        way, streamed delta segments (streaming/incremental.py writes
        unified_delta, never docs) are unioned in, mirroring the
        SearchEngine's segment-union serve view -- otherwise stats would
        undercount exactly the freshest documents."""
        if self.store.exists("docs"):
            docs = self.store.read(self.spark, "docs").select("domain")
        else:
            docs = (
                self.store.read(self.spark, "unified")
                .filter(F.col("doc_type") == "full_doc")
                .select("domain")
            )
        if self.store.has_parts("unified_delta"):
            docs = docs.unionByName(
                self.store.read_parts(self.spark, "unified_delta")
                .filter(F.col("doc_type") == "full_doc")
                .select("domain")
            )
        per_domain = (
            docs.groupBy("domain").agg(F.count(F.lit(1)).alias("document_count"))
            .orderBy(F.desc("document_count"), F.asc("domain"))
            .limit(max_domains)
            .collect()
        )
        total = docs.count()
        if total == 0:
            total = sum(r["document_count"] for r in per_domain)
        return StatsResponse(
            total_documents=total,
            domains=[DomainStat(r["domain"], r["document_count"]) for r in per_domain],
        )

    def health(self) -> dict:
        """SparkSession liveness + index presence (the Vespa health probe
        analog, indexer.py:371-388)."""
        ok = True
        try:
            self.spark.sql("SELECT 1").collect()
        except Exception:
            ok = False
        return {
            "status": "healthy" if ok and self.store.exists("postings") else "degraded",
            "spark": ok,
            "index_build_id": self.store.build_id,
            "stages_done": [
                s for s, v in self.store.manifest["stages"].items()
                if v.get("status") == "done"
            ],
        }


def to_json_dict(resp) -> dict:
    return asdict(resp)
