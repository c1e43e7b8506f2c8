"""Pure-Python/numpy golden scorer -- the normative query semantics.

Codifies the ranking formulas the reference declares in Vespa config plus
the normative choices the repo leaves unpinned (SURVEY.md §5.2 test 4):

- tokenizer: the normative one (functions/tokenizer.py); duplicate query
  terms are deduplicated (first occurrence), matching weakAnd's term-set
  behavior;
- match semantics: OR over query terms (Vespa 8's default grammar for
  ``userQuery()`` is weakAnd, which is rank-equivalent to OR for top-k);
- BM25 (Vespa's published formula):
    idf(t)      = ln(1 + (N - n + 0.5) / (n + 0.5))
    bm25(f, t)  = idf * tf / (tf + k1 * (1 - b + b * len_f / avgdl_f))
  with k1=1.2, b=0.75; N and avgdl are computed per field over documents
  where the field is non-empty (Vespa counts field-present docs);
- search types (api/main.py:348-384):
    bm25:     full docs only; score = bm25(title) + 0.8*bm25(content)
              + 0.5*bm25(description)                     (doc.sd:139-143)
    semantic: chunks only; score = closeness(chunk_embedding)
                                                          (doc.sd:145-152)
    hybrid:   all doc types; per-type blend               (doc.sd:165-176)
      full_doc: 0.5*sigmoid(bm25_full/5) + 0.5*closeness(content_embedding)
      chunk:    0.5*sigmoid(bm25(title)+bm25(chunk_content)/5-scale)
                + 0.5*closeness(chunk_embedding)
- tie-break: (-score, doc_id asc) -- normative (Vespa leaves ties
  unspecified);
- result dedup by parent document, first (best-ranked) hit wins
  (api/main.py:464-506), applied AFTER ranking, then top-k of the
  deduplicated stream (total_hits = deduplicated count, api/main.py:523).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import (
    BM25_B,
    BM25_CHUNK_WEIGHTS,
    BM25_FULL_WEIGHTS,
    BM25_K1,
    HYBRID_BM25_WEIGHT,
    HYBRID_SEM_WEIGHT,
    HYBRID_SIGMOID_SCALE,
    INDEXED_FIELDS,
)
from ..functions.tokenizer import tokenize_py
from .embedder import closeness, embed_text


class OracleIndex:
    """In-memory index over a list of doc dicts (full docs + chunks).

    Each doc dict: id, doc_type ('full_doc'|'chunk'), parent_id (chunks),
    and the indexed text fields; optional 'embedding' (np.ndarray).
    """

    def __init__(self, docs: Sequence[Dict], k1: float = BM25_K1, b: float = BM25_B):
        self.docs = list(docs)
        self.k1 = k1
        self.b = b
        self.tokens: List[Dict[str, List[str]]] = []
        for d in self.docs:
            self.tokens.append(
                {f: tokenize_py(d.get(f) or "") for f in INDEXED_FIELDS}
            )
        # per-field corpus stats over field-present docs
        self.stats = {}
        for f in INDEXED_FIELDS:
            lens = [len(t[f]) for t in self.tokens if len(t[f]) > 0]
            n_docs = len(lens)
            avgdl = (sum(lens) / n_docs) if n_docs else 0.0
            # df per term
            df: Dict[str, int] = {}
            for t in self.tokens:
                for term in set(t[f]):
                    df[term] = df.get(term, 0) + 1
            self.stats[f] = {"n_docs": n_docs, "avgdl": avgdl, "df": df}

    def idf(self, field: str, term: str) -> float:
        st = self.stats[field]
        n = st["df"].get(term, 0)
        N = st["n_docs"]
        if n == 0 or N == 0:
            return 0.0
        return math.log(1.0 + (N - n + 0.5) / (n + 0.5))

    def bm25(self, doc_i: int, field: str, terms: Sequence[str]) -> float:
        toks = self.tokens[doc_i][field]
        if not toks:
            return 0.0
        st = self.stats[field]
        dl = len(toks)
        score = 0.0
        for term in terms:
            tf = toks.count(term)
            if tf == 0:
                continue
            denom = tf + self.k1 * (1.0 - self.b + self.b * dl / st["avgdl"])
            score += self.idf(field, term) * tf / denom
        return score

    # --- search types ---

    def _query_terms(self, query: str) -> List[str]:
        seen, out = set(), []
        for t in tokenize_py(query):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def _matches(self, doc_i: int, terms: Sequence[str], fields: Sequence[str]) -> bool:
        toks = self.tokens[doc_i]
        return any(t in toks[f] for f in fields for t in terms)

    def search(
        self,
        query: str,
        search_type: str = "bm25",
        k: int = 10,
        query_embedding: Optional[np.ndarray] = None,
    ) -> List[Dict]:
        terms = self._query_terms(query)
        scored: List[tuple] = []  # (score, doc_id, idx)

        if search_type == "bm25":
            for i, d in enumerate(self.docs):
                if d.get("doc_type") != "full_doc":
                    continue
                if not terms or not self._matches(i, terms, ("title", "content", "description")):
                    continue
                s = sum(
                    w * self.bm25(i, f, terms) for f, w in BM25_FULL_WEIGHTS.items()
                )
                scored.append((s, d["id"], i))

        elif search_type == "semantic":
            if query_embedding is None:
                query_embedding = embed_text(query)
            for i, d in enumerate(self.docs):
                if d.get("doc_type") != "chunk" or d.get("embedding") is None:
                    continue
                s = float(closeness(query_embedding, d["embedding"][None, :])[0])
                scored.append((s, d["id"], i))

        elif search_type == "hybrid":
            if query_embedding is None:
                query_embedding = embed_text(query)
            for i, d in enumerate(self.docs):
                if not terms or not self._matches(i, terms, INDEXED_FIELDS):
                    continue
                if d.get("doc_type") == "full_doc":
                    bm = sum(w * self.bm25(i, f, terms) for f, w in BM25_FULL_WEIGHTS.items())
                else:
                    bm = sum(w * self.bm25(i, f, terms) for f, w in BM25_CHUNK_WEIGHTS.items())
                sig = 1.0 / (1.0 + math.exp(-bm / HYBRID_SIGMOID_SCALE))
                emb = d.get("embedding")
                sem = (
                    float(closeness(query_embedding, emb[None, :])[0])
                    if emb is not None
                    else 0.0
                )
                scored.append((HYBRID_BM25_WEIGHT * sig + HYBRID_SEM_WEIGHT * sem, d["id"], i))
        else:
            raise ValueError(f"unknown search_type {search_type}")

        scored.sort(key=lambda t: (-t[0], t[1]))

        # dedup by parent document, first hit wins (api/main.py:464-506)
        seen = set()
        out = []
        for s, doc_id, i in scored:
            d = self.docs[i]
            key = d.get("parent_id") or d["id"]
            if key in seen:
                continue
            seen.add(key)
            out.append(
                {
                    "rank": len(out) + 1,
                    "doc_id": key,
                    "hit_id": d["id"],
                    "score": s,
                    "doc_type": d.get("doc_type"),
                }
            )
            if len(out) >= k:
                break
        return out
