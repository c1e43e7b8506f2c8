"""Pinned chunking semantics.

Re-implements the algorithm of the reference chunker
(/root/reference/indexer/chunker.py:41-196) from its observable behavior:

- input text = ``f"{title}\\n\\n{content}"`` when title else content
  (chunker.py:59), then whitespace-normalized: ``\\n{3,}`` -> ``\\n\\n``,
  ``[ \\t]{2,}`` -> ' ', strip (chunker.py:81-87);
- if len <= chunk_size (800): one chunk spanning [0, len) (chunker.py:64-66);
- else sliding split: target end = start + 800; boundary searched in
  [max(start+100, end-200), min(len, end+200)) against 4 prioritized
  sentence regexes, then word-boundary fallback, then the raw target
  (chunker.py:122-159); boundary must leave the chunk >= 100 chars;
- next start = max(start + 100, boundary - 150) (chunker.py:117);
- final chunk = remainder; chunks with stripped length < 100 dropped
  (chunker.py:74);
- chunk id = f"{parent_id}_chunk_{index:03d}" (chunker.py:177); the index
  enumerates all split chunks BEFORE the min-size filter, so dropped
  chunks leave gaps in the id sequence (chunker.py:72-76);
- chunk_content is stripped; chunk_size = len(stripped)
  (chunker.py:186,190).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from ..config import CHUNK_OVERLAP, CHUNK_SIZE, MIN_CHUNK_SIZE

SENTENCE_PATTERNS = [
    r"(?<=[.!?])\s+(?=[A-Z])",
    r"(?<=\.)\s+(?=\w)",
    r"(?<=\n\n)",
    r"(?<=\n)",
]
WORD_BOUNDARY = r"\s+"

_CLEAN_NL = re.compile(r"\n{3,}")
_CLEAN_SP = re.compile(r"[ \t]{2,}")
_SENT_RES = [re.compile(p) for p in SENTENCE_PATTERNS]
_WORD_RE = re.compile(WORD_BOUNDARY)


def clean_content(content: str) -> str:
    content = _CLEAN_NL.sub("\n\n", content)
    content = _CLEAN_SP.sub(" ", content)
    return content.strip()


def _find_best_boundary(
    content: str, start: int, target_end: int,
    chunk_size: int, overlap: int, min_chunk: int,
) -> int:
    search_start = max(start + min_chunk, target_end - 200)
    search_end = min(len(content), target_end + 200)
    window = content[search_start:search_end]
    for pat in _SENT_RES:
        matches = list(pat.finditer(window))
        if matches:
            best = min(matches, key=lambda m: abs((search_start + m.end()) - target_end))
            boundary = search_start + best.end()
            if boundary - start >= min_chunk:
                return boundary
    word_matches = list(_WORD_RE.finditer(window))
    if word_matches:
        best = min(word_matches, key=lambda m: abs((search_start + m.start()) - target_end))
        boundary = search_start + best.start()
        if boundary - start >= min_chunk:
            return boundary
    return target_end


def split_positions(
    content: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    min_chunk: int = MIN_CHUNK_SIZE,
) -> List[Tuple[str, int, int]]:
    chunks: List[Tuple[str, int, int]] = []
    start = 0
    n = len(content)
    while start < n:
        end = min(start + chunk_size, n)
        if end >= n:
            chunks.append((content[start:], start, n))
            break
        boundary = _find_best_boundary(content, start, end, chunk_size, overlap, min_chunk)
        chunks.append((content[start:boundary], start, boundary))
        start = max(start + min_chunk, boundary - overlap)
    return chunks


def chunk_document(
    doc: Dict,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    min_chunk: int = MIN_CHUNK_SIZE,
) -> List[Dict]:
    """doc needs: id, url, domain, title, content, crawled_at[, doc_type]."""
    content = doc.get("content", "")
    title = doc.get("title", "")
    if not content.strip():
        return []
    full = f"{title}\n\n{content}" if title else content
    cleaned = clean_content(full)
    if len(cleaned) <= chunk_size:
        # single-chunk path bypasses the min-size filter (chunker.py:64-66)
        pieces = [(cleaned, 0, 0, len(cleaned))]
    else:
        # chunk_index enumerates BEFORE the min-size filter, so dropped
        # chunks leave gaps in the index sequence (chunker.py:72-76)
        pieces = [
            (p[0], i, p[1], p[2])
            for i, p in enumerate(split_positions(cleaned, chunk_size, overlap, min_chunk))
            if len(p[0].strip()) >= min_chunk
        ]
    out = []
    for text, i, s, e in pieces:
        stripped = text.strip()  # chunker.py:186
        out.append(
            {
                "id": f"{doc['id']}_chunk_{i:03d}",
                "doc_type": "chunk",
                "parent_id": doc["id"],
                "url": doc["url"],
                "domain": doc.get("domain", ""),
                "title": title,
                "chunk_content": stripped,
                "chunk_index": i,
                "chunk_start": s,
                "chunk_end": e,
                "chunk_size": len(stripped),
                "crawled_at": doc.get("crawled_at", ""),
                "parent_doc_type": doc.get("doc_type", "general"),
            }
        )
    return out
