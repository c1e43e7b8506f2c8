"""docs -> chunks via mapInPandas (SURVEY.md C1, J1).

One input doc yields N chunk rows (a UDTF shape); ``mapInPandas`` lets one
Arrow batch in produce a different number of rows out, so the 1->N
expansion never touches the driver.  The kernel is the pinned chunker
(oracle/chunker.py) -- chunk ids/offsets/contents are tested identical to
the reference algorithm's semantics (indexer/chunker.py:41-196).

Parent denormalization (url/domain/title/crawled_at copied onto each chunk,
chunker.py:180-194) happens inside the kernel: a build-time materialized
join, exactly like the reference -- no runtime join needed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..oracle.chunker import chunk_document

CHUNKS_SCHEMA = (
    "id string, doc_type string, parent_id string, url string, domain string, "
    "title string, chunk_content string, chunk_index int, chunk_start int, "
    "chunk_end int, chunk_size int, crawled_at timestamp, parent_doc_type string"
)

_COLS = [f.split(" ")[0] for f in CHUNKS_SCHEMA.split(", ")]


def _chunk_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = {c: [] for c in _COLS}
        for rec in pdf.to_dict("records"):
            # the reference chunker sees the raw crawl JSON, which has no
            # doc_type -> parent_doc_type defaults to 'general'
            # (chunker.py:194, doc_scraper.py:527-535)
            rec.pop("doc_type", None)
            for ch in chunk_document(rec):
                ch["crawled_at"] = rec["crawled_at"]  # keep timestamp dtype
                for c in _COLS:
                    rows[c].append(ch[c])
        yield pd.DataFrame(rows)


def chunk_docs(docs: DataFrame) -> DataFrame:
    src = docs.select("id", "url", "domain", "title", "content", "crawled_at")
    return src.mapInPandas(_chunk_batches, schema=CHUNKS_SCHEMA)
