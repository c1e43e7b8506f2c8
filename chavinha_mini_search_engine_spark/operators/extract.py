"""pages -> docs: Arrow-batched extraction (SURVEY.md P1-P3, P15, P6, A5).

The per-row kernel is the pinned extractor (oracle/extractor.py) -- the SAME
function the parity oracle runs, which is what makes the byte-identical
invariant testable.  All plumbing is columnar:

- language filter ``lang = 'en'`` is a plain Catalyst predicate pushed into
  the parquet/Iceberg scan (the input carries ``lang``; the reference
  filtered per *domain*, doc_scraper.py:420-439 -- with the column given,
  per-row is strictly more faithful to "English docs only");
- extraction runs in ``mapInPandas`` (Arrow batches, one Python worker per
  task, no per-row pickling);
- ``domain`` = netloc(url) (the reference stores the redirect-resolved
  netloc, doc_scraper.py:522-523; input urls are final by construction);
- per-domain cap = window row_number over a deterministic order
  (indexer/indexer.py:423-430 caps in sorted-filename order; filenames are
  md5(url).json so the order key is md5(url) -- reproduced exactly).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PER_DOMAIN_CAP
from ..oracle.extractor import extract_page

DOCS_SCHEMA = (
    "id string, url string, domain string, title string, content string, "
    "description string, keywords string, code_snippets array<string>, "
    "crawled_at timestamp, doc_type string"
)


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from urllib.parse import urlparse

    for pdf in it:
        out = {
            "id": [], "url": [], "domain": [], "title": [], "content": [],
            "description": [], "keywords": [], "code_snippets": [],
            "crawled_at": [], "doc_type": [],
        }
        for url, html, ts in zip(pdf["url"], pdf["html"], pdf["warc_ts"]):
            r = extract_page(html, url)
            out["id"].append(r["id"])
            out["url"].append(url)
            out["domain"].append(urlparse(url).netloc)
            out["title"].append(r["title"])
            out["content"].append(r["content"])
            # the crawler never extracts description/keywords; they exist in
            # the schema (doc.sd:37-44) and are carried as empty for parity
            out["description"].append("")
            out["keywords"].append("")
            out["code_snippets"].append(r["code_snippets"])
            out["crawled_at"].append(ts)
            out["doc_type"].append("full_doc")
        yield pd.DataFrame(out)


def extract_docs(pages: DataFrame, lang: str = "en",
                 per_domain_cap: int = PER_DOMAIN_CAP) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> docs (full_doc rows).

    The lang filter and the 3-column projection (url, warc_ts, html) are
    declared before mapInPandas so Catalyst pushes them into the scan
    (PushedFilters + ReadSchema pruning -- html is the only wide column
    read).
    """
    src = pages.filter(F.col("lang") == lang).select("url", "warc_ts", "html")
    docs = src.mapInPandas(_extract_batches, schema=DOCS_SCHEMA)
    # per-domain cap (A5): first N in md5(url) order win
    w = Window.partitionBy("domain").orderBy("id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_domain_cap)
        .drop("_rn")
    )


def verify_extraction_parity(pages: DataFrame, docs: DataFrame) -> int:
    """Returns the number of rows violating the byte-identical invariant
    (engine content != the ``text`` column the input table carries).
    Run as a build-time assertion at small scale / sampled at large scale.
    """
    j = docs.join(pages.select("url", "text"), "url")
    return j.filter(F.col("content") != F.col("text")).count()
