"""Normative tokenizer.

The reference never tokenizes in its own code -- it delegates to Vespa's
linguistics via ``enable-bm25`` fields (/root/reference/config/vespa/
schemas/doc.sd:24,34,39,70 and fieldset :107-109).  The rebuild therefore
*defines* the normative tokenizer, used identically at index time, query
time, in the pure-Python oracle and in the DuckDB correctness SQL:

    tokens(s) = maximal runs of [a-z0-9] in lower(s)

Rationale: this exact definition is expressible bit-identically in Java
regex (Spark), RE2 (DuckDB), and Python ``re`` -- non-ASCII letters act as
separators, which is well-defined for the English-filtered corpus
(``lang = 'en'`` filter mirrors doc_scraper.py:420-439).  No stemming, no
stopwords (Vespa's default linguistic stemming is NOT reproduced; this is a
documented normative divergence -- ranking comparisons are against the
oracle that shares this tokenizer, per SURVEY.md §2.4).
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F

# one token class, reused verbatim everywhere (both spellings of the
# same definition: runs of the class, or splitting on its complement)
TOKEN_FINDALL_RE = "[a-z0-9]+"
TOKEN_SPLIT_RE = "[^a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_FINDALL_RE)


def tokenize_py(text: str) -> List[str]:
    """Pure-Python twin (oracle + query-time)."""
    if not text:
        return []
    return _PY_TOKEN_RE.findall(text.lower())


def tokens_col(col: Column | str) -> Column:
    """JVM-side tokens as array<string> (whole-stage codegen, no Python).

    ``regexp_extract_all(lower(s), '[a-z0-9]+')`` IS ``re.findall`` --
    maximal runs of the token class, no edge empties.  It replaced the
    earlier ``filter(split(lower(s), '[^a-z0-9]+'), x -> x != '')`` form:
    token-stream identity was verified corpus-wide (md5 over the token
    array, 120k docs, 0 mismatches) and the single codegen'd regex pass
    measured ~35% faster than split + higher-order filter (the lambda
    filter does not participate in whole-stage codegen), which matters
    because tokenization sits inside tf_write -- 87% of the stats stage,
    the build's largest memory-streaming pass (BENCH_SCALING.md round 4).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_FINDALL_RE), F.lit(0))


def duckdb_tokens_sql(expr: str) -> str:
    """The same tokenizer as a DuckDB SQL expression (list of varchar)."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'),"
        f" x -> x <> '')"
    )
