"""Text analysis for training-data pipelines: quality scoring, language-ID
heuristic, token counting, document fingerprinting.

Everything here is pure JVM expressions (whole-stage codegen) -- these run
per row over 100 TB, so no Python is allowed in the hot path.  Each has an
ANSI-SQL twin in __spark_entry__.oracle_sql for the DuckDB gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokens_col
from .dedup import fingerprint_col

# small deterministic stopword lists for the language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "to", "of", "and", "is", "in", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "ich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}

# BPE-ish token pattern: letter runs, digit runs, single non-space symbols
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, stopword_ratio, alpha_ratio,
    punct_ratio) -- the standard web-text quality signals (length,
    stopword density, symbol noise).

    The tokens array is materialized in its OWN projection: referencing
    the tokenizer expression from several derived columns in one select
    re-evaluates it per reference (the interpreted HOF filter is outside
    codegen CSE); tok_chars = length(concat_ws('', toks)) replaces the
    per-element interpreted aggregate fold with one codegen'd concat
    (identical value: tokens are non-null strings)."""
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_toks = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_chars = F.length(F.col("_text"))
    n_alpha = F.length(F.regexp_replace(F.col("_text"), "[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(F.col("_text"), "[a-zA-Z0-9\\s]", ""))
    tok_chars = F.length(F.concat_ws("", toks))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))  # noqa: E731
    return base.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(safe(tok_chars, n_toks), 6).alias("avg_token_len"),
        F.round(safe(n_sw, n_toks), 6).alias("stopword_ratio"),
        F.round(safe(n_alpha, n_chars), 6).alias("alpha_ratio"),
        F.round(safe(n_punct, n_chars), 6).alias("punct_ratio"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language heuristic: argmax over per-language stopword
    hit counts; ties and zero votes -> 'und'.  Deterministic tie order =
    lexicographic language code (normative)."""
    # tokens materialized once (see quality_features: 4 per-language
    # references would otherwise re-run the tokenizer per reference)
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array([F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        # struct ordering is field-by-field: min of (-hits, lang) picks the
        # highest vote count, ties broken by lexicographic language code
        scores.append(F.struct((-hits).alias("neg"), F.lit(lang).alias("lang")))
    # winner materialized too: pred_lang/votes reference it 3 times, each
    # of which would re-expand the 4 per-language filter HOFs
    mid = base.select("doc_id", F.array_min(F.array(*scores)).alias("_w"))
    winner = F.col("_w")
    return mid.select(
        "doc_id",
        F.when(-winner["neg"] > 0, winner["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        (-winner["neg"]).alias("votes"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per doc."""
    ws = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit("")))
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


def doc_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stable content fingerprint (md5 of the dedup normal form) +
    xxhash64 for compact 64-bit joins."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
        F.xxhash64(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))).alias("fp64"),
    )
