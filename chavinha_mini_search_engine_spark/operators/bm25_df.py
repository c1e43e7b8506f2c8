"""Single-field BM25 expressed purely in DataFrame ops (no index, no UDF).

This is the declarative twin of the posting-list engine: the same normative
tokenizer and the same BM25 formula, but as a Catalyst plan (explode ->
hash agg -> join -> agg -> top-k).  It exists because (a) it is the ANSI-SQL
-expressible form the DuckDB oracle gates, and (b) it is the right tool when
you need ad-hoc scoring over a table you haven't indexed -- Catalyst gives
pushdown/codegen for free and the whole plan is 3 shuffles.

The indexed engine (operators/search.py) answers the same query from the
postings table without touching the corpus; this one scans it.  Both are
rank-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1
from ..functions.tokenizer import tokenize_py, tokens_col


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl, term, tf) for non-empty docs."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks")).filter(F.col("dl") > 0)
    return (
        toks.select("id", "dl", F.explode("toks").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_stats(dt: DataFrame) -> DataFrame:
    """(term, df) document frequency."""
    return dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def bm25_topk_df(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k (doc_id, score) by BM25 over one text column.

    Plan shape: tf/df/avgdl aggregates + a broadcast join against the
    (tiny) query-term df -- scoring only touches docs containing >=1 query
    term because the join is inner on term.
    """
    terms = sorted(set(tokenize_py(query)))
    # NOTE (r6): a localCheckpoint lineage cut on dt (the minhash/simhash
    # fix) was A/B-tested here and REVERTED: dt's three consumer subtrees
    # are independent stages of ONE job and run concurrently across the
    # cluster, so deduplicating them behind an eager materialization
    # SERIALIZES the DAG -- measured 0.75 -> 0.92 s at sf0.1 (warm-min).
    # The cut only pays when the duplicated subtree is expensive relative
    # to the parallelism it forfeits (shingling) or feeds a self-join.
    dt = doc_terms(df, id_col, text_col)
    stats = dt.select("id", "dl").distinct().agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    ts = term_stats(dt).filter(F.col("term").isin(terms))
    scored = (
        dt.join(F.broadcast(ts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias("doc_id"), "score")
    )
