"""Deduplication operators for large-scale training-data pipelines.

All of these operate on a generic (id, text) table -- in this repo the
driver's ``documents`` table and the engine's ``docs`` table both qualify.

Scale notes:
- exact dedup = one hash aggregate (map-side partial) on a fingerprint;
- n-gram Jaccard = shingle explode + self-join on shingle; the join key is
  a shingle hash so dictionary-encoded strings never shuffle; quadratic
  blowup is bounded per shingle-bucket (a stop-shingle cap would be added
  for true web scale -- see ``max_bucket``);
- MinHash+LSH is the 10^12-scale path: signatures are built JVM-side with
  ``xxhash64(shingle, seed)`` (no Python in the hot path), banded, and only
  same-bucket candidates are verified with exact Jaccard;
- SimHash: 64-bit fingerprints via a vectorized pandas UDF, near-dup =
  hamming distance <= d by banding on 4 x 16-bit keys.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.tokenizer import tokens_col


def normalized_text(col):
    """lower + collapse whitespace + trim: the dedup normal form."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_col(col):
    return F.md5(normalized_text(col))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor (min id) per identical normalized text.
    Returns (fingerprint, keep_id, dup_count)."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint_col(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles_col(text_col, n: int = 3):
    """Word n-gram shingles (distinct), JVM-side.

    NOTE: this single-expression spelling inlines the tokenizer into
    every reference inside the ``when``/``transform`` tree, and
    conditional branches block Spark's subexpression elimination -- the
    tokens expression is re-evaluated many times per row (measured 20x
    slower than the two-step form at sf0.1).  Hot paths use
    ``_shingled(df, ...)`` below, which materializes the tokens column in
    its own projection first; outputs are identical (A/B-verified).
    Kept because it is the exact expression the DuckDB twin mirrors."""
    toks = tokens_col(text_col)
    return _shingles_from_tokens(toks, n)


def _shingles_from_tokens(toks, n: int = 3):
    """Shingles from an (already-materialized) tokens array column."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, sh) with the tokens array materialized in its OWN projection
    so the tokenizer runs once per row (CollapseProject keeps the
    intermediate because the shingle expression references it many
    times) -- the 20x fix described in shingles_col."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    return toks.select("id", _shingles_from_tokens(F.col("_toks"), n).alias("sh"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold pairs (a < b).

    ``max_bucket`` drops shingles shared by more than that many docs
    (stop-shingles) -- mandatory at web scale, off by default so the small
    -scale result is exactly the quadratic ground truth.
    """
    sh = _shingled(df, id_col, text_col, n).filter(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    ex = sh.select("id", F.explode("sh").alias("s"))
    if max_bucket:
        hot = ex.groupBy("s").count().filter(F.col("count") > max_bucket).select("s")
        ex = ex.join(F.broadcast(hot), "s", "left_anti")
    inter = (
        ex.alias("x")
        .join(ex.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<bigint|string>) MinHash signatures.

    Shape matters at scale: shingles are hashed ONCE (explode -> xxhash64),
    then the num_perm permutations are ``min(xxhash64(h, i))`` aggregates
    over the 64-bit shingle hash -- a single hash aggregate with map-side
    partial aggregation, instead of num_perm re-evaluations of the shingle
    expression (which Catalyst's ProjectCollapse would otherwise inline).

    ``hash_family``:
    - "xxhash64" (default): seeded 64-bit JVM hashes -- the web-scale path;
    - "md5": permutation i value = min(md5(concat(i, '|', shingle))) as a
      fixed-width lowercase-hex string (lexicographic min == numeric min of
      the 128-bit value).  Same algorithm, but md5 is bit-identical in
      Spark and DuckDB, so the full pipeline is verifiable by the driver's
      SQL oracle (__spark_entry__.oracle_sql).
    """
    shingled = _shingled(df, id_col, text_col, n)
    return _signatures_from_shingled(shingled, num_perm, hash_family)


def _signatures_from_shingled(
    shingled: DataFrame, num_perm: int = 64, hash_family: str = "xxhash64",
) -> DataFrame:
    """Signatures from a precomputed (id, sh) table -- split out so
    minhash_lsh_dedup can materialize the shingles ONCE and reuse them
    for both the signature pass and the exact-Jaccard verify joins."""
    if hash_family == "md5":
        ex = shingled.select("id", F.explode("sh").alias("s"))
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"_m{i}")
            for i in range(num_perm)
        ]
    else:
        ex = shingled.select(
            "id",
            F.explode(
                F.transform(F.col("sh"), lambda s: F.xxhash64(s))
            ).alias("h"),
        )
        aggs = [
            F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"_m{i}")
            for i in range(num_perm)
        ]
    wide = ex.groupBy("id").agg(*aggs)
    return wide.select(
        "id", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """LSH candidate pairs: same band-hash in any of ``bands`` bands
    (rows = num_perm/bands).  Returns distinct (a, b) with a < b."""
    rows = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, n, hash_family)
    return _candidates_from_sig(sig, num_perm, bands, hash_family)


def _candidates_from_sig(
    sig: DataFrame, num_perm: int = 64, bands: int = 16,
    hash_family: str = "xxhash64",
) -> DataFrame:
    rows = num_perm // bands
    # the self-join below evaluates its input subtree on BOTH sides:
    # without the lineage cut the whole shingle+signature pipeline ran
    # twice per query (guide §3.3: materialize an intermediate to
    # truncate the plan).  The signature table is narrow (id + num_perm
    # values) and is recomputed fresh on every invocation -- nothing
    # persists across runs.
    sig = sig.localCheckpoint()
    if hash_family == "md5":
        band_hash = lambda bi: F.md5(  # noqa: E731
            F.concat(*[F.element_at("sig", bi * rows + r + 1) for r in range(rows)])
        )
    else:
        band_hash = lambda bi: F.xxhash64(  # noqa: E731
            *[F.element_at("sig", bi * rows + r + 1) for r in range(rows)]
        )
    band_cols = [
        F.struct(F.lit(bi).alias("band"), band_hash(bi).alias("h"))
        for bi in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_cols)).alias("bh")).select(
        "id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h")
    )
    pairs = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.h") == F.col("y.h"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    return pairs


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (computed only for
    candidate pairs -- the web-scale pattern: candidates << all pairs).

    The shingle table is materialized ONCE (localCheckpoint, fresh per
    invocation) and feeds the signature pass AND both sides of the verify
    join -- previously the shingle expression re-ran 3x (once per
    consumer subtree)."""
    sh = _shingled(df, id_col, text_col, n).localCheckpoint()
    sig = _signatures_from_shingled(sh, num_perm, hash_family)
    cand = _candidates_from_sig(sig, num_perm, bands, hash_family)
    j = (
        cand.join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sha"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "shb"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over normative tokens (vectorized numpy kernel).

    Token hash = first 8 bytes of md5, big-endian (stable everywhere; the
    DuckDB oracle reproduces it as UBIGINT('0x' || md5(token)[:16])); bit
    votes weighted by tf.

    Batch-vectorized: each distinct token in the Arrow batch is md5-hashed
    ONCE and its +-1 bit matrix built once; per row only the (uniq-index,
    count) gather and the vote sum remain.  On web corpora (zipf vocab) the
    shared vocabulary makes hashing cost ~O(batch vocab), not O(tokens).
    """
    import hashlib

    from ..functions.tokenizer import tokenize_py

    toks_per_row = [tokenize_py(t or "") for t in texts]
    vocab: dict = {}
    for toks in toks_per_row:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    out = np.zeros(len(texts), dtype=np.int64)
    if vocab:
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in vocab
            ],
            dtype=np.uint64,
        )
        # (V, 64) matrix of +-1 bit votes per vocab token
        pm1 = (
            ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            .astype(np.int64) * 2 - 1
        )
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for row, toks in enumerate(toks_per_row):
            if not toks:
                continue
            idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64, count=len(toks))
            uniq, counts = np.unique(idx, return_counts=True)
            votes = (pm1[uniq] * counts[:, None]).sum(axis=0)
            out[row] = weights[votes > 0].sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def simhash_neardup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found by
    banding the 64-bit signature into 4 x 16-bit keys (a pair within
    hamming<=3 must agree on at least one band) then verifying exactly.

    The 4-band split is only complete (pigeonhole) for max_hamming <= 3;
    a larger radius would silently miss pairs, so it is rejected."""
    if max_hamming > 3:
        raise ValueError(
            "max_hamming > 3 breaks the 4x16-bit banding completeness "
            "guarantee (pigeonhole needs bands > max_hamming)"
        )
    # lineage cut before the self-join: both join sides re-execute their
    # input subtree, which ran the simhash UDF twice per query (guide
    # §3.3).  16 B/row, recomputed fresh per invocation.
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig")
    ).localCheckpoint()
    bands = sig.select(
        "id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("sig", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("a"), F.col("y.id").alias("b"),
            F.col("x.sig").alias("siga"), F.col("y.sig").alias("sigb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("siga").bitwiseXOR(F.col("sigb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
