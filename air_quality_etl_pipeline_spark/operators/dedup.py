"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline extensions (north star in BASELINE.json). The
design goal at 100 TB is to never materialize the O(n²) pair space:

* exact       — hash-groupBy on a content fingerprint (one shuffle).
* n-gram Jaccard — pairs only *within a blocking key* (e.g. language ×
  source), so the quadratic term is bounded per block.
* MinHash-LSH — signatures per row (linear scan), banded bucket join so
  only same-bucket rows pair up; verify candidates with true Jaccard.
* SimHash     — relational formulation (explode tokens → per-bit votes →
  bit-pack), Hamming distance via xor+bit_count on candidate pairs.

Hashes are salted md5 (:func:`~air_quality_etl_pipeline_spark.functions
.core.md5_long`) — engine-portable and deterministic, which the oracle
harness requires; swap for ``xxhash64`` when portability doesn't matter
and you want cheaper hashing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.core import (
    char_shingles,
    md5_long,
    safe_div,
    token_array,
    word_shingles,
)
from air_quality_etl_pipeline_spark.operators.text import fingerprint


def exact_dup_groups(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Exact dedup: group by content fingerprint; returns one row per
    distinct content with the survivor (min id) and the duplicate count.
    """
    return (
        df.withColumn("fingerprint", fingerprint(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_docs"),
        )
    )


def jaccard_of_arrays(a: Column, b: Column) -> Column:
    """|a ∩ b| / |a ∪ b| over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return safe_div(inter, union)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Near-dup candidate pairs by character-n-gram Jaccard similarity.

    Pairs are generated only within *block_cols* groups (self-join on the
    blocking key, ``id_a < id_b``) — the blocking key is what keeps this
    subquadratic at scale. Returns ``(id_a, id_b, jaccard)`` above
    *threshold*.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        char_shingles(F.col(text_col), n).alias("_sh"),
    )
    left = sh.select(
        *[F.col(c).alias(f"{c}") for c in block_cols],
        F.col("_id").alias("id_a"),
        F.col("_sh").alias("sh_a"),
    )
    right = sh.select(
        *[F.col(c).alias(f"{c}") for c in block_cols],
        F.col("_id").alias("id_b"),
        F.col("_sh").alias("sh_b"),
    )
    pairs = left.join(right, on=list(block_cols)) if block_cols else left.crossJoin(right)
    pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    jac = jaccard_of_arrays(F.col("sh_a"), F.col("sh_b"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(
    shingles: Column, num_hashes: int = 8
) -> Column:
    """MinHash signature: array of per-hash-function minima over a
    shingle-set column. Hash family = salted md5 (portable,
    deterministic)."""
    mins = [
        F.array_min(F.transform(shingles, lambda s, i=i: md5_long(s, salt=str(i))))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection over word-*n*-gram
    shingles.

    shingle set → signature → split into *bands* of ``num_hashes/bands``
    rows → band hash → candidates = id pairs sharing ANY
    (band_idx, band_hash) bucket → verified with true Jaccard ≥
    *threshold* by joining the candidate ids back to the precomputed
    shingle sets (never recomputing shingles per pair, and never carrying
    text/arrays through the band explode — the exploded relation is
    just ``(id, band_idx, band_hash)``).

    At 100 TB: the signature pass is one linear scan; the bucket join
    shuffles the slim banded relation on (band_idx, band_hash) so only
    colliding rows meet; the verify joins shuffle candidate id pairs
    (small) against the shingle table on id.
    """
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    )
    sig = sh.select(
        "_id", minhash_signature(F.col("_sh"), num_hashes).alias("_sig")
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("_sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_idx", "band.band_hash")

    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cands.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), on="id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), on="id_b")
        .withColumn("jaccard", jaccard_of_arrays(F.col("sh_a"), F.col("sh_b")))
    )
    return (
        verified.filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_bits(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash in relational form → ``(id, simhash)``.

    explode tokens → per (doc, bit) majority vote of token-hash bits →
    pack set bits back into a LONG. Pure groupBy/aggregate pipeline:
    scales as a token-count-linear shuffle, no windows, no UDFs.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(token_array(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    # shiftright/shiftleft need SQL-expression form: the PySpark function
    # wrappers only accept a literal int shift amount, not a Column.
    bit_votes = (
        toks.select(
            "_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
            F.col("h"),
        )
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1),
        )
        .groupBy("_id", "bit")
        .agg(F.sum("vote").alias("votes"))
    )
    packed = bit_votes.groupBy("_id").agg(
        F.sum(
            F.when(F.col("votes") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return packed.select(F.col("_id").alias(id_col), "simhash")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ *max_hamming*,
    blocked by *block_cols* (same rationale as n-gram blocking)."""
    sh = simhash_bits(
        df.select(id_col, text_col, *block_cols), id_col, text_col, bits
    ).join(df.select(id_col, *block_cols), on=id_col)
    left = sh.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sh_a"),
    )
    right = sh.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sh_b"),
    )
    pairs = left.join(right, on=list(block_cols)) if block_cols else left.crossJoin(right)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
