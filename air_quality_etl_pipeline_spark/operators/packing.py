"""Training-corpus assembly operators: eval-set decontamination and
sequence packing.

Both are standard large-scale LLM-pipeline stages (GPT-3 §2.2 /
Llama-style decontamination by n-gram overlap with evaluation sets;
concat-then-chunk sequence packing into fixed context windows) with no
reference-repo counterpart — they extend the engine the way SURVEY §2's
north star prescribes. Everything is built-in Catalyst expressions;
the only driver-side state is the tiny per-range totals map of the
distributed prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.core import (
    md5_long,
    token_array,
    word_shingles_of_tokens,
)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Per-training-document overlap with an evaluation set: the count
    of distinct word-*n*-grams the document shares with ANY eval
    document, and a ``contaminated`` flag at *min_hits*.

    Scale shape: the eval side (benchmarks — thousands of docs) reduces
    to a DISTINCT relation of 60-bit shingle HASHES that is BROADCAST —
    hashing before the join shrinks the broadcast ~6× vs raw n-gram
    strings (8 bytes vs ~40+) and makes its size independent of gram
    length; distinct-hash counts equal distinct-gram counts up to
    md5-collision odds (~n²/2⁶⁰ — nil at eval-set scale), and both
    engines hash identically so the equality is exact, not just
    probable. The training side (the 100 TB corpus) explodes to
    shingle hashes, joins against the broadcast map-side, and
    re-aggregates per document — one shuffle on doc id, no shuffle of
    the corpus text itself. Output keeps zero-overlap documents (LEFT
    join semantics) so the result is a total verdict over the corpus.
    """
    t_sh = train.select(
        F.col(id_col).alias("_id"),
        F.explode(
            word_shingles_of_tokens(token_array(F.col(text_col)), n)
        ).alias("_raw"),
    ).select("_id", md5_long(F.col("_raw")).alias("_g"))
    e_sh = (
        eval_df.select(
            F.explode(
                word_shingles_of_tokens(token_array(F.col(text_col)), n)
            ).alias("_raw")
        )
        .select(md5_long(F.col("_raw")).alias("_g"))
        .distinct()
    )
    # plain count, not countDistinct: word_shingles_of_tokens emits
    # DISTINCT shingles per document, so (_id, _g) pairs are already
    # unique and the distinct-set state per group would be pure waste
    # (the oracle's count(DISTINCT) is equivalent on this input)
    hits = (
        t_sh.join(F.broadcast(e_sh), on="_g")
        .groupBy("_id")
        .agg(F.count("_g").alias("n_overlap"))
    )
    return (
        train.select(F.col(id_col).alias("_id"))
        .join(hits, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_hits)
            .cast("long")
            .alias("contaminated"),
        )
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_ranges: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum of *value_col* in *order_col*
    order (numeric keys) — the two-phase formulation: bucket the key
    space into *num_ranges* fixed-width ranges, cumulate within each
    bucket with a window, then add per-bucket offsets computed from a
    tiny collected totals map. No global single-partition sort: each
    bucket cumulates independently, and only ``num_ranges + 2`` scalars
    hit the driver (key min/max + per-bucket totals).

    The bucket id is a DETERMINISTIC function of the key value —
    ``(k − min) div width`` — never ``spark_partition_id()`` over
    ``repartitionByRange``: range partitioning samples its bounds, so
    two evaluations of the same plan can split differently, and a
    totals map keyed by partition id then mis-offsets the second
    evaluation (caught at 5 M rows: off by the rows that moved between
    splits; invisible at unit-test sizes where both evaluations sample
    identical bounds). Skewed key distributions only unbalance bucket
    SIZES, never correctness."""
    if num_ranges is None:
        num_ranges = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "8")
        )
    lo, hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    width = max(1, (int(hi) - int(lo)) // num_ranges + 1)
    # integer DIV, not float division: exact past 2^53
    bucket = F.expr(f"(cast(`{order_col}` as bigint) - {int(lo)}) div {width}")
    bucketed = df.withColumn("__bkt", bucket)
    totals = {
        r["__bkt"]: r["s"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, running = {}, 0
    for b in sorted(totals):
        offsets[b] = running
        running += totals[b] or 0
    offset_col = (
        F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("__bkt"),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("__bkt").orderBy(order_col)
    return bucketed.withColumn(
        out_col, (F.sum(value_col).over(w) + offset_col).cast("long")
    ).drop("__bkt")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx: int = 512,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid out in
    *id_col* order as one continuous token stream and cut into
    fixed-*ctx* training windows (the GPT-style packing that wastes no
    pad tokens). Returns one row per window:
    ``(bin, n_docs, n_tokens)`` — how many documents overlap the
    window and how many of its token slots are filled (only the final
    window may be partial).

    Relational shape: token counts per doc → distributed prefix sum
    (:func:`prefix_sum` — no global sort) → each doc explodes into the
    ``O(len/ctx)`` windows it spans (a ``sequence``) → one aggregate on
    window id. Zero-token documents occupy no window and are dropped.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.size(token_array(F.col(text_col))).cast("long").alias("_n"),
    )
    cum = prefix_sum(toks, "_id", "_n", "_end")
    spans = (
        cum.filter(F.col("_n") > 0)
        .withColumn("_start", F.col("_end") - F.col("_n"))
        .withColumn(
            "_bin",
            # integer DIV, not float division: exact past 2^53
            F.explode(
                F.sequence(
                    F.expr(f"_start div {ctx}"),
                    F.expr(f"(_end - 1) div {ctx}"),
                )
            ),
        )
    )
    filled = F.least(
        F.col("_end"), (F.col("_bin") + 1) * ctx
    ) - F.greatest(F.col("_start"), F.col("_bin") * ctx)
    return (
        spans.withColumn("_fill", filled)
        .groupBy(F.col("_bin").cast("long").alias("bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_fill").cast("long").alias("n_tokens"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Sliding-window document chunking (the RAG/retrieval-index prep
    step): each document yields windows of *chunk* tokens starting
    every *stride* tokens — ``stride < chunk`` gives overlapping
    context windows; ``stride == chunk`` is disjoint splitting. Returns
    one row per window: ``(id, chunk_idx, start_tok, n_tokens)`` with
    the final windows shorter than *chunk* at the tail.

    Unlike :func:`pack_sequences` (cross-document concat-then-chunk for
    training), chunking is per-document: no prefix sum, no cross-row
    coordination at all — the explode is computed inside the scan and
    the operator is embarrassingly parallel at any corpus size.
    Zero-token documents yield no windows.
    """
    toks = df.select(
        F.col(id_col).alias(id_col),
        F.size(token_array(F.col(text_col))).cast("long").alias("_n"),
    )
    spans = toks.filter(F.col("_n") > 0).withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0), F.expr(f"(_n - 1) div {stride}"))),
    )
    start = F.col("chunk_idx") * stride
    return spans.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(chunk), F.col("_n") - start).cast("long").alias(
            "n_tokens"
        ),
    )
