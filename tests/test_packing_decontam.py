"""Unit tests for corpus-assembly operators: decontamination, the
distributed prefix sum, and sequence packing window math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.packing import (
    decontaminate,
    pack_sequences,
    prefix_sum,
)


def test_decontaminate_counts_and_flags(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 3-grams with eval
            (2, "totally different words here"),
            (3, ""),                             # blank
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in decontaminate(train, ev, min_hits=2).collect()}
    # "the quick brown" + "quick brown fox" overlap -> 2 distinct hits
    assert out[1].n_overlap == 2 and out[1].contaminated == 1
    assert out[2].n_overlap == 0 and out[2].contaminated == 0
    assert 3 in out  # zero-overlap rows survive the left join
    assert len(out) == 3


def test_prefix_sum_matches_serial(spark):
    rows = [(i, (i * 7) % 5) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: r.cum
        for r in prefix_sum(df, "k", "v", "cum", num_ranges=7).collect()
    }
    running = 0
    for k, v in rows:  # already in k order
        running += v
        assert got[k] == running


def test_prefix_sum_stable_across_evaluations(spark):
    """Regression for the repartitionByRange bug: range partitioning
    SAMPLES its bounds, so a totals map keyed by partition id can
    mis-offset a later re-evaluation of the same plan. Buckets must be
    a deterministic function of the key value: two separate actions on
    one prefix_sum plan (and two separately built plans) must agree."""
    rows = [((i * 37) % 10_000, 1) for i in range(5_000)]
    df = spark.createDataFrame(rows, ["k", "v"]).dropDuplicates(["k"])
    out = prefix_sum(df, "k", "v", "cum", num_ranges=13)
    first = {r.k: r.cum for r in out.collect()}
    second = {r.k: r.cum for r in out.collect()}  # re-evaluates the plan
    assert first == second
    rebuilt = {
        r.k: r.cum
        for r in prefix_sum(df, "k", "v", "cum", num_ranges=13).collect()
    }
    assert first == rebuilt
    # and it is the true prefix sum
    for rank, k in enumerate(sorted(first), start=1):
        assert first[k] == rank


def test_pack_sequences_window_math(spark):
    # token counts: 3, 4, 0, 6 -> stream of 13 tokens, ctx=5
    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "d e f g"),
            (3, "   "),
            (4, "h i j k l m"),
        ],
        ["doc_id", "text"],
    )
    out = {r.bin: r for r in pack_sequences(df, ctx=5).collect()}
    # layout: doc1 [0,3) doc2 [3,7) doc4 [7,13)
    # bin0 [0,5): doc1(3) + doc2(2)      -> 2 docs, 5 tokens
    # bin1 [5,10): doc2(2) + doc4(3)     -> 2 docs, 5 tokens
    # bin2 [10,13): doc4(3)              -> 1 doc, 3 tokens (partial tail)
    assert set(out) == {0, 1, 2}
    assert (out[0].n_docs, out[0].n_tokens) == (2, 5)
    assert (out[1].n_docs, out[1].n_tokens) == (2, 5)
    assert (out[2].n_docs, out[2].n_tokens) == (1, 3)


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from air_quality_etl_pipeline_spark.functions.core import token_array

    total = d.select(
        F.sum(F.size(token_array(F.col("text")))).alias("s")
    ).first()["s"]
    packed = pack_sequences(d, ctx=256)
    agg = packed.agg(
        F.sum("n_tokens").alias("toks"), F.max("bin").alias("last")
    ).first()
    assert agg["toks"] == total  # every token lands in exactly one window
    # every window except possibly the last is exactly full
    full = packed.filter(
        (F.col("bin") < agg["last"]) & (F.col("n_tokens") != 256)
    ).count()
    assert full == 0


def test_chunk_documents_window_math(spark):
    from air_quality_etl_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, " ".join(["t"] * 10)), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    out = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens)
        for r in chunk_documents(df, chunk=4, stride=3).collect()
    )
    # doc1: 10 tokens -> starts 0,3,6,9 with lens 4,4,4,1
    # doc2: 2 tokens -> one short chunk; doc3: none
    assert out == [
        (1, 0, 0, 4), (1, 1, 3, 4), (1, 2, 6, 4), (1, 3, 9, 1),
        (2, 0, 0, 2),
    ]


def test_mixture_sample_respects_quotas(spark, sf_dir):
    from air_quality_etl_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"en": 0.4, "fr": 0.2, "de": 0.2, "es": 0.1, "zh": 0.1}
    kept = mixture_sample(d, "doc_id", "lang", weights, budget=200)
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")
    ).collect()}
    totals = {r.lang: r.n for r in d.groupBy("lang").agg(
        F.count("*").alias("n")
    ).collect()}
    for lang, w in weights.items():
        quota = w * 200
        # Bernoulli sampling: expect ~quota, never above the source size
        assert counts.get(lang, 0) <= totals[lang]
        assert abs(counts.get(lang, 0) - min(quota, totals[lang])) <= 4 * (quota ** 0.5)
    # deterministic across evaluations
    again = {r.lang: r.n for r in mixture_sample(
        d, "doc_id", "lang", weights, budget=200
    ).groupBy("lang").agg(
        F.count("*").alias("n")
    ).collect()}
    assert counts == again
