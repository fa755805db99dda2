"""Invariants for corpus sampling/curation operators: determinism and
partition-invariance of hash sampling, rate monotonicity, top-k ground
truth vs a driver-side reference, TF-IDF accounting identities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.sampling import (
    hash_sample,
    keep_top_k_per_group,
    sample_bucket,
    stratified_hash_sample,
)
from air_quality_etl_pipeline_spark.operators.text import tfidf_terms


def _docs(spark):
    rows = [
        (i, f"doc text {i} " + "word " * (i % 7), f"src{i % 3}")
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hash_sample_is_deterministic_and_partition_invariant(spark):
    d = _docs(spark)
    a = sorted(r.doc_id for r in hash_sample(d, "doc_id", 30).collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(d.repartition(7, "source"), "doc_id", 30).collect()
    )
    c = sorted(r.doc_id for r in hash_sample(d, "doc_id", 30).collect())
    assert a == b == c
    assert 0 < len(a) < 120


def test_hash_sample_rate_monotone_and_salt_rotates(spark):
    d = _docs(spark)
    small = {r.doc_id for r in hash_sample(d, "doc_id", 10).collect()}
    big = {r.doc_id for r in hash_sample(d, "doc_id", 60).collect()}
    assert small <= big  # a kept row stays kept at any higher rate
    other = {
        r.doc_id for r in hash_sample(d, "doc_id", 10, salt="other").collect()
    }
    assert other != small  # a different salt draws a different sample


def test_stratified_rates_respected(spark):
    d = _docs(spark)
    out = stratified_hash_sample(
        d, "doc_id", "source", {"src0": 100, "src1": 0}, default_pct=50
    )
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert counts.get("src0") == 40  # rate 100 keeps every src0 row
    assert "src1" not in counts  # rate 0 drops the stratum entirely
    assert 0 < counts.get("src2", 0) < 40


def test_sample_bucket_range(spark):
    d = _docs(spark)
    mn, mx = (
        d.select(sample_bucket(F.col("doc_id")).alias("b"))
        .agg(F.min("b"), F.max("b"))
        .first()
    )
    assert 0 <= mn and mx < 100


def test_keep_top_k_matches_reference(spark):
    d = _docs(spark)
    out = keep_top_k_per_group(
        d,
        ["source"],
        [F.length("text").desc(), F.col("doc_id").asc()],
        k=4,
    )
    got = {
        (r.source, r.doc_id) for r in out.select("source", "doc_id").collect()
    }
    rows = d.select(
        "source", "doc_id", F.length("text").alias("ln")
    ).collect()
    want = set()
    for src in {r.source for r in rows}:
        grp = sorted(
            (r for r in rows if r.source == src),
            key=lambda r: (-r.ln, r.doc_id),
        )
        want |= {(r.source, r.doc_id) for r in grp[:4]}
    assert got == want


def test_tfidf_accounting_identities(spark):
    d = _docs(spark)
    out = tfidf_terms(d).collect()
    n_docs = d.count()
    total_tokens = d.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
    ).first().n
    assert sum(r.tf_total for r in out) == total_tokens
    for r in out:
        assert 1 <= r.df_docs <= n_docs
        assert r.tf_total >= r.df_docs
        assert r.idf >= 0.0
        assert math.isclose(r.tfidf, r.tf_total * r.idf, rel_tol=1e-12)
