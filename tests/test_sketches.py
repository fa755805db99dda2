"""Sketch accuracy contracts: the raw estimates (not just the 0/1
flags) stay within their published bounds on real data."""

from __future__ import annotations

from air_quality_etl_pipeline_spark.operators.sketches import (
    hll_distinct_with_contract,
    quantile_band_contract,
)

SF = "/root/testdata/sf0.01"


def test_hll_estimates_within_3_sigma(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    rows = hll_distinct_with_contract(
        o, ["o_orderpriority"], "o_custkey", rsd=0.02
    ).collect()
    assert rows, "no groups"
    for r in rows:
        rel_err = abs(r.approx_distinct - r.exact_distinct) / r.exact_distinct
        assert rel_err <= 0.06, (r.o_orderpriority, rel_err)
        assert r.within_tol == 1


def test_quantile_estimates_inside_band(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    rows = quantile_band_contract(
        o, "o_totalprice", [0.25, 0.5, 0.75, 0.95], rank_pad=0.01
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.band_lo <= r.estimate <= r.band_hi, (r.p, r.estimate)
        assert r.within_band == 1


def test_kmv_small_union_estimates_exactly(spark):
    """K = min(k, |union sketch|): when two sets' merged sketch holds
    fewer than k hashes, the union sketch IS the exact union, so the
    estimate must be EXACT — identical sets estimate 1.0 (a fixed-k
    denominator would bias it to |A|/k), disjoint sets 0.0, and a
    half-overlap its true Jaccard (round-12 self-review)."""
    from air_quality_etl_pipeline_spark.operators.sketches import (
        kmv_jaccard,
    )

    rows = []
    for t in ["w1", "w2", "w3", "w4"]:
        rows += [("a", t), ("b", t)]          # a == b, 4 tokens
    rows += [("c", t) for t in ["x1", "x2"]]  # c disjoint from a/b
    rows += [("d", t) for t in ["w1", "w2", "y1", "y2"]]  # J(a,d)=1/3
    df = spark.createDataFrame(rows, "g string, tok string")
    got = {
        (r.source_a, r.source_b): r.kmv_jaccard
        for r in kmv_jaccard(df, "g", "tok", k=64).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == 0.0
    assert abs(got[("a", "d")] - 1 / 3) < 1e-12
