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
