"""Approximate-sketch workload: HLL++ distinct counts and t-digest
quantiles, verified through their ACCURACY CONTRACTS.

Sketch register layouts are engine-specific, so the raw estimates can
never hash-match a DuckDB twin. What IS portable is the contract: the
estimate must sit within its published error bound of the exact value.
Each query therefore emits the exact aggregate plus a 0/1
within-tolerance flag; the oracle reproduces the exact values and
asserts the flag — a full value-hash verification that the sketch
honored its bound on this input. Unit tests (tests/test_sketches.py)
additionally pin the tighter measured error and the raw estimates.

These are the 100 TB workhorses: one-pass, fixed-size, mergeable state
per group versus the exact forms' expand-shuffle (distinct) and
per-group sort (percentile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.core import round_portable
from air_quality_etl_pipeline_spark.operators.sketches import (
    hll_distinct_with_contract,
    quantile_band_contract,
)
from air_quality_etl_pipeline_spark.workload import _t, register

_QB_PROBS = [0.25, 0.5, 0.75, 0.95]
_QB_PAD = 0.01


@register(
    "sketch_hll_distinct",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_distinct,
           CAST(1 AS BIGINT) AS within_tol
    FROM orders GROUP BY 1
    """,
)
def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct customers per order priority, 2% rsd, checked
    against the exact distinct computed in the SAME groupBy (the HLL
    rides the exact-distinct's shuffle, so auditing the bound is free).
    within_tol asserts the 3σ bound; the oracle's flag is literal 1 —
    an HLL estimate outside tolerance fails the hash compare."""
    o = _t(spark, sf_dir, "orders")
    out = hll_distinct_with_contract(
        o, ["o_orderpriority"], "o_custkey", rsd=0.02
    )
    return out.select("o_orderpriority", "exact_distinct", "within_tol")


def _qb_oracle() -> str:
    parts = []
    for p in _QB_PROBS:
        lo, hi = max(0.0, p - _QB_PAD), min(1.0, p + _QB_PAD)
        parts.append(
            f"""
    SELECT CAST({p} AS DOUBLE) AS p,
           floor(quantile_cont(o_totalprice, {lo}) * 1000000.0 + 0.5)
             / 1000000.0 AS band_lo,
           floor(quantile_cont(o_totalprice, {hi}) * 1000000.0 + 0.5)
             / 1000000.0 AS band_hi,
           CAST(1 AS BIGINT) AS within_band
    FROM orders"""
        )
    return "\n    UNION ALL".join(parts)


@register("sketch_quantile_band", _qb_oracle())
def q_sketch_quantile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (accuracy 10k ⇒ rank error ≤ 1e-4) banded by
    the exact [p−0.01, p+0.01] percentiles of o_totalprice: the
    estimate must land inside the band by the estimator's published
    rank guarantee. Band edges are exact interpolated percentiles —
    portable doubles the oracle reproduces; the sketch value itself
    stays out of the hashed columns."""
    o = _t(spark, sf_dir, "orders")
    out = quantile_band_contract(
        o, "o_totalprice", _QB_PROBS, rank_pad=_QB_PAD
    )
    return out.select(
        "p",
        round_portable(F.col("band_lo"), 6).alias("band_lo"),
        round_portable(F.col("band_hi"), 6).alias("band_hi"),
        "within_band",
    )
