"""Opt-in scale stress tests (set SPARK_GRAFT_STRESS=1 to run).

These run millions of rows through the operators whose failure modes
only appear past unit-test sizes — both round-2 scale bugs were found
exactly this way:

- ``prefix_sum`` keyed its offsets on ``spark_partition_id()`` over
  ``repartitionByRange``, whose sampled bounds differ between
  evaluations → correct at 200 rows, off by hundreds at 5 M.
- distributed ``connected_components`` used pure neighbor-min
  propagation → O(diameter) rounds, silently wrong past 30-hop chains.

Kept out of the default suite for runtime (~2 min); the fast
regressions distilled from them live in test_packing_decontam.py and
test_graph_components.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="set SPARK_GRAFT_STRESS=1 to run scale stress tests",
)


def test_prefix_sum_5m(spark):
    from air_quality_etl_pipeline_spark.operators.packing import prefix_sum

    df = spark.range(5_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = prefix_sum(df, "k", "v", "cum", num_ranges=32)
    assert out.agg(F.max("cum")).first()[0] == sum(
        i % 7 for i in range(5_000_000)
    )


def test_dense_id_5m_post_shuffle(spark):
    from air_quality_etl_pipeline_spark.plans.gold import dense_id

    df = (
        spark.range(5_000_000)
        .select((F.col("id") % 997).alias("g"), F.col("id").alias("x"))
        .groupBy("g", "x")
        .count()
        .drop("count")
    )
    agg = dense_id(df, "k").agg(
        F.countDistinct("k").alias("d"),
        F.count("*").alias("n"),
        F.min("k").alias("lo"),
        F.max("k").alias("hi"),
    ).first()
    assert agg["n"] == agg["d"] == 5_000_000
    assert (agg["lo"], agg["hi"]) == (1, 5_000_000)


def test_connected_components_chains_500k_edges(spark):
    from air_quality_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = (
        spark.range(500_000)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .filter((F.col("id_a") % 50) != 49)
    )
    cc = connected_components(edges, local_threshold=0)
    stats = (
        cc.groupBy("component")
        .count()
        .agg(
            F.count("*").alias("n_comp"),
            F.min("count").alias("lo"),
            F.max("count").alias("hi"),
        )
        .first()
    )
    assert stats["n_comp"] == 10_000
    assert stats["lo"] == stats["hi"] == 50
