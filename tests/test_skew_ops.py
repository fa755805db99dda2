"""Skew-mitigation operators: the salted rewrites must be
result-identical to their naive forms for every SUPPORTED join type,
and must refuse the join types where salting would duplicate
unmatched build-side rows (right/full outer — one surviving copy per
salt replica)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.skew import (
    salted_join,
    two_phase_agg,
)


def _frames(spark):
    # hot key 1 dominates the big side; key 4 is big-only (exercises
    # left/anti), key 9 is small-only (exercises the outer trap)
    big = spark.createDataFrame(
        [(1, i) for i in range(40)] + [(2, 100), (3, 101), (4, 102)],
        "k long, v long",
    )
    small = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "z")], "k long, s string"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_identical_to_plain(spark, how):
    big, small = _frames(spark)
    got = sorted(map(tuple, salted_join(big, small, ["k"], 4, how).collect()))
    want = sorted(map(tuple, big.join(small, ["k"], how).collect()))
    assert got == want


@pytest.mark.parametrize(
    "how", ["right", "right_outer", "full", "full_outer", "outer"]
)
def test_salted_join_rejects_small_side_preserving_types(spark, how):
    big, small = _frames(spark)
    with pytest.raises(ValueError, match="salt replica"):
        salted_join(big, small, ["k"], 4, how)


def test_two_phase_agg_identical_to_plain(spark):
    big, _ = _frames(spark)
    got = sorted(
        map(
            tuple,
            two_phase_agg(
                big,
                ["k"],
                [
                    (F.sum("v"), "sum_v", F.sum("sum_v")),
                    (F.count("*"), "count_v", F.sum("count_v")),
                ],
                buckets=4,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            big.groupBy("k")
            .agg(
                F.sum("v").alias("sum_v"),
                F.count("*").cast("long").alias("count_v"),
            )
            .collect(),
        )
    )
    assert got == want
