"""Bucketed-table co-located join: two tables bucketed on the same key
with the same bucket count must sort-merge join with NO shuffle
exchange — the physical plan is the test."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.sources.writers import write_bucketed_table

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    # location can survive a previous session whose metastore is gone
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], num_buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8,
        sort_cols=["l_orderkey"],
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        # co-located layout: no shuffle of either side
        assert "Exchange" not in plan, plan
        # and the result matches the plain (shuffled) join
        expected = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_ivf_bucketed_index_probe_join_no_index_exchange(spark):
    """ann_ivf_bucketed_batch's contract: the persisted inverted file
    (bucketed by cid) streams into the probe ShuffledHashJoin with NO
    exchange above its scan — only the probe relation shuffles. The
    executed-plan walk asserts the join's streamed side contains the
    bucketed scan and no Exchange between them."""
    from air_quality_etl_pipeline_spark.workload import QUERIES

    df = QUERIES["ann_ivf_bucketed_batch"][0](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # locate the probe join (the only ShuffledHashJoin in the plan)
    joins = [i for i, l in enumerate(lines) if "ShuffledHashJoin" in l]
    assert len(joins) == 1, plan
    # the streamed (index) subtree after the join: from the end of the
    # build subtree to the bucketed scan there must be no Exchange
    tail = "\n".join(lines[joins[0]:])
    assert "Bucketed: true" in tail, plan
    streamed = tail[tail.rindex("+- FileScan"):]
    prev = tail[: tail.rindex("+- FileScan")]
    # the last child of the join is the index scan itself (FileScan is
    # the subtree root line) — no operator, in particular no Exchange,
    # sits between the join and the bucketed scan on the streamed side
    last_child_block = prev[prev.rindex("ShuffledHashJoin"):]
    streamed_side = last_child_block.split(":- Exchange", 1)
    assert len(streamed_side) == 2, plan  # build side shuffles (probe)
    assert "Bucketed: true" in streamed, plan
