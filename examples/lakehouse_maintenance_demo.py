"""Nightly lakehouse-maintenance demo: the table-upkeep loop a 100-TB
deployment runs on a schedule, end to end on the synthetic tables —

  1. Z-ORDER the fact table on (partkey, suppkey) and show the
     per-file min/max envelopes tightening on BOTH keys
     (`sources.writers.write_zorder` + the `zorder_layout_audit`
     query's envelope math);
  2. fragment the table into small files, then COMPACT it back
     (`writers.compact_files`) and plan the bins the way
     `compaction_bin_packing` does;
  3. roll up exact daily distinct users through the bitmap-chunk
     aggregation (`bitmap_distinct_rollup`);
  4. run the k-anonymity release gate on the customer table
     (`k_anonymity_audit`).

Run:  python examples/lakehouse_maintenance_demo.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.session import get_spark
from air_quality_etl_pipeline_spark.sources.writers import (
    compact_files,
    write_zorder,
)
from air_quality_etl_pipeline_spark.workload import QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="lakehouse-demo", shuffle_partitions=8)
    scratch = tempfile.mkdtemp(prefix="lakehouse_demo_")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

        # -- 1. Z-order layout -------------------------------------------
        zpath = os.path.join(scratch, "lineitem_z")
        write_zorder(li, zpath, ["l_partkey", "l_suppkey"], num_partitions=16)
        stats = (
            spark.read.parquet(zpath)
            .select(
                F.input_file_name().alias("f"), "l_partkey", "l_suppkey"
            )
            .groupBy("f")
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("pk_span"),
                (F.max("l_suppkey") - F.min("l_suppkey")).alias("sk_span"),
            )
            .agg(
                F.avg("pk_span").alias("avg_pk_span"),
                F.avg("sk_span").alias("avg_sk_span"),
            )
            .first()
        )
        dom = li.agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("sk"),
        ).first()
        print(
            f"zorder: avg file envelope = {stats.avg_pk_span:.0f}/{dom.pk} partkey, "
            f"{stats.avg_sk_span:.0f}/{dom.sk} suppkey "
            "(both keys skippable; a single-key sort only narrows one)"
        )

        # -- 2. fragment, then compact -----------------------------------
        frag = os.path.join(scratch, "orders_frag")
        spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(
            64
        ).write.parquet(frag)
        before = len(glob.glob(f"{frag}/part-*.parquet"))
        n_after = compact_files(spark, frag, target_file_bytes=1 << 20)
        print(f"compaction: {before} small files -> {n_after} packed files")
        plan = QUERIES["compaction_bin_packing"][0](spark, sf_dir)
        print(
            f"compaction planner: {plan.count()} bins over the "
            "month x priority manifest"
        )

        # -- 3. bitmap distinct rollup ------------------------------------
        bm = QUERIES["bitmap_distinct_rollup"][0](spark, sf_dir)
        row = bm.agg(
            F.count("*").alias("days"), F.max("n_users").alias("peak")
        ).first()
        print(
            f"bitmap distinct: {row.days} days, peak {row.peak} users/day "
            "(BIT_OR chunk partials; shuffle bounded by id-space/64)"
        )

        # -- 4. k-anonymity release gate ----------------------------------
        for r in sorted(
            QUERIES["k_anonymity_audit"][0](spark, sf_dir).collect(),
            key=lambda r: r.k,
        ):
            print(
                f"k-anonymity k={r.k}: {r.violating_classes}/{r.n_classes} "
                f"classes violate, {r.rows_at_risk} rows at risk"
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
