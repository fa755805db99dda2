"""Probe: phase timing inside with_global_rank on id_gap's input."""

import time

from pyspark.sql import functions as F


def main() -> None:
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.operators import order_stats as os_

    spark = get_spark(app_name="probe-phases")
    orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    ids = orders.select(F.col("o_orderkey").alias("id")).distinct()

    # warm
    os_.with_global_rank(ids, F.col("id"), [F.col("id")], "rn").count()

    for _ in range(3):
        t0 = time.perf_counter()
        base, rows, nr = os_._summary(
            ids, F.col("id"), [], None, True
        )
        t1 = time.perf_counter()
        carve = os_._Carve(rows, nr)
        t2 = time.perf_counter()
        out = base.withColumn("__obkt", carve.bucket_expr(F.col("id")))
        from pyspark.sql import Window

        w = Window.partitionBy("__obkt").orderBy("id")
        out = out.withColumn(
            "rn",
            F.row_number().over(w).cast("long")
            + os_._offset_lookup(carve.count_offsets).cast("long"),
        )
        out.count()
        t3 = time.perf_counter()
        print(
            f"groups={len(rows)} summary={t1-t0:.3f} carve={t2-t1:.3f} window={t3-t2:.3f} total={t3-t0:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
