"""Probe: summary-relation sizes and collect() vs toPandas() cost for
the order-stats queries' actual keys at sf0.1."""

import time

from pyspark.sql import functions as F


def main() -> None:
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.operators.order_stats import (
        _with_quant_key,
        hex_prefix_key,
    )

    spark = get_spark(app_name="probe-collect")
    orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    cases = {
        "orderkey": (orders, F.col("o_orderkey")),
        "hexprefix": (
            docs.select(
                F.md5(F.concat(F.lit("pad:"), F.col("doc_id").cast("string"))).alias("h")
            ),
            None,
        ),
    }
    for name, (df, key) in cases.items():
        if key is None:
            key = hex_prefix_key(F.col("h"))
        q = _with_quant_key(df, key, "__oq")
        s = q.groupBy("__oq").agg(F.count(F.lit(1)).alias("n"))
        cnt = s.count()
        t0 = time.perf_counter()
        rows = s.collect()
        t1 = time.perf_counter()
        pdf = s.toPandas()
        t2 = time.perf_counter()
        print(
            f"{name}: groups={cnt} collect={t1-t0:.3f}s toPandas={t2-t1:.3f}s rows={len(rows)},{len(pdf)}"
        )

    # quant-key eval cost vs plain projection over 600k rows
    base = orders.select(F.col("o_orderkey").alias("k"))
    t0 = time.perf_counter()
    base.agg(F.sum("k")).collect()
    t1 = time.perf_counter()
    _with_quant_key(base, F.col("k"), "__oq").agg(F.sum("__oq")).collect()
    t2 = time.perf_counter()
    print(f"plain agg={t1-t0:.3f}s quant+agg={t2-t1:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
