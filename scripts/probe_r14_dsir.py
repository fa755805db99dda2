"""Round-14 dsir_importance_weights probe: reuse-safe single token pass.

The r9 single-pass attempt failed because the weight pass's ``~is_t``
filter pushed through the shared groupBy into its scan, splitting the
subtrees. This variant removes the filter from the plan's pushable
region entirely:

- g = toks.groupBy(doc_id, is_t, b).count()   (is_t is per-doc
  constant, so this is (doc, bucket)-grain)
- bucket model and per-doc weights are both CONDITIONAL re-aggregations
  of g (sum(when(is_t...)) / sum(when(~is_t...))); the raw-pool
  restriction becomes a filter on an AGGREGATE OUTPUT (not pushable),
  so both consumers share g's exchange (ReusedExchange) and the
  tokenize+md5 pass runs ONCE instead of twice.

Checks row-identity at sf0.01 + sf0.1, then interleaved warm best-of-3
at sf0.1 (doubles as the VERDICT r13 item-5 solo dsir receipt), plus
plan counters.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def dsir_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.functions.core import (
        md5_long,
        token_array,
    )
    from air_quality_etl_pipeline_spark.functions.portable_math import (
        ln_ratio_portable,
        quantize_micro9,
    )
    from air_quality_etl_pipeline_spark.workload import _t
    from air_quality_etl_pipeline_spark.workload_corpus import (
        _DSIR_BUCKETS,
        _DSIR_TARGET,
    )

    d = _t(spark, sf_dir, "documents")
    is_t = F.col("source").isin(*_DSIR_TARGET)
    toks = d.select(
        "doc_id",
        is_t.alias("is_t"),
        F.explode(token_array(F.col("text"))).alias("_raw"),
    ).select(
        "doc_id",
        "is_t",
        (md5_long(F.lower(F.col("_raw")), salt="dsir") % _DSIR_BUCKETS).alias(
            "b"
        ),
    )
    g = toks.groupBy("doc_id", "is_t", "b").agg(F.count("*").alias("c"))
    bm = g.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(0)).alias("nt"),
        F.sum(F.when(~F.col("is_t"), F.col("c")).otherwise(0)).alias("nr"),
    )
    tot = bm.agg(
        F.sum("nt").alias("n_t_total"), F.sum("nr").alias("n_r_total")
    )
    lam = bm.crossJoin(F.broadcast(tot)).select(
        "b",
        quantize_micro9(
            ln_ratio_portable(
                (F.col("nt") + 1) * (F.col("n_r_total") + _DSIR_BUCKETS),
                (F.col("nr") + 1) * (F.col("n_t_total") + _DSIR_BUCKETS),
            )
        ).alias("lam"),
    )
    doc = (
        g.join(F.broadcast(lam), on="b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(~F.col("is_t"), F.col("c"))).alias("n_tokens"),
            F.sum(
                F.when(~F.col("is_t"), F.col("c") * F.col("lam"))
            ).alias("weight_micro"),
        )
        .filter(F.col("n_tokens").isNotNull())
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("weight_micro").cast("long").alias("weight_micro"),
        )
    )
    return doc.orderBy(F.desc("weight_micro"), F.asc("doc_id")).limit(20)


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="probe_r14_dsir")
    status_quo = QUERIES["dsir_importance_weights"][0]

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a = sorted(map(tuple, status_quo(spark, sf).collect()))
        b = sorted(map(tuple, dsir_variant(spark, sf).collect()))
        ok = a == b
        print(f"identity {sf}: {'OK' if ok else 'MISMATCH'} ({len(a)} rows)")
        if not ok:
            for x, y in zip(a, b):
                if x != y:
                    print("  first diff:", x, "vs", y)
                    break
            spark.stop()
            return 1

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dfs = {
        "status_quo": status_quo(spark, sf),
        "single_pass": dsir_variant(spark, sf),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, df in dfs.items():
        noop(df)
    for rnd in range(3):
        line = []
        for name, df in dfs.items():
            t0 = time.perf_counter()
            noop(df)
            line.append(f"{name}={time.perf_counter() - t0:6.3f}s")
        print(f"round {rnd} ({sf}): " + "  ".join(line))
    for name, df in dfs.items():
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        print(
            f"{name}: FileScan={final.count('FileScan')} "
            f"ReusedExchange={final.count('ReusedExchange')} "
            f"Exchange={final.count('Exchange')}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
