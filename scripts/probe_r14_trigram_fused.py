"""Round-14 trigram probe: single fused gram pass + exchange reuse.

Round 9/10/13 adjudicated the five-join trigram lookup as the measured
optimum "for this no-subtree-reuse runtime". Round 14 re-probed the
premise and found AQE DOES reuse identical exchange subtrees
(ReusedExchange in the final plan — scripts/probe_r14_reuse.py), so the
fused variant is rebuilt WITHOUT checkpoints this time:

- ONE explode of (uni ++ bi ++ tri) grams over the train half,
- ONE groupBy (w1, w2, w3) with three conditional sums (_u/_b/_t —
  group null-pattern picks exactly one),
- c1/c2/c3 carved by filters on AGGREGATE OUTPUTS (not pushable below
  the aggregate, so every consumer shares one exchange subtree →
  ReusedExchange), n_tokens = sum(_u) over the same exchange.

Checks row-identity vs the registered query at sf0.01 + sf0.1, then
interleaved warm best-of-3 A/B at sf0.1, and prints the FileScan /
ReusedExchange counts of both final plans.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def fused_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.functions.portable_math import (
        ln_ratio_portable,
        mean_round6_micro,
        quantize_micro9,
    )
    from air_quality_etl_pipeline_spark.workload import _t
    from air_quality_etl_pipeline_spark.workload_llm import token_array

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.transform(token_array(F.col("text")), lambda x: F.lower(x)).alias(
            "toks"
        ),
    )
    tr = toks.filter(F.col("doc_id") % 2 == 0)
    te = toks.filter((F.col("doc_id") % 2 == 1) & (F.size("toks") >= 3))

    gram_struct = (
        "named_struct('w1', element_at(toks, i), "
        "'w2', CAST(NULL AS STRING), 'w3', CAST(NULL AS STRING))"
    )
    bi_struct = (
        "named_struct('w1', element_at(toks, i), "
        "'w2', element_at(toks, i + 1), 'w3', CAST(NULL AS STRING))"
    )
    tri_struct = (
        "named_struct('w1', element_at(toks, i), "
        "'w2', element_at(toks, i + 1), 'w3', element_at(toks, i + 2))"
    )
    empty = (
        "CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING, w3: STRING>>)"
    )
    fused = tr.selectExpr(
        f"""
        explode(concat(
          transform(sequence(1, size(toks)), i -> {gram_struct}),
          CASE WHEN size(toks) >= 2
               THEN transform(sequence(1, size(toks) - 1), i -> {bi_struct})
               ELSE {empty} END,
          CASE WHEN size(toks) >= 3
               THEN transform(sequence(1, size(toks) - 2), i -> {tri_struct})
               ELSE {empty} END
        )) AS g
        """
    ).select("g.w1", "g.w2", "g.w3")
    counts = fused.groupBy("w1", "w2", "w3").agg(
        F.sum(
            F.when(F.col("w2").isNull() & F.col("w3").isNull(), 1)
        ).alias("_u"),
        F.sum(
            F.when(F.col("w2").isNotNull() & F.col("w3").isNull(), 1)
        ).alias("_b"),
        F.sum(F.when(F.col("w3").isNotNull(), 1)).alias("_t"),
    )
    c1 = counts.filter(F.col("_u").isNotNull()).select(
        F.col("w1").alias("w"), F.col("_u").alias("n1u")
    )
    c2 = counts.filter(F.col("_b").isNotNull()).select(
        "w1", "w2", F.col("_b").alias("n12")
    )
    c3 = counts.filter(F.col("_t").isNotNull()).select(
        "w1", "w2", "w3", F.col("_t").alias("n123")
    )
    n = counts.agg(
        F.coalesce(F.sum("_u"), F.lit(0)).cast("long").alias("n_tokens")
    )

    def trigrams(df):
        return df.filter(F.size("toks") >= 3).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size("toks") - 2, F.lit(0))
                    ),
                    lambda i: F.struct(
                        F.element_at(F.col("toks"), i).alias("w1"),
                        F.element_at(F.col("toks"), i + 1).alias("w2"),
                        F.element_at(F.col("toks"), i + 2).alias("w3"),
                    ),
                )
            ).alias("t"),
        ).select("doc_id", "t.w1", "t.w2", "t.w3")

    db3 = (
        trigrams(te)
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count("*").alias("cnt"))
    )
    tv = db3.groupBy("w1", "w2", "w3").agg(F.count("*").alias("_nd"))
    p12 = c2.select(
        F.col("w1").alias("p12_w1"),
        F.col("w2").alias("p12_w2"),
        F.col("n12").alias("p12_n"),
    )
    p23 = c2.select(
        F.col("w1").alias("p23_w1"),
        F.col("w2").alias("p23_w2"),
        F.col("n12").alias("p23_n"),
    )
    u2 = c1.select(F.col("w").alias("u2_w"), F.col("n1u").alias("u2_n"))
    u3 = c1.select(F.col("w").alias("u3_w"), F.col("n1u").alias("u3_n"))
    joined = (
        tv.join(c3, on=["w1", "w2", "w3"], how="left")
        .join(
            p12,
            (F.col("w1") == F.col("p12_w1"))
            & (F.col("w2") == F.col("p12_w2")),
            "left",
        )
        .join(
            p23,
            (F.col("w2") == F.col("p23_w1"))
            & (F.col("w3") == F.col("p23_w2")),
            "left",
        )
        .join(u2, F.col("w2") == F.col("u2_w"), "left")
        .join(u3, F.col("w3") == F.col("u3_w"), "left")
        .crossJoin(F.broadcast(n))
    )
    score = (
        F.when(
            F.col("n123").isNotNull(),
            ln_ratio_portable(F.col("n123"), F.col("p12_n")),
        )
        .when(
            F.col("p23_n").isNotNull(),
            ln_ratio_portable(F.col("p23_n") * 2, F.col("u2_n") * 5),
        )
        .when(
            F.col("u3_n").isNotNull(),
            ln_ratio_portable(F.col("u3_n") * 4, F.col("n_tokens") * 25),
        )
        .otherwise(ln_ratio_portable(F.lit(4), F.col("n_tokens") * 25))
    )
    tv_scored = joined.select(
        "w1", "w2", "w3", quantize_micro9(score).alias("_s")
    )
    scored = db3.join(tv_scored, on=["w1", "w2", "w3"]).select(
        "doc_id", "cnt", (F.col("_s") * F.col("cnt")).alias("t")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_trigrams"),
        mean_round6_micro(F.sum("t"), F.sum("cnt")).alias("avg_logscore"),
    )


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="probe_r14_trigram_fused")
    status_quo = QUERIES["trigram_backoff_score"][0]

    # row-identity at both SFs
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a = sorted(map(tuple, status_quo(spark, sf).collect()))
        b = sorted(map(tuple, fused_variant(spark, sf).collect()))
        ok = a == b
        print(f"identity {sf}: {'OK' if ok else 'MISMATCH'} ({len(a)} rows)")
        if not ok:
            for x, y in zip(a, b):
                if x != y:
                    print("  first diff:", x, "vs", y)
                    break
            spark.stop()
            return 1

    sf = "/root/testdata/sf0.1"
    dfs = {"status_quo": status_quo(spark, sf), "fused": fused_variant(spark, sf)}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, df in dfs.items():
        noop(df)  # warm

    for rnd in range(3):
        line = []
        for name, df in dfs.items():
            t0 = time.perf_counter()
            noop(df)
            line.append(f"{name}={time.perf_counter() - t0:6.3f}s")
        print(f"round {rnd}: " + "  ".join(line))

    for name, df in dfs.items():
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        print(
            f"{name}: FileScan={final.count('FileScan')} "
            f"ReusedExchange={final.count('ReusedExchange')} "
            f"Exchange={final.count('Exchange')} "
            f"Generate={final.count('Generate')}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
