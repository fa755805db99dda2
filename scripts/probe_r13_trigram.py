"""A/B probe: trigram_backoff_score status quo (prepared plan, 8
corpus scans/action) vs the fused single-gram-pass rewrite (one train
pass into a localCheckpoint'ed (ord, w1, w2, w3, cnt) relation, one
checkpointed db3, vocab-only joins). Candidate pays per-sample
REBUILD (construct + checkpoint jobs + action); status quo pays only
the action on a prepared plan. Interleaved samples, anchor first."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F


def fused_trigram(spark, sf_dir: str, cp_db3: bool = True) -> DataFrame:
    from air_quality_etl_pipeline_spark.functions.core import token_array
    from air_quality_etl_pipeline_spark.functions.portable_math import (
        ln_ratio_portable,
        mean_round6_micro,
        quantize_micro9,
    )
    from air_quality_etl_pipeline_spark.workload import _t

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.transform(token_array(F.col("text")), lambda x: F.lower(x)).alias(
            "toks"
        ),
    )
    tr = toks.filter(F.col("doc_id") % 2 == 0)
    te = toks.filter((F.col("doc_id") % 2 == 1) & (F.size("toks") >= 3))

    _EMPTY = (
        "filter(transform(sequence(1, 1), i -> struct(1 AS ord, '' AS w1, "
        "CAST(NULL AS STRING) AS w2, CAST(NULL AS STRING) AS w3)), "
        "x -> false)"
    )
    g1 = (
        "IF(size(toks) >= 1, transform(sequence(1, size(toks)), "
        "i -> struct(1 AS ord, element_at(toks, i) AS w1, "
        f"CAST(NULL AS STRING) AS w2, CAST(NULL AS STRING) AS w3)), {_EMPTY})"
    )
    g2 = (
        "IF(size(toks) >= 2, transform(sequence(1, size(toks) - 1), "
        "i -> struct(2 AS ord, element_at(toks, i) AS w1, "
        "element_at(toks, i + 1) AS w2, CAST(NULL AS STRING) AS w3)), "
        f"{_EMPTY})"
    )
    g3 = (
        "IF(size(toks) >= 3, transform(sequence(1, size(toks) - 2), "
        "i -> struct(3 AS ord, element_at(toks, i) AS w1, "
        "element_at(toks, i + 1) AS w2, element_at(toks, i + 2) AS w3)), "
        f"{_EMPTY})"
    )
    grams = tr.selectExpr(f"explode(concat({g1}, {g2}, {g3})) AS g").select(
        "g.ord", "g.w1", "g.w2", "g.w3"
    )
    counts = (
        grams.groupBy("ord", "w1", "w2", "w3")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    c3 = counts.where("ord = 3").select(
        "w1", "w2", "w3", F.col("cnt").alias("n123")
    )
    c2 = counts.where("ord = 2")
    c1 = counts.where("ord = 1")
    n = counts.where("ord = 1").agg(
        F.sum("cnt").cast("long").alias("n_tokens")
    )

    def trigrams(df):
        return df.select(
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
    if cp_db3:
        db3 = db3.localCheckpoint(eager=True)
    tv = db3.groupBy("w1", "w2", "w3").agg(F.count("*").alias("_nd"))
    p12 = c2.select(
        F.col("w1").alias("p12_w1"),
        F.col("w2").alias("p12_w2"),
        F.col("cnt").alias("p12_n"),
    )
    p23 = c2.select(
        F.col("w1").alias("p23_w1"),
        F.col("w2").alias("p23_w2"),
        F.col("cnt").alias("p23_n"),
    )
    u2 = c1.select(F.col("w1").alias("u2_w"), F.col("cnt").alias("u2_n"))
    u3 = c1.select(F.col("w1").alias("u3_w"), F.col("cnt").alias("u3_n"))
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
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES, prepared

    spark = get_spark(app_name="probe_trigram")
    sf = "/root/testdata/sf0.1"
    warm = "/root/testdata/sf0.001"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # correctness first: fused vs status quo at sf0.01
    a = sorted(
        tuple(r)
        for r in QUERIES["trigram_backoff_score"][0](
            spark, "/root/testdata/sf0.01"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in fused_trigram(spark, "/root/testdata/sf0.01").collect()
    )
    print("rows equal:", a == b, len(a), len(b))
    if a != b:
        diff = [x for x, y in zip(a, b) if x != y][:5]
        print("first diffs:", diff)
        return 1

    noop(QUERIES["trigram_backoff_score"][0](spark, warm))
    noop(fused_trigram(spark, warm))
    anchor = prepared(spark, sf, "silver_filter_dedup")
    noop(anchor)

    for rnd in range(3):
        t0 = time.perf_counter()
        noop(anchor)
        t1 = time.perf_counter()
        noop(prepared(spark, sf, "trigram_backoff_score"))
        t2 = time.perf_counter()
        df = fused_trigram(spark, sf, cp_db3=True)
        t3 = time.perf_counter()
        noop(df)
        t4 = time.perf_counter()
        df2 = fused_trigram(spark, sf, cp_db3=False)
        t5 = time.perf_counter()
        noop(df2)
        t6 = time.perf_counter()
        print(
            f"round {rnd}: anchor={t1-t0:.3f} statusquo={t2-t1:.3f} "
            f"fused_cp_build={t3-t2:.3f} fused_cp_action={t4-t3:.3f} "
            f"fused_nocp_build={t5-t4:.3f} fused_nocp_action={t6-t5:.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
