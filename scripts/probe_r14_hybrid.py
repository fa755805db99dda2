"""Round-14 hybrid_rrf_search / bm25_search probe: single tokenize pass.

Status quo runs THREE tokenize+explode passes over documents per
hybrid_rrf execution (dl aggregate, per-term tf aggregate, leg-b tf_sum
aggregate). This variant aggregates the token stream ONCE per doc into
a wide relation (dl + one tf column per query term); corpus stats,
per-term document frequencies, the BM25 score, and leg b's tf_sum are
all derived from the SAME DataFrame object, so every consumer shares
one doc-grain exchange (ReusedExchange — probe_r14_reuse.py).

Unlike the trigram fused-gram rejection (fat vocab exchange re-read 6x),
the shared exchange here is doc-grain and NARROW (4 ints per doc), and
the saved passes are full tokenize scans.

Checks row-identity for both queries at sf0.01 + sf0.1, then
interleaved warm best-of-3 A/B at sf0.1 (and sf1 via
SPARK_GRAFT_SF_DIR), plus plan counters.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _wide_and_glob(spark, sf_dir):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.workload import _t
    from air_quality_etl_pipeline_spark.workload_corpus import _BM25_TERMS
    from air_quality_etl_pipeline_spark.workload_llm import token_array

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(token_array(F.col("text"))).alias("_raw")
    ).select("doc_id", F.lower(F.col("_raw")).alias("tok"))
    wide = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    glob = wide.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    return wide, glob


def bm25_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.functions.core import round_portable
    from air_quality_etl_pipeline_spark.workload_corpus import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )
    from pyspark.sql import Window

    wide, glob = _wide_and_glob(spark, sf_dir)
    joined = wide.crossJoin(F.broadcast(glob))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        df = F.col(f"df_{i}")
        idf = F.ln(
            (F.col("n_docs").cast("double") - df + 0.5) / (df + 0.5) + 1.0
        )
        s = (
            idf
            * (tf * (_BM25_K1 + 1.0))
            / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / avgdl))
        ).cast("decimal(18,9)")
        return F.when(tf > 0, s).otherwise(F.lit(0).cast("decimal(18,9)"))

    total = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        total = total + term_score(i)
    per_doc = joined.filter(
        sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS))) > 0
    ).select("doc_id", round_portable(total.cast("double"), 6).alias("score"))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def hybrid_variant(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from air_quality_etl_pipeline_spark.workload_corpus import _BM25_TERMS

    a = bm25_variant(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    wide, _ = _wide_and_glob(spark, sf_dir)
    tfb = wide.select(
        "doc_id",
        sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS))).alias(
            "tf_sum"
        ),
    ).filter(F.col("tf_sum") > 0)
    wb = Window.orderBy(F.desc("tf_sum"), F.asc("doc_id"))
    b = (
        tfb.withColumn("tf_rank", F.row_number().over(wb).cast("long"))
        .filter(F.col("tf_rank") <= 20)
        .select("doc_id", "tf_rank")
    )
    fused = a.join(b, on="doc_id", how="full_outer").withColumn(
        "rrf_micro",
        (
            F.coalesce(F.expr("div(1000000, 60 + bm25_rank)"), F.lit(0))
            + F.coalesce(F.expr("div(1000000, 60 + tf_rank)"), F.lit(0))
        ).cast("long"),
    )
    wf = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= 10)
        .select("doc_id", "bm25_rank", "tf_rank", "rrf_micro", "fused_rank")
    )


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="probe_r14_hybrid")

    pairs = {
        "bm25_search": (QUERIES["bm25_search"][0], bm25_variant),
        "hybrid_rrf_search": (QUERIES["hybrid_rrf_search"][0], hybrid_variant),
    }
    for qname, (old, new) in pairs.items():
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            va = sorted(map(tuple, old(spark, sf).collect()))
            vb = sorted(map(tuple, new(spark, sf).collect()))
            ok = va == vb
            print(f"identity {qname} {sf}: {'OK' if ok else 'MISMATCH'} ({len(va)} rows)")
            if not ok:
                for x, y in zip(va, vb):
                    if x != y:
                        print("  first diff:", x, "vs", y)
                        break
                spark.stop()
                return 1

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dfs = {
        "old_hybrid": QUERIES["hybrid_rrf_search"][0](spark, sf),
        "new_hybrid": hybrid_variant(spark, sf),
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
