"""Round-8 decision probe for the clusters-family star-edge collapse
(verdict #6 / SCALE.md "Generalization path, documented, not yet
wired"): at 10 clones/doc the family measured sub-linear (2.3x), so
the linear star-edge variant was deferred pending a clone-heavy
measurement. This builds that corpus — 1000 distinct documents x 50
verbatim clones (lang preserved) — and races the shipping clique
plan against the star-edge plan, asserting result identity first.

Star-edge variant (connectivity-equivalent by construction):
  1. collapse exact clones keyed by (lang, md5(text)) — the block
     column MUST join the key (SCALE.md caution #1): text-only
     collapse would merge identical texts across lang blocks that
     simhash_pairs(block_cols=["lang"]) keeps apart.
  2. run the banded SimHash pair search over REPRESENTATIVES only.
  3. add one linear rep->member edge per non-representative clone
     (a star replaces the g-clique; components and min labels are
     unchanged because cliques and stars connect the same vertex
     sets, and rep-rep candidacy transfers member-to-member for
     byte-identical texts).

NOT applicable to split_leakage_audit: its output counts PAIRS of the
sim_pairs relation itself, which the star rewrite changes.

Usage: python scripts/probe_star_edges.py  (solo box)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

CLONES = 50
DISTINCT = 1000
CORPUS = "/tmp/clone50_corpus"
SAMPLES = 3


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        return
    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .orderBy("doc_id")
        .limit(DISTINCT)
    )
    parts = []
    for i in range(CLONES):
        parts.append(
            base.withColumn(
                "doc_id",
                (F.col("doc_id") + F.lit(i * 1_000_000)).cast("bigint"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(CORPUS)


def clique_plan(spark, docs):
    from air_quality_etl_pipeline_spark.operators.dedup import simhash_pairs
    from air_quality_etl_pipeline_spark.operators.graph import dedup_clusters

    pairs = simhash_pairs(
        docs, "doc_id", "text", bits=48, max_hamming=3, block_cols=["lang"]
    )
    return dedup_clusters(docs, pairs, "doc_id")


def star_plan(spark, docs):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.dedup import simhash_pairs
    from air_quality_etl_pipeline_spark.operators.graph import dedup_clusters

    # collapse keyed by (lang, raw md5) — lang rides the fingerprint
    # groupBy exactly like collapse_exact_clones' text key
    fpf = docs.select(
        "doc_id",
        "text",
        "lang",
        F.md5(F.concat_ws("\x1f", F.col("lang"), F.col("text"))).alias("_fp"),
    )
    groups = fpf.groupBy("_fp").agg(
        F.min(F.struct("doc_id", "text", "lang")).alias("_r")
    )
    members = fpf.select("doc_id", "_fp").join(
        groups.select("_fp", F.col("_r.doc_id").alias("_rep")), on="_fp"
    )
    reps = groups.select(
        F.col("_r.doc_id").alias("doc_id"),
        F.col("_r.text").alias("text"),
        F.col("_r.lang").alias("lang"),
    )
    rep_pairs = simhash_pairs(
        reps, "doc_id", "text", bits=48, max_hamming=3, block_cols=["lang"]
    ).select("id_a", "id_b")
    star = members.filter(F.col("doc_id") != F.col("_rep")).select(
        F.least("_rep", "doc_id").alias("id_a"),
        F.greatest("_rep", "doc_id").alias("id_b"),
    )
    return dedup_clusters(docs, rep_pairs.unionByName(star), "doc_id")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-star-edges")
    build_corpus(spark)
    docs = spark.read.parquet(CORPUS)

    a = sorted(tuple(r) for r in clique_plan(spark, docs).collect())
    b = sorted(tuple(r) for r in star_plan(spark, docs).collect())
    assert a == b, f"result mismatch: {len(a)} vs {len(b)} rows"
    print(f"result identity OK over {len(a)} docs")

    variants = {
        "clique (shipping)": lambda: clique_plan(spark, docs),
        "star-edge": lambda: star_plan(spark, docs),
    }
    for fn in variants.values():
        fn().count()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(SAMPLES):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().count()
            samples[name].append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                n: {
                    "median": round(statistics.median(v), 2),
                    "min": round(min(v), 2),
                }
                for n, v in samples.items()
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
