"""End-to-end training-corpus curation demo on the synthetic documents
table: scrub → span removal → quality gate → near-dup dedup decision →
decontaminate → mixture downsample → pack into training windows →
seeded shuffle-to-shards export, printing a one-line report per stage.

Run:  python examples/curation_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")  # repo root

from air_quality_etl_pipeline_spark.operators.dedup import simhash_pairs
from air_quality_etl_pipeline_spark.operators.graph import dedup_clusters
from air_quality_etl_pipeline_spark.operators.packing import (
    decontaminate,
    pack_sequences,
)
from air_quality_etl_pipeline_spark.operators.sampling import mixture_sample
from air_quality_etl_pipeline_spark.operators.sampling import seeded_shuffle
from air_quality_etl_pipeline_spark.operators.dedup import span_removal
from air_quality_etl_pipeline_spark.operators.text import (
    quality_score,
    scrub_text_pii,
)
from air_quality_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation_demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"corpus            : {n0} docs")

    # 1. scrub PII (URLs, emails, phones, IPs, ID runs) in place
    docs = docs.withColumn("text", scrub_text_pii(F.col("text")))

    # 1b. cut duplicated >=12-token spans, keeping one canonical copy
    cut = span_removal(docs).select(
        "doc_id", F.col("dedup_text").alias("_cut")
    )
    docs = docs.join(cut, on="doc_id", how="left").withColumn(
        "text", F.coalesce(F.col("_cut"), F.col("text"))
    ).drop("_cut")
    reclaimed = cut.count()
    print(f"span removal      : {reclaimed} docs had duplicated spans cut")

    # 2. quality gate: drop the bottom of the quality distribution
    scored = docs.withColumn("q", quality_score(F.col("text")))
    gated = scored.filter(F.col("q") >= 0.33).drop("q")
    print(f"quality gate      : {gated.count()} docs (>= 0.33)")

    # 3. near-dup dedup: SimHash pairs -> connected components -> keepers
    pairs = simhash_pairs(
        gated, "doc_id", "text", bits=48, max_hamming=3, block_cols=["lang"]
    )
    decided = dedup_clusters(gated, pairs, "doc_id")
    keepers = decided.filter(F.col("is_keeper") == 1).select("doc_id")
    deduped = gated.join(keepers, on="doc_id")
    print(f"near-dup dedup    : {deduped.count()} docs kept")

    # 4. decontaminate against a held-out "eval set" (every 50th doc)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    train = deduped.filter(F.col("doc_id") % 50 != 0)
    verdict = decontaminate(train, ev, n=3, min_hits=5)
    clean_ids = verdict.filter(F.col("contaminated") == 0).select("doc_id")
    clean = train.join(clean_ids, on="doc_id")
    print(f"decontamination   : {clean.count()} docs clean")

    # 5. rebalance to a target language mixture under a budget
    mixed = mixture_sample(
        clean,
        "doc_id",
        "lang",
        {"en": 0.4, "fr": 0.2, "de": 0.2, "es": 0.1, "zh": 0.1},
        budget=200,
    )
    mix_report = (
        mixed.groupBy("lang").count().orderBy("lang").collect()
    )
    print(
        "mixture sample    : "
        + ", ".join(f"{r['lang']}={r['count']}" for r in mix_report)
    )

    # 6. pack the survivors into fixed 256-token training windows
    packed = pack_sequences(mixed, ctx=256)
    agg = packed.agg(
        F.count("*").alias("windows"), F.sum("n_tokens").alias("tokens")
    ).first()
    print(
        f"sequence packing  : {agg['windows']} windows, "
        f"{agg['tokens']} tokens"
    )

    # 7. deterministic seeded shuffle into balanced loader shards
    shards = seeded_shuffle(mixed, "doc_id", 8, seed="demo")
    sizes = sorted(
        r["n"] for r in shards.groupBy("shard").agg(
            F.count("*").alias("n")
        ).collect()
    )
    print(f"shard export      : 8 shards, sizes {sizes[0]}-{sizes[-1]}")
    spark.stop()


if __name__ == "__main__":
    main()
