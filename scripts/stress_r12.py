"""Round-12 sf1 scale stress for the round-12 changes:

* ``streaming_span_removal`` — the only round-11 addition without an
  sf1 row (round-11 verdict #7): receipts that the once-built corpus
  gram table amortizes across the drain at x10 data (the build is
  outside ``foreachBatch``; each micro-batch pays only its own
  semi-join).
* ``corpus_curation_e2e_v2`` / ``streaming_quality_score`` /
  ``bitext_doc_align`` — new round-12 queries; first sf1 rows. The
  doc-align registry query is the exact doc×doc oracle baseline
  (quadratic by design — documented brute path); the IVF-composed
  scale variant is timed as a custom callable alongside it, the same
  split the sentence-grain miner receipts used in r11.
* ``span_removal_between`` — the flagging join switched to a
  duplicate-immune LEFT SEMI join this round (no defensive
  corpus-sized distinct exchange); receipt it stays within noise of
  the r11 rows (sf1 1.93x then).
* ``text_scrub_pii`` — the IPv6 alternation was reordered (compressed
  branch first); receipt the regex-chain cost is unchanged.
* ``bitext_margin_mine_ivf`` (custom callable, same params as r11) —
  the probe join's self-exclusion filter became conditional
  (exclude_self); receipt against the r11 row (0.96x then).

Anchor (silver_filter_dedup) first and last; method matches
scripts/stress_r11.py: best-of-3 per query per scale, noop sink,
SPARK_GRAFT_SHUFFLE_PARTITIONS=64, shuffle bytes from the
AppStatusStore for the best run, sf0.1 comparables same-session.

Usage: PYTHONPATH=/root/repo python scripts/stress_r12.py  (solo box)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from stress_sf1 import SF1, _generate, _shuffle_bytes  # noqa: E402

QUERIES_R12 = [
    "silver_filter_dedup",  # anchor, first and last
    "streaming_span_removal",
    "span_removal_between",
    "corpus_curation_e2e_v2",
    "streaming_quality_score",
    "bitext_doc_align",
    "text_scrub_pii",
]


def _doc_align_ivf(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.similarity import (
        bitext_doc_align,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return bitext_doc_align(
        e.filter(F.col("vec_id") % 2 == 0).select(
            F.expr("vec_id DIV 16").alias("did"), "embedding"
        ),
        e.filter(F.col("vec_id") % 2 == 1).select(
            F.expr("vec_id DIV 16").alias("did"), "embedding"
        ),
        doc_col="did",
        k=3,
        method="ivf",
        centroid_stride=25,  # odd: both parity halves get centroids
        nprobe=4,
    )


def _bitext_ivf(spark, sf_dir: str):
    # identical params to scripts/stress_r11.py for a round-over-round
    # receipt on the exclude_self change
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.similarity import (
        bitext_margin_mine,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return bitext_margin_mine(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
        k=4,
        method="ivf",
        centroid_stride=125,
        nprobe=4,
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-r12")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    builders = {name: QUERIES[name][0] for name in QUERIES_R12}
    builders["bitext_doc_align_ivf"] = _doc_align_ivf
    builders["bitext_margin_mine_ivf"] = _bitext_ivf
    order = QUERIES_R12 + [
        "bitext_doc_align_ivf",
        "bitext_margin_mine_ivf",
        "silver_filter_dedup:again",
    ]

    # warm codegen at sf0.001
    for name in builders:
        builders[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in order:
        qname = name.split(":")[0]
        row: dict = {}
        for label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", SF1)]:
            best, best_shuf = float("inf"), 0
            for i in range(3):
                group = f"r12:{name}:{label}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                builders[qname](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup("", "")
                if dt < best:
                    best, best_shuf = dt, _shuffle_bytes(spark, group)
                # repeated persist-building queries accumulate cached
                # blocks (caller-owned lifecycle) — clear between runs
                spark.catalog.clearCache()
            row[label] = round(best, 2)
            row[f"{label}_shuffle_mb"] = round(best_shuf / 1e6, 1)
        row["x10_factor"] = round(row["sf1"] / row["sf0.1"], 2)
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)
    print(json.dumps({"r12_stress": results}))
    spark.stop()


if __name__ == "__main__":
    main()
