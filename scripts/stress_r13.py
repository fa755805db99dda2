"""Round-13 sf1 scale stress for the √N auto-stride default (round-12
verdict #1) plus the round-13 additions:

* ``ann_ivf_topk_auto`` — the registry query at the NEW default
  (``centroid_stride=None`` → ⌊√N⌋): receipts that the default no
  longer scales assignment as N²/stride. Target: ≤~5× for ×10 data
  (SCALE.md r12 measured 4.7× for the balanced stride vs 8.57× fixed).
* ``ivf_fixed128`` — the SAME query pinned at the old fixed default,
  as the comparator row (nlist ∝ N ⇒ assignment N²/128).
* ``ivf_auto_numpy`` — the auto default with ``assign_mode="numpy"``
  (the documented BLAS production path for the assignment matmul).
* ``bitext_margin_mine_ivf_auto`` — the bitext IVF composition at the
  auto default (r12's registry twin pins stride 125 for its oracle;
  this is the scale-twin row the verdict asked for). Runs under
  ``owned_caches`` so each sample's internal persists are released
  deterministically (r12 verdict #4) — plus clearCache between
  samples, so every sample is cold-path (r12 methodology).
* ``corpus_curation_e2e_v3`` — first sf1 row for the decontamination-
  staged curation DAG (r12 verdict #8).

Anchor (silver_filter_dedup) first and last; method matches
scripts/stress_r12.py: best-of-3 per query per scale, noop sink,
SPARK_GRAFT_SHUFFLE_PARTITIONS=64, shuffle bytes from the
AppStatusStore for the best run, spark.catalog.clearCache() between
samples (cold path — persist-building plans re-hit the CacheManager
by logical-plan equality otherwise).

Usage: PYTHONPATH=/root/repo python scripts/stress_r13.py  (solo box)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from stress_sf1 import SF1, _generate, _shuffle_bytes  # noqa: E402

QUERIES_R13 = [
    "silver_filter_dedup",  # anchor, first and last
    "ann_ivf_topk_auto",
    "corpus_curation_e2e_v3",
]


def _ivf_fixed128(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(
        e, e.filter(F.col("vec_id") < 8), k=5, nprobe=2, dims=64,
        centroid_stride=128,
    )


def _ivf_auto_numpy(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(
        e, e.filter(F.col("vec_id") < 8), k=5, nprobe=2, dims=64,
        assign_mode="numpy",
    )


def _bitext_ivf_auto(spark, sf_dir: str):
    # same split/k/nprobe as the r11/r12 fixed-stride rows, stride at
    # the NEW auto default — the scale twin of bitext_margin_mine_ivf
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
        nprobe=4,
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-r13")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    builders = {name: QUERIES[name][0] for name in QUERIES_R13}
    builders["ivf_fixed128"] = _ivf_fixed128
    builders["ivf_auto_numpy"] = _ivf_auto_numpy
    builders["bitext_margin_mine_ivf_auto"] = _bitext_ivf_auto
    order = QUERIES_R13 + [
        "ivf_fixed128",
        "ivf_auto_numpy",
        "bitext_margin_mine_ivf_auto",
        "silver_filter_dedup:again",
    ]

    # warm codegen at sf0.001
    for name in builders:
        builders[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for name in order:
        qname = name.split(":")[0]
        row: dict = {}
        for label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", SF1)]:
            best, best_shuf = float("inf"), 0
            for i in range(3):
                group = f"r13:{name}:{label}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                builders[qname](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup("", "")
                if dt < best:
                    best, best_shuf = dt, _shuffle_bytes(spark, group)
                # cold path: persist-building plans re-hit the
                # CacheManager by plan equality otherwise (r12 artifact)
                spark.catalog.clearCache()
            row[label] = round(best, 2)
            row[f"{label}_shuffle_mb"] = round(best_shuf / 1e6, 1)
        row["x10_factor"] = round(row["sf1"] / row["sf0.1"], 2)
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)
    print(json.dumps({"r13_stress": results}))
    spark.stop()


if __name__ == "__main__":
    main()
