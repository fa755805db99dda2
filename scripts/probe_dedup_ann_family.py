"""Round-7 controlled re-baseline of the dedup/ANN bench family.

BENCH_r05 -> r06 showed +30-60% on ~8 queries in this family; SCALE.md
attributes it to box drift. This probe separates drift from regression
the way the round-6 verdict asked: ONE session, 5 samples per query
taken ROUND-ROBIN (so machine-level drift within the run lands on
every query equally, not on whichever query happened to run last),
medians AND mins reported, with a stable anchor query
(silver_filter_dedup — plan untouched for four rounds) sampled in the
same rotation so the receipt itself shows how noisy the box was.

Usage: python scripts/probe_dedup_ann_family.py  (solo — no other
Spark session on the box, see SCALE.md measurement protocol)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

FAMILY = [
    "silver_filter_dedup",  # anchor
    "dedup_canonical_docs",
    "ivf_pq_search",
    "ann_ivf_topk",
    "embedding_near_dup",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "trigram_backoff_score",
]
SAMPLES = 5


def main() -> None:
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import prepared

    spark = get_spark(app_name="probe-dedup-ann")
    sf_dir = "/root/testdata/sf0.1"
    # warmup pass (JIT + codegen + scan caches)
    for name in FAMILY:
        prepared(spark, sf_dir, name).count()
    samples: dict[str, list[float]] = {n: [] for n in FAMILY}
    for _ in range(SAMPLES):
        for name in FAMILY:
            t0 = time.perf_counter()
            prepared(spark, sf_dir, name).count()
            samples[name].append(time.perf_counter() - t0)
    out = {
        name: {
            "median": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "max": round(max(v), 3),
        }
        for name, v in samples.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
