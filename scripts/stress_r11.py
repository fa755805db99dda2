"""Round-11 sf1 scale stress for the round-11 changes:

* ``dedup_span_removal`` — the cut application moved from a
  per-position ``array_contains`` set to per-span INTERVALS this
  round (the round-10 advisor's quadratic-whole-clone finding); the
  sf1 corpus replicates every document 10x verbatim, so whole-clone
  cuts dominate — exactly the shape the fix targets.
* ``span_removal_between`` / ``quality_classifier_score`` /
  ``quality_classifier_eval`` — new round-11 operators; first sf1 rows.
* ``shuffle_shards_audit`` — the in-plan unique-key guard added one
  ``rank()`` to the existing rank window this round; receipt that its
  cost is within noise of the r10 rows.
* ``text_scrub_pii`` — the IPv6 pattern gained an alternation branch;
  receipt the regex-chain cost on the new pattern.
* ``bitext_margin_mine`` (IVF path) — the registry query is the exact
  O(|src|x|tgt|) oracle baseline, which is deliberately NOT the 100 TB
  plan; the scale receipt times the IVF-composed path (odd stride so
  both id-parity halves get centroids), timed as a custom callable.

Anchor (silver_filter_dedup) first and last; method matches
scripts/stress_r10.py: best-of-3 per query per scale, noop sink,
SPARK_GRAFT_SHUFFLE_PARTITIONS=64, shuffle bytes from the
AppStatusStore for the best run, sf0.1 comparables same-session.

Usage: PYTHONPATH=/root/repo python scripts/stress_r11.py  (solo box)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from stress_sf1 import SF1, _generate, _shuffle_bytes  # noqa: E402

QUERIES_R11 = [
    "silver_filter_dedup",  # anchor, first and last
    "dedup_span_removal",
    "span_removal_between",
    "quality_classifier_score",
    "quality_classifier_eval",
    "shuffle_shards_audit",
    "text_scrub_pii",
    "bpe_encode_corpus",
]


def _bitext_ivf(spark, sf_dir: str):
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
        centroid_stride=125,  # odd: both id-parity halves get centroids
        nprobe=4,
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-r11")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    builders = {name: QUERIES[name][0] for name in QUERIES_R11}
    builders["bitext_margin_mine_ivf"] = _bitext_ivf
    order = QUERIES_R11 + [
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
                group = f"r11:{name}:{label}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                builders[qname](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup("", "")
                if dt < best:
                    best, best_shuf = dt, _shuffle_bytes(spark, group)
            row[label] = round(best, 2)
            row[f"{label}_shuffle_mb"] = round(best_shuf / 1e6, 1)
        row["x10_factor"] = round(row["sf1"] / row["sf0.1"], 2)
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)
    print(json.dumps({"r11_stress": results}))
    spark.stop()


if __name__ == "__main__":
    main()
