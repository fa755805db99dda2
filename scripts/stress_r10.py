"""Round-10 sf1 scale stress for the round-10 changes, plus the
receipt refreshes the round-9 verdict asked for:

* ``cdc_apply_snapshot`` — its plan changed in round 9 (lazy in-plan
  multiple-match check) AFTER its last sf1 stress row was recorded;
  this re-receipts the stress table on the current plan (verdict #8).
* ``dedup_span_runs`` — the shared-gram ≥2-docs flag moved from
  ``countDistinct(doc)`` to the min≠max fold this round (verdict #7's
  cost center); receipt the time/bytes on the new aggregate.
* ``dedup_span_removal`` / ``shuffle_shards_audit`` /
  ``dsir_gumbel_sample`` / ``text_scrub_pii`` — new round-10
  operators; first sf1 rows. The sf1 corpus replicates every document
  10× verbatim, so span removal sees each shared span in 10 docs
  (9 removable occurrences per cluster) — the adversarial shape.

The anchor (silver_filter_dedup, plan untouched since round 3) runs
first and last so box drift is separable from real scaling. Method
matches scripts/stress_sf1.py: best-of-3 per query per scale,
SPARK_GRAFT_SHUFFLE_PARTITIONS=64, shuffle bytes from the
AppStatusStore for the best run, sf0.1 comparables same-session.
Materialization is the ``noop`` sink (round-10 change, also in
bench.py): ``count()`` let Catalyst prune computed output columns,
under-billing projection-terminal queries (text_scrub_pii's first
r10 stress run measured 0.13 s at sf1 — the regex chain never ran).

Usage: PYTHONPATH=/root/repo python scripts/stress_r10.py
"""

from __future__ import annotations

import json
import os
import time

from stress_sf1 import SF1, _generate, _shuffle_bytes

QUERIES_R10 = [
    "silver_filter_dedup",  # anchor, first and last
    "cdc_apply_snapshot",
    "dedup_span_runs",
    "dedup_span_removal",
    "shuffle_shards_audit",
    "dsir_gumbel_sample",
    "text_scrub_pii",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-r10")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    # warm codegen at sf0.001
    for name in QUERIES_R10:
        QUERIES[name][0](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in QUERIES_R10 + ["silver_filter_dedup:again"]:
        qname = name.split(":")[0]
        row: dict = {}
        for label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", SF1)]:
            best, best_shuf = float("inf"), 0
            for i in range(3):
                group = f"r10:{name}:{label}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                QUERIES[qname][0](spark, sf_dir).write.format("noop").mode(
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
    print(json.dumps({"r10_stress": results}))
    spark.stop()


if __name__ == "__main__":
    main()
