"""Round-9 sf1 scale stress for the round-9 changes: the narrow-
collapse star cascade (dedup_clusters / dedup_canonical_docs — the
round-8 sf1 rows were measured on the text-shuffling collapse this
round replaced, so their x10 factors need re-receipting) and the new
cdc_apply_scd2 (interval rebuild over the 6M-change feed). The anchor
(silver_filter_dedup, plan untouched since round 3) is measured in
the same session, first and last, so box drift is separable from real
scaling.

Method matches scripts/stress_sf1.py: best-of-3 per query per scale,
SPARK_GRAFT_SHUFFLE_PARTITIONS=64, shuffle bytes from the
AppStatusStore for the best run, sf0.1 comparables same-session. The
sf1 corpus replicates every document 10x verbatim — each doc gains 9
exact clones, exactly the shape the star cascade exists for.

Usage: PYTHONPATH=/root/repo python scripts/stress_r9.py
"""

from __future__ import annotations

import json
import os
import time

from stress_sf1 import SF1, _generate, _shuffle_bytes

QUERIES_R9 = [
    "silver_filter_dedup",  # anchor, first and last
    "dedup_clusters",
    "dedup_canonical_docs",
    "cdc_apply_scd2",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-r9")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    # warm codegen at sf0.001
    for name in QUERIES_R9:
        QUERIES[name][0](spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict] = {}
    for name in QUERIES_R9 + ["silver_filter_dedup:again"]:
        qname = name.split(":")[0]
        row: dict = {}
        for label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", SF1)]:
            best, best_shuf = float("inf"), 0
            for i in range(3):
                group = f"r9:{name}:{label}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                QUERIES[qname][0](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup("", "")
                if dt < best:
                    best, best_shuf = dt, _shuffle_bytes(spark, group)
            row[label] = round(best, 2)
            row[f"{label}_shuffle_mb"] = round(best_shuf / 1e6, 1)
        row["x10_factor"] = round(row["sf1"] / row["sf0.1"], 2)
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)
    print(json.dumps({"r9_stress": results}))
    spark.stop()


if __name__ == "__main__":
    main()
