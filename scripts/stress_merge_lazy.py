"""sf1 scale stress for the round-9 in-plan MERGE multiple-match
check (``check_multiple_matches="lazy"``): the round-8 sf1 rows for
merge_full_sync (3.25x) and merge_multi_clause (3.59x) were measured
WITH the eager probe actions this change removed — merge_full_sync
paid a routing probe whose target-keys distinct scales with the data,
and merge_multi_clause re-executed the whole fan-out join for the
per-target qualifying count — so their x10 factors need re-receipting
on the one-action plans. Anchor (silver_filter_dedup) first and last,
same method as scripts/stress_r9.py.

Usage: PYTHONPATH=/root/repo python scripts/stress_merge_lazy.py
"""

from __future__ import annotations

import json
import os
import time

from stress_sf1 import SF1, _generate, _shuffle_bytes

QUERIES_MERGE = [
    "silver_filter_dedup",  # anchor, first and last
    "merge_full_sync",
    "merge_multi_clause",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-merge-lazy")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    for name in QUERIES_MERGE:
        QUERIES[name][0](spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict] = {}
    for name in QUERIES_MERGE + ["silver_filter_dedup:again"]:
        qname = name.split(":")[0]
        row: dict = {}
        for label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", SF1)]:
            best, best_shuf = float("inf"), 0
            for i in range(3):
                group = f"mlazy:{name}:{label}:{i}"
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
    print(json.dumps({"merge_lazy_stress": results}))
    spark.stop()


if __name__ == "__main__":
    main()
