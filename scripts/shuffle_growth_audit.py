"""Registry-wide shuffle-growth audit (round 9): run every bench.py
headline query at sf0.1 and sf1 (10x data), recording wall time and
shuffle-write bytes from the AppStatusStore, and rank by the
shuffle growth factor. A query whose shuffle grows much faster than
the data (>> 10x) has a scale defect of the kind the (keys, tid)
merge fix closed — the fan-out was re-shuffled on an opaque key and
the eager probe had been masking it. Time factors alone can't show
this at small scale (job floors dominate); shuffle bytes can.

Usage: PYTHONPATH=/root/repo python scripts/shuffle_growth_audit.py
(solo box; generates the sf1 corpus under /tmp/sf1_stress on first
use, same generator as scripts/stress_sf1.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from stress_sf1 import SF1, _generate, _shuffle_bytes  # noqa: E402


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from bench import HEADLINE

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="shuffle-growth-audit")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    rows = []
    for name in HEADLINE:
        row = {"query": name}
        for label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"),
                              ("sf1", SF1)]:
            best, best_shuf = float("inf"), 0
            for i in range(2):
                group = f"sga:{name}:{label}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t1 = time.perf_counter()
                QUERIES[name][0](spark, sf_dir).count()
                dt = time.perf_counter() - t1
                spark.sparkContext.setJobGroup("", "")
                if dt < best:
                    best, best_shuf = dt, _shuffle_bytes(spark, group)
            row[label] = round(best, 2)
            row[f"{label}_mb"] = round(best_shuf / 1e6, 2)
        row["time_x"] = round(row["sf1"] / row["sf0.1"], 2)
        row["shuffle_x"] = (
            round(row["sf1_mb"] / row["sf0.1_mb"], 1)
            if row["sf0.1_mb"] > 0.005
            else None  # exchange-free at sf0.1
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -(r["shuffle_x"] or 0))
    print("\n== ranked by shuffle growth (10x data) ==")
    for r in rows:
        flag = " <== SUPERLINEAR" if (r["shuffle_x"] or 0) > 15 else ""
        print(
            f"{r['query']:30s} shuffle {r['sf0.1_mb']:8.2f} -> "
            f"{r['sf1_mb']:9.2f} MB  x{r['shuffle_x']}  "
            f"time x{r['time_x']}{flag}"
        )
    print(json.dumps({"shuffle_growth_audit": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
