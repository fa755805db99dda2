"""Per-query execution-shape audit (round 13): for each named query,
run the prepared plan's noop action warm and report #jobs, #stages,
total task wall (summed across tasks), and elapsed wall — separating
genuine compute from serial stage-scheduling latency (guide §1.1:
decide whether time goes to compute or scheduling before optimizing).

Usage: python scripts/r13_stage_audit.py name1 name2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    names = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES, prepared

    spark = get_spark(app_name="r13_stage_audit")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm at sf0.001 then once at target
    for n in names:
        noop(QUERIES[n][0](spark, "/root/testdata/sf0.001"))
        noop(prepared(spark, sf, n))

    tracker = sc.statusTracker()

    for n in names:
        before_jobs = set(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        noop(prepared(spark, sf, n))
        wall = time.perf_counter() - t0
        after_jobs = set(tracker.getJobIdsForGroup() or [])
        new_jobs = sorted(after_jobs - before_jobs)
        n_stages = 0
        task_ms = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None or si.numCompletedTasks == 0:
                    continue
                n_stages += 1
                n_tasks += si.numCompletedTasks
        print(
            f"{n:32s} wall={wall:6.3f}s jobs={len(new_jobs):3d} "
            f"stages={n_stages:3d} tasks={n_tasks:4d}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
