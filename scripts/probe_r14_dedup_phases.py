"""Round-14 phase split for the dedup REBUILD family.

For dedup_clusters / dedup_canonical_docs, separate per sample:
  build   — Python-side query construction (py4j + analysis; includes
            the sym.count() probe job the operator runs at build time)
  action  — the noop sink execution of the returned DataFrame

and show the warm-cache subsidy: samples WITHOUT clearing the
CacheManager between rebuilds re-match the previous sample's
internal persists (plan-equality), so build's count() and the vote
pass are served from cache. `--cold` clears the cache before every
sample (the honest number the bench should report — VERDICT r13 §1).

Usage: python scripts/probe_r14_dedup_phases.py [--cold] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    cold = "--cold" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "dedup_clusters",
        "dedup_canonical_docs",
    ]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="probe_r14_dedup_phases")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup at the smallest SF
    for n in names:
        noop(QUERIES[n][0](spark, "/root/testdata/sf0.001"))

    for n in names:
        for s in range(3):
            if cold:
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[n][0](spark, sf)
            t1 = time.perf_counter()
            noop(df)
            t2 = time.perf_counter()
            print(
                f"{n} sample {s} ({'cold' if cold else 'warm'}): "
                f"build={t1 - t0:6.3f}s action={t2 - t1:6.3f}s "
                f"total={t2 - t0:6.3f}s"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
