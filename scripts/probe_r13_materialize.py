"""Round-13 re-probe of the order_stats ``materialize`` default for
the registered analytics consumers (round-6 receipt predates the
codegen-cache fix, which changes re-execution cost). Interleaved
per-sample (build + noop action) with the anchor, materialize toggled
via monkeypatching the operator's default at call time is NOT possible
(call sites pass nothing → default True), so we patch the module
defaults by wrapping the functions.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

NAMES = [
    "orders_gini",
    "abc_pareto_classes",
    "psi_value_drift",
    "peak_concurrent_sessions",
    "id_gap_audit",
]


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES, prepared
    from air_quality_etl_pipeline_spark.operators import order_stats as OS

    spark = get_spark(app_name="probe_materialize")
    sf = "/root/testdata/sf0.1"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    orig_rank, orig_sum = OS.with_global_rank, OS.with_running_sum

    def set_mat(flag: bool):
        def rank(*a, **kw):
            kw["materialize"] = flag
            return orig_rank(*a, **kw)

        def rsum(*a, **kw):
            kw["materialize"] = flag
            return orig_sum(*a, **kw)

        OS.with_global_rank, OS.with_running_sum = rank, rsum
        # workload modules imported the names directly — patch there too
        import air_quality_etl_pipeline_spark.workload_analytics as WA

        for mod in [WA]:
            if hasattr(mod, "with_global_rank"):
                mod.with_global_rank = rank
            if hasattr(mod, "with_running_sum"):
                mod.with_running_sum = rsum

    # warm both shapes
    for n in NAMES:
        noop(QUERIES[n][0](spark, "/root/testdata/sf0.001"))
    set_mat(False)
    for n in NAMES:
        noop(QUERIES[n][0](spark, "/root/testdata/sf0.001"))

    results = {n: {"on": [], "off": []} for n in NAMES}
    anchor = []
    for rnd in range(3):
        t0 = time.perf_counter()
        noop(prepared(spark, sf, "silver_filter_dedup"))
        anchor.append(round(time.perf_counter() - t0, 3))
        for n in NAMES:
            set_mat(True)
            t0 = time.perf_counter()
            noop(QUERIES[n][0](spark, sf))
            results[n]["on"].append(round(time.perf_counter() - t0, 3))
            set_mat(False)
            t0 = time.perf_counter()
            noop(QUERIES[n][0](spark, sf))
            results[n]["off"].append(round(time.perf_counter() - t0, 3))
    print("anchor:", anchor)
    for n in NAMES:
        on, off = results[n]["on"], results[n]["off"]
        print(
            f"{n:28s} materialize=True {on} min={min(on):.3f} | "
            f"False {off} min={min(off):.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
