"""Probe: time the order-stats query family at sf0.1, best-of-3,
after warmup — isolates the round-5 lazy-formulation regression."""

import time

FAMILY = [
    "orders_gini",
    "abc_pareto_classes",
    "psi_value_drift",
    "peak_concurrent_sessions",
    "id_gap_audit",
    "repeat_purchase_interval",
    "padding_waste_report",
]


def main() -> None:
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES, prepared

    spark = get_spark(app_name="probe-order-stats")
    for name in FAMILY:
        QUERIES[name][0](spark, "/root/testdata/sf0.001").count()

    total = 0.0
    for name in FAMILY:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            prepared(spark, "/root/testdata/sf0.1", name).count()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name}: {best:.3f}")
    print(f"TOTAL: {total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
