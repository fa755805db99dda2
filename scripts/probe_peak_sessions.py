"""Round-8 adjudication of the peak_concurrent_sessions +56% (verdict
#3): BENCH_r06 -> r07 moved 0.99 -> 1.54 s in the same round the frame
spec changed ROWS -> RANGE for the duplicate-ts correctness fix
(commit 9c2dd60), so box drift cannot be assumed — the probe must
separate the frame cost from the box.

Three variants sampled ROUND-ROBIN in one session with the anchor:

  anchor    silver_filter_dedup (plan untouched since round 3)
  range     the shipping formulation (RANGE frame sid sum)
  preagg    candidate reformulation: dropDuplicates (user_id, ts)
            BEFORE the window — peers collapse to one row, so the
            ROWS frame is deterministic again and the window input
            shrinks; ivals/sid boundaries are provably identical
            (min/max ts per session don't change under peer dedup)

Usage: python scripts/probe_peak_sessions.py  (solo box)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SAMPLES = 5


def peak_preagg(spark, sf_dir):
    """peak_concurrent_sessions with (user_id, ts) pre-dedup + ROWS
    frames — identical results: duplicate-ts peers carry no extra
    information for session intervals (sid boundaries and min/max ts
    per session are functions of the DISTINCT timestamps)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.order_stats import (
        with_running_sum,
    )
    from air_quality_etl_pipeline_spark.workload import _events

    e = _events(spark, sf_dir).select("user_id", "ts").dropDuplicates(
        ["user_id", "ts"]
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = e.select(
        "user_id",
        "ts",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
            < 1800 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_sess"),
    )
    sess = marked.withColumn("sid", F.sum("new_sess").over(w))
    ivals = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = ivals.select(
        F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        ivals.select(
            (F.col("e") + F.expr("INTERVAL 1 SECOND")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    sweep = with_running_sum(
        deltas,
        F.col("t").cast("double"),
        [F.col("t").asc(), F.col("d").asc()],
        "d",
        "conc",
    )
    best = F.max(
        F.struct(
            F.col("conc"), (-F.unix_micros(F.col("t"))).alias("neg_t")
        )
    ).alias("b")
    return sweep.agg(best).select(
        F.col("b.conc").cast("long").alias("peak_concurrency"),
        F.date_format(
            F.timestamp_micros(-F.col("b.neg_t")), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_peak_at"),
    )


def main() -> None:
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES, prepared

    spark = get_spark(app_name="probe-peak-sessions")
    sf_dir = "/root/testdata/sf0.1"

    variants = {
        "anchor": lambda: prepared(spark, sf_dir, "silver_filter_dedup"),
        "range": lambda: prepared(
            spark, sf_dir, "peak_concurrent_sessions"
        ),
        "preagg": lambda: peak_preagg(spark, sf_dir),
    }
    # results must agree before timing means anything
    want = [
        tuple(r)
        for r in QUERIES["peak_concurrent_sessions"][0](
            spark, sf_dir
        ).collect()
    ]
    got = [tuple(r) for r in peak_preagg(spark, sf_dir).collect()]
    assert sorted(map(str, want)) == sorted(map(str, got)), (want, got)
    print(f"equivalence OK: {want}")

    for fn in variants.values():  # warmup
        fn().count()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(SAMPLES):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().count()
            samples[name].append(time.perf_counter() - t0)
    out = {
        name: {
            "median": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "max": round(max(v), 3),
        }
        for name, v in samples.items()
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
