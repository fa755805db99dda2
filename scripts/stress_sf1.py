"""sf1 scale-stress bench (round-5 verdict #5): run the most expensive
headline queries at 10× the per-round bench scale (6M-row lineitem)
and record per-query wall time and shuffle volume.

Data: /tmp/sf1_stress parquet, generated once by replicating the
sf0.1 fact tables 10× with key offsets (orderkeys stay FK-consistent
between lineitem and orders; doc/vec/event ids offset per replica;
dimension tables copied as-is — so joins fan out 10× per dim key,
which is the stress we want). Text and embeddings replicate verbatim:
every document gains 9 exact clones, which multiplies the dedup pair
graphs — deliberately, that is the hardest realistic shape for the
LSH/connected-components path.

Usage: PYTHONPATH=/root/repo python scripts/stress_sf1.py
Prints one line per query: name, best-of-3 seconds, shuffle write MB
(sum over the best run's jobs), then a JSON summary line.
"""

from __future__ import annotations

import json
import os
import time

SF1 = "/tmp/sf1_stress"
REPLICAS = 10

#: the most expensive queries from BENCH_r05 (plus both
#: connected-components queries so the pair-graph path is covered)
QUERIES_SF1 = [
    "padding_waste_report",
    "boilerplate_gram_coverage",
    "psi_value_drift",
    "copurchase_pairs",
    "repeat_purchase_interval",
    "abc_pareto_classes",
    "peak_concurrent_sessions",
    "id_gap_audit",
    "ivf_pq_search",
    "pq_adc_search",
    "dedup_clusters",
    "dedup_canonical_docs",
    "dedup_ngram_jaccard",
    "trigram_backoff_score",
    # round-6 continuation: the new order-stats consumers (three rank
    # passes / exclusive prefix max) and the bitmap distinct, whose
    # scale claims SCALE.md makes explicitly
    "rfm_segments",
    "record_breaking_orders",
    "skyline_running_max",
    "bitmap_distinct_rollup",
    "item_item_cosine",
    "rolling_hll_distinct_7d",
    "mmr_diversified_rerank",
]


def _generate(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(SF1, "_DONE")):
        return
    os.makedirs(SF1, exist_ok=True)
    src = "/root/testdata/sf0.1"
    for t in ["region", "nation", "customer", "supplier", "part"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{t}.parquet")

    def rep(table: str, offsets: dict[str, int]):
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = []
        for i in range(REPLICAS):
            d = base
            for col, step in offsets.items():
                d = d.withColumn(
                    col, (F.col(col) + F.lit(i * step)).cast("bigint")
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1}/{table}.parquet"
        )

    omax = (
        spark.read.parquet(f"{src}/orders.parquet")
        .agg(F.max("o_orderkey"))
        .first()[0]
    )
    # step is max+1: base keys span [0, omax] INCLUSIVE, so an omax
    # step makes replica i's key omax collide with replica i+1's key 0
    # (9 duplicate orderkeys — caught by merge_full_sync's Delta-parity
    # multiple-match probe in the round-7 sf1 oracle sweep)
    rep("orders", {"o_orderkey": omax + 1})
    rep("lineitem", {"l_orderkey": omax + 1})
    rep("events", {"event_id": 10_000_000})
    rep("documents", {"doc_id": 1_000_000})
    rep("embeddings", {"vec_id": 1_000_000})
    with open(os.path.join(SF1, "_DONE"), "w") as f:
        f.write("ok")


def _shuffle_bytes(spark, group: str) -> int:
    """Sum of task shuffle-write bytes across all jobs in *group*, via
    the UI-less AppStatusStore (same py4j path as
    tests/test_scale_stress.py)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    total = 0
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            try:
                it = store.taskList(sid, 0, 1_000_000).iterator()
            except Exception:
                continue
            while it.hasNext():
                t = it.next()
                m = t.taskMetrics()
                tm = m.get() if hasattr(m, "get") else m
                if tm is None:
                    continue
                try:
                    total += int(tm.shuffleWriteMetrics().bytesWritten())
                except Exception:
                    pass
    return total


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    spark = get_spark(app_name="stress-sf1")
    t0 = time.perf_counter()
    _generate(spark)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    # warm codegen at sf0.001
    for name in QUERIES_SF1:
        QUERIES[name][0](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    results = {}
    for name in QUERIES_SF1:
        best, best_shuf = float("inf"), 0
        for i in range(3):
            group = f"sf1:{name}:{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name][0](spark, SF1).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup("", "")
            if dt < best:
                best, best_shuf = dt, _shuffle_bytes(spark, group)
        results[name] = {
            "sec": round(best, 2),
            "shuffle_mb": round(best_shuf / 1e6, 1),
        }
        print(
            f"{name}: {best:.2f}s shuffle={best_shuf/1e6:.1f}MB",
            flush=True,
        )
    total = round(sum(r["sec"] for r in results.values()), 2)
    print(json.dumps({"sf1_total_sec": total, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
