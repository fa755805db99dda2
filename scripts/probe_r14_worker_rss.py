"""Round-14 long-session worker-RSS trace (VERDICT r13 item 6).

Round 13 observed the Arrow mapInPandas multimodal trio degrade up to
35x late in a 15-query session (image_decode_channel_stats 0.78 s
isolated -> 28.4 s) and shipped a 16g driver heap as a PLAUSIBLE
mitigation. This probe produces the missing receipt: drive 20+ heavy
queries in one session, then the multimodal trio, sampling after every
query:

- driver JVM heap used/committed (Runtime via py4j)
- total GC time (sum over java.lang.management GC beans)
- Python worker count and summed RSS (pyspark.daemon process tree)
- the query's wall time

Usage: SPARK_DRIVER_MEMORY=16g python scripts/probe_r14_worker_rss.py
(re-run with 8g to compare).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

WARM_QUERIES = [
    "silver_filter_dedup", "gold_star_fact", "cube_measures",
    "star_join_wide", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_clusters", "dedup_ngram_jaccard", "semantic_dedup",
    "pack_sequences", "decontaminate_eval", "pq_adc_search",
    "bigram_logprob_score", "trigram_backoff_score", "copurchase_pairs",
    "dedup_canonical_docs", "ivf_pq_search", "hybrid_rrf_search",
    "psi_value_drift", "abc_pareto_classes", "padding_waste_report",
]
TRIO = [
    "image_decode_channel_stats",
    "audio_decode_stats",
    "video_frame_stats",
]


def _workers_rss() -> tuple[int, int]:
    """(n_python_workers, total_rss_kb) for pyspark daemon/worker
    processes of this session's JVM (any python process whose cmdline
    mentions pyspark.daemon or pyspark.worker)."""
    out = subprocess.run(
        ["ps", "-eo", "pid,rss,cmd"], capture_output=True, text=True
    ).stdout
    n = rss = 0
    me = str(os.getpid())
    for line in out.splitlines():
        if "pyspark.daemon" in line or "pyspark.worker" in line:
            parts = line.split(None, 2)
            if parts[0] == me:
                continue
            n += 1
            rss += int(parts[1])
    return n, rss


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES, prepared

    spark = get_spark(app_name="probe_r14_worker_rss")
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()

    def gc_ms() -> int:
        total = 0
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            total += beans.get(i).getCollectionTime()
        return total

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def sample(label: str, wall: float) -> None:
        used = (rt.totalMemory() - rt.freeMemory()) // (1 << 20)
        committed = rt.totalMemory() // (1 << 20)
        n, rss = _workers_rss()
        print(
            f"{label:34s} wall={wall:7.3f}s heap={used:5d}/{committed:5d}MB "
            f"gc={gc_ms():6d}ms pyworkers={n:3d} rss={rss // 1024:5d}MB",
            flush=True,
        )

    heap_max = rt.maxMemory() // (1 << 20)
    print(f"driver max heap: {heap_max} MB")

    # isolated trio first (fresh-session baseline)
    for name in TRIO:
        df = prepared(spark, sf, name)
        noop(df)  # codegen warm
        t0 = time.perf_counter()
        noop(df)
        sample(f"isolated {name}", time.perf_counter() - t0)

    # drive the long session
    for i, name in enumerate(WARM_QUERIES):
        t0 = time.perf_counter()
        noop(prepared(spark, sf, name))
        sample(f"[{i:02d}] {name}", time.perf_counter() - t0)

    # the trio late in the session, three samples each
    for rnd in range(3):
        for name in TRIO:
            t0 = time.perf_counter()
            noop(prepared(spark, sf, name))
            sample(f"late{rnd} {name}", time.perf_counter() - t0)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
