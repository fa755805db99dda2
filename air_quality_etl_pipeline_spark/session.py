"""SparkSession factory.

The reference runs on a managed Fabric Spark pool (Small_env, Spark 3.5,
one 4-core/28 GB executor — see ``Small_env.Environment/Setting/
Sparkcompute.yml:1-10`` in the reference). Here we build the session
ourselves and turn on the knobs the reference leaves to Fabric:

- AQE (runtime join-strategy + shuffle-partition coalescing + skew split)
- dynamic partition overwrite (reference: ``automated_ingestion`` K2)
- Arrow for any pandas interchange
- UTC session timezone so date-part extraction is engine-independent
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized by the rule "a shuffle partition should hold tens of MB": the
# test rig shuffles ≲100 MB (sf0.1), so single-digit counts — measured
# 25-30% faster end-to-end than 32 (task-launch overhead dominates tiny
# stages). The SAME rule at 100 TB gives thousands of partitions: set
# SPARK_GRAFT_SHUFFLE_PARTITIONS (or pass shuffle_partitions) on a real
# cluster; AQE coalescing/skew-split adjusts at runtime either way.
DEFAULT_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
)


def get_spark(
    app_name: str = "air_quality_etl_pipeline_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    On the test rig this is ``local[$SPARK_GRAFT_CPUS]``; on a real
    cluster the master comes from the environment and the same confs
    apply unchanged.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # cached plans keep AQE-coalesced partitioning: without this a
        # .persist() materialized at high shuffle-partition counts pins
        # those partitions on every downstream stage (measured: simhash's
        # cached fingerprint frame at 200 partitions ran its band join
        # 10x slower than at 8 — coalescing recovered ~3.5x of that)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Whole-stage-codegen class cache (default 100 entries, JVM-wide,
        # LRU): this engine's registry runs hundreds of distinct codegen
        # units per session, so at the default every re-execution of a
        # plan recompiles its Janino classes after eviction — measured
        # r13 (9-query subset, warm best-of-3): trigram_backoff_score
        # 3.59→2.99 s, semantic_dedup 2.26→1.50 s, cdc_apply_scd2
        # 0.58→0.47 s with the cache raised. Sized to hold the whole
        # workload's generated classes (tens of MB of metaspace); not a
        # data-scale-dependent knob — a production cluster running this
        # many distinct operators wants the same headroom.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode hosts driver + all executor threads + every cached
        # block in ONE JVM (guide §5); long multi-query sessions (the
        # bench keeps ~54 prepared plans and their caller-owned persists
        # alive by design) showed late-session slowdowns consistent with
        # GC pressure at 8g in r13 probes. The 16g DEFAULT assumes this
        # rig's 128 GiB box (r13 advisor note): on smaller hosts set
        # SPARK_DRIVER_MEMORY explicitly (e.g. "4g") — the default is
        # only a default, and nothing below depends on its exact value.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply this engine's runtime-settable confs to an externally
    provided session (the driver harness passes us its own).

    Only runtime-mutable confs here — static ones (memory, master)
    cannot change post-start.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    return spark
