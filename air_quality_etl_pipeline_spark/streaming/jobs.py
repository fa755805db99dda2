"""Structured Streaming jobs over the events stream.

The reference has no true streaming (§2.8) — its "automated" path is a
weekly-scheduled incremental batch. This module is the Structured
Streaming expression of that same pipeline: the identical tumbling
1-day window aggregate runs under ``readStream`` with a watermark, so
moving from scheduled batch to continuous processing is a source swap,
not a rewrite.

Design notes for scale:

* File source + ``availableNow`` trigger = incremental batch with
  exactly-once file tracking — the streaming-native replacement for the
  reference's date-window re-ingest.
* The watermark bounds state: aggregates for windows older than the
  watermark are finalized and evicted, so state size is O(active
  windows), not O(history).
* ``foreachBatch`` is the hook where the merge-upsert sink
  (plans.merge) plugs in for idempotent gold-table maintenance.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Declared source schema — events.parquet stores TIMESTAMP(NANOS),
#: which Spark reads as LONG under the legacy nanosAsLong conf.
EVENTS_NANOS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)

_sink_ids = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. Nanos handling matches
    the batch reader: integer DIV 1000 → timestamp_micros (float
    division would corrupt 1.7e18-scale values past double's 2^53)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def daily_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day window per event_type: count + exact decimal sum.
    Same operator tree as the batch twin (workload.events_daily_window);
    the watermark makes it safe for late data under append sinks."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(result: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a streaming aggregate over everything currently in the
    source and return the final result as a batch DataFrame.

    ``availableNow`` processes all existing files then stops — the
    streaming-native incremental batch. Complete output mode to a named
    memory sink; unique sink names keep repeated calls independent
    within one session."""
    name = f"stream_sink_{next(_sink_ids)}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
