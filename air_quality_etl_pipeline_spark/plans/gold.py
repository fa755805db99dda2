"""Gold-layer star-schema builders: surrogate keys and star joins.

Re-expresses the reference's Silver→Gold notebooks
(``Notebooks/Batch_Silver_to_Gold.Notebook/notebook-content.py:86-246``,
``Automated_Silver_to_Gold:84-227``): dimension tables get dense integer
surrogate keys via a global ``row_number`` window (W1/W2), and the fact
is the big table left-joined to every dimension (J1-J7) — a classic
star join.

Scale notes
-----------
* ``surrogate_key`` with ``Window.orderBy`` and no partition collapses
  to ONE partition — fine for dimension tables (≤ a few million rows),
  wrong for facts. For big tables use :func:`dense_id`, which stays
  fully parallel (per-partition offsets computed from partition counts,
  the ``zipWithIndex`` trick expressed in DataFrame ops).
* ``star_join`` broadcasts every dimension explicitly; a fact⨝dims star
  then needs NO shuffle of the fact at all — each fact partition joins
  against in-memory dim hash maps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key(
    df: DataFrame,
    order_by: Sequence[str | Column],
    key_name: str,
    offset: int = 0,
) -> DataFrame:
    """W1/W2 — dense 1-based surrogate key by total order, optionally
    offset past an existing high-water mark (incremental re-key,
    reference ``Automated_Silver_to_Gold:286-287``).

    Single-partition window: reserve for dimension-sized inputs.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.orderBy(*cols)
    key = F.row_number().over(w).cast("long")
    if offset:
        key = key + F.lit(offset)
    return df.withColumn(key_name, key)


def surrogate_key_ranked(
    df: DataFrame,
    key: Column,
    order_by: Sequence[Column],
    key_name: str,
    offset: int = 0,
) -> DataFrame:
    """W1 at scale: the same order-following dense key as
    :func:`surrogate_key`, built with the bucketed two-phase global
    rank (:func:`~..operators.order_stats.with_global_rank`) instead of
    a single-partition window — for dimensions that scale with the
    data (e.g. a part/product catalog at 100 TB fact scale). *key*
    must be numeric and monotone in *order_by* (the natural key column
    itself, usually)."""
    from air_quality_etl_pipeline_spark.operators.order_stats import (
        with_global_rank,
    )

    out = with_global_rank(df, key, order_by, key_name)
    if offset:
        out = out.withColumn(
            key_name, (F.col(key_name) + F.lit(offset)).cast("long")
        )
    return out


def dense_id(df: DataFrame, key_name: str) -> DataFrame:
    """Scale-path surrogate key: unique, dense, parallel — no global sort.

    ``zipWithIndex`` semantics in DataFrame form: number rows within
    each partition, then add per-partition offsets (computed from a tiny
    collected map of partition counts). Order is partition-order, i.e.
    stable for a given layout but not a semantic total order — use
    :func:`surrogate_key` when key order must follow a column.
    """
    with_pid = df.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    offset_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    return (
        with_pid.withColumn(
            key_name, (F.row_number().over(w) + offset_col).cast("long")
        )
        .drop("__pid")
    )


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str] | Column, str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1-J7/J10 — left-join the fact to each ``(dim, on, how)``.

    Dimensions are broadcast (reference dims are ≤ thousands of rows;
    even at 100 TB fact scale the dims stay MBs) so the fact never
    shuffles: BroadcastHashJoin per dim, all inside one stage.
    """
    out = fact
    for dim, on, how in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=on, how=how)
    return out
