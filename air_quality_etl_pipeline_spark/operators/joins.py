"""Temporal join operators: backward as-of join and banded interval
join — the two joins event/feature pipelines need that vanilla SQL
equi-joins don't give you.

Both are built to survive 100 TB:

* The as-of join is the union+window formulation (tag both sides, sort
  by (key, ts, side), carry the last-seen right payload forward with
  ``last(..., ignorenulls)``): ONE shuffle on the key, no per-row
  subquery, no range-condition nested-loop join. This is how kdb-style
  ``aj`` is expressed relationally; a LATERAL/correlated formulation is
  quadratic and driver-hostile at scale.
* The interval join buckets time into fixed bands equal to the window
  width, explodes each probe row to the (at most 2) bands its window
  overlaps, and equi-joins on (key, band) before applying the exact
  range predicate — turning an inequality join Catalyst would plan as
  BroadcastNestedLoop into a hash join with bounded fanout (the Flink
  interval-join / DBToaster band-join trick).

No reference counterpart (the reference has no temporal-join surface);
cited as training-data-pipeline extensions in COVERAGE.md.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach *payload_cols*
    of the LATEST right row with ``right_ts <= left_ts`` in the same
    *on* group (NULLs when no right row precedes).

    Ties on ``right_ts`` resolve to the greatest *tiebreak* value so the
    result is deterministic regardless of partitioning. Output columns:
    every left column, then ``{prefix}{c}`` for each payload column and
    ``{prefix}{right_ts}`` (the matched row's timestamp).
    """
    keys = list(on)
    if tiebreak is not None:
        from pyspark.sql import types as T

        dt = right.schema[tiebreak].dataType
        if not isinstance(
            dt,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType, T.DecimalType),
        ):
            # a string tiebreak would compare lexicographically ("10"
            # < "9") and silently change the equal-ts resolution
            raise ValueError(
                f"asof_join tiebreak column {tiebreak!r} must be "
                f"numeric, got {dt.simpleString()}"
            )
    pay_inner = [F.col(c).alias(c) for c in payload_cols] + [
        F.col(right_ts).alias(right_ts)
    ]
    # the window orders by the NATIVELY-typed tiebreak — casting to
    # long would truncate fractional tiebreaks (1.2 vs 1.9 → equal)
    # and re-introduce partition-order-dependent equal-ts resolution
    r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        (
            F.col(tiebreak) if tiebreak else F.lit(0).cast("long")
        ).alias("_tb"),
        F.struct(*pay_inner).alias("_pay"),
    )
    left_row = F.struct(*[F.col(c) for c in left.columns]).alias("_row")
    l = left.select(
        *keys,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        # left rows never compete on _tb (_side separates them at
        # equal ts); a typed NULL just satisfies the union schema
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        left_row,
    )
    r = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType))
    u = l.unionByName(r)
    # Right rows (_side=0) sort before left rows at equal ts => "<=";
    # among equal right ts the LAST in _tb order (the max) wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    out_cols.append(F.col(f"_m.{right_ts}").alias(f"{prefix}{right_ts}"))
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Pairs ``(l, r)`` with ``l.ts + lower < r.ts <= l.ts + upper`` in
    the same *on* group (timestamps are integers — epoch micros — so
    band math is exact).

    The probe side explodes to the distinct time bands its window
    overlaps (band width = window length ⇒ at most 2), then equi-joins
    on (keys, band): bounded fanout, one hash-join shuffle, and the
    exact range predicate filters inside the joined stage. Left/right
    column names must be disjoint apart from *on*.
    """
    if upper <= lower:
        raise ValueError("interval_join needs upper > lower")
    clash = sorted(
        (set(left.columns) & set(right.columns)) - set(on)
    )
    if clash:
        raise ValueError(
            "interval_join: left/right column names must be disjoint "
            f"apart from the join keys; both sides carry {clash} — "
            "the output would hold ambiguous duplicate columns"
        )
    width = upper - lower
    lo_band = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    hi_band = F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(width))
    # String aliases keep the join unambiguous even when both sides
    # derive from the same scan (the common self-join case).
    probe = left.withColumn(
        "_band", F.explode(F.array_distinct(F.array(lo_band, hi_band)))
    ).alias("_l")
    build = right.withColumn(
        "_band", F.floor(F.col(right_ts) / F.lit(width))
    ).alias("_r")
    cond = [F.col(f"_l.{k}") == F.col(f"_r.{k}") for k in on] + [
        F.col("_l._band") == F.col("_r._band"),
        F.col(f"_r.{right_ts}") > F.col(f"_l.{left_ts}") + F.lit(lower),
        F.col(f"_r.{right_ts}") <= F.col(f"_l.{left_ts}") + F.lit(upper),
    ]
    joined = probe.join(build, cond, "inner")
    keep = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_r.{c}").alias(c) for c in right.columns if c not in on
    ]
    return joined.select(*keep)


def count_in_window(
    probe: DataFrame,
    events: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    event_ts: str,
    value_col: Column,
    window_us: int,
    probe_id: Sequence[str],
) -> DataFrame:
    """Per probe row: count and exact decimal sum of *events* rows in
    ``(probe_ts, probe_ts + window_us]`` — aggregate after the banded
    join, then left-join back so zero-match probes keep (0, 0.0)."""
    pairs = interval_join(
        probe, events, on, probe_ts, event_ts, 0, window_us
    )
    agg = pairs.groupBy(*probe_id).agg(
        F.count("*").alias("_n"),
        F.sum(value_col.cast("decimal(18,2)")).alias("_s"),
    )
    out = probe.join(agg, list(probe_id), "left")
    return out.select(
        *probe.columns,
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_follow"),
        F.coalesce(F.col("_s").cast("double"), F.lit(0.0)).alias(
            "sum_follow"
        ),
    )
