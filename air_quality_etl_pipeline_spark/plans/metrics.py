"""Metrics layer — the reference's DAX measure library as Spark plans.

The reference's real query workload is ~25 DAX measures on the star
schema (``AQI.SemanticModel/definition/tables/fact_daily_air_quality.tmdl``
and siblings): filtered counts, distinct counts, top-N/argmax with
tiebreaks, ranking, MoM/YoY/YTD time intelligence, safe division,
per-capita normalization and share-of-total. Each measure here is a
function ``(df, group_cols, ...) -> DataFrame`` — "filter context" is the
caller's predicate + grouping grain, ``REMOVEFILTERS`` totals become
window aggregates over a coarser partition.

Everything is built-in aggregates + window functions: partial (map-side)
aggregation, AQE shuffle sizing, and whole-stage codegen all apply. The
only global windows are over *already-aggregated* group-level frames
(e.g. one row per state/month), never over raw facts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.core import safe_div


def _grouped(df: DataFrame, group_cols: Sequence[str]):
    return df.groupBy(*[F.col(c) for c in group_cols])


def avg_measure(
    df: DataFrame, value: str, group_cols: Sequence[str], alias: str = "avg_value"
) -> DataFrame:
    """A4 — ``AVERAGE(fact[aqi])`` at an arbitrary grain."""
    return _grouped(df, group_cols).agg(F.avg(value).alias(alias))


def filtered_count(
    df: DataFrame, pred: Column, group_cols: Sequence[str], alias: str = "n"
) -> DataFrame:
    """A5 — ``COUNTROWS(FILTER(fact, pred))`` as a conditional count;
    one pass, no pre-filter join."""
    return _grouped(df, group_cols).agg(
        F.count(F.when(pred, F.lit(1))).alias(alias)
    )


def filtered_distinct_count(
    df: DataFrame,
    value: str,
    pred: Column,
    group_cols: Sequence[str],
    alias: str = "n_distinct",
) -> DataFrame:
    """A6 — ``DISTINCTCOUNT(col)`` under a predicate."""
    return _grouped(df, group_cols).agg(
        F.countDistinct(F.when(pred, F.col(value))).alias(alias)
    )


def top_n_by_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_expr: Column,
    agg_alias: str,
    n: int = 1,
    partition_cols: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """A8/W4/O3 — ``TOPN(n, SUMMARIZE(...), agg DESC, tiebreak ASC)``.

    Aggregate per group, then keep the top-*n* groups per partition via
    ``row_number`` over the aggregated (small) frame.
    """
    aggd = _grouped(df, [*partition_cols, *group_cols]).agg(agg_expr.alias(agg_alias))
    order = [F.col(agg_alias).desc()] + [F.col(t).asc() for t in tiebreak]
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(*order)
        if partition_cols
        else Window.orderBy(*order)
    )
    return (
        aggd.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def argmax_with_ties(
    df: DataFrame,
    group_col: str,
    agg_expr: Column,
    agg_alias: str,
    list_alias: str = "tied_groups",
) -> DataFrame:
    """A9 — the "Worst State" measure: per-group aggregate, keep ALL
    groups tied at the max, and render them as a sorted comma list
    (DAX ``CONCATENATEX`` of the ``TOPN`` ties)."""
    aggd = df.groupBy(group_col).agg(agg_expr.alias(agg_alias))
    w = Window.orderBy(F.col(agg_alias).desc())
    best = aggd.withColumn("__rk", F.dense_rank().over(w)).filter(F.col("__rk") == 1)
    return best.groupBy(agg_alias).agg(
        F.concat_ws(", ", F.sort_array(F.collect_list(group_col))).alias(list_alias)
    )


def rank_groups(
    df: DataFrame,
    group_col: str,
    agg_expr: Column,
    agg_alias: str,
    ascending: bool = True,
    rank_alias: str = "rank",
) -> DataFrame:
    """W3 — ``RANKX(ALL(dim), measure,, ASC, DENSE)``: dense rank of the
    per-group aggregate across all groups."""
    aggd = df.groupBy(group_col).agg(agg_expr.alias(agg_alias))
    order = F.col(agg_alias).asc() if ascending else F.col(agg_alias).desc()
    return aggd.withColumn(
        rank_alias, F.dense_rank().over(Window.orderBy(order))
    )


def period_over_period(
    df: DataFrame,
    time_cols: Sequence[str],
    value_expr: Column,
    value_alias: str,
    lag_periods: int = 1,
    partition_cols: Sequence[str] = (),
    pct_alias: str = "change_pct",
) -> DataFrame:
    """W5/A10 — MoM/YoY: aggregate per period, ``lag`` over the ordered
    period frame, safe-divide the delta.

    MoM = lag 1 over (year, month); YoY on a monthly frame = lag 12.
    Reference returns NULL (BLANK) when there is no prior period
    (``fact_daily_air_quality.tmdl:225-233``).
    """
    aggd = _grouped(df, [*partition_cols, *time_cols]).agg(value_expr.alias(value_alias))
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        *[F.col(c) for c in time_cols]
    )
    prev = F.lag(F.col(value_alias), lag_periods).over(w)
    return aggd.withColumn("prev_" + value_alias, prev).withColumn(
        pct_alias, safe_div(F.col(value_alias) - prev, prev)
    )


def cumulative_to_date(
    df: DataFrame,
    time_cols: Sequence[str],
    value_expr: Column,
    value_alias: str,
    partition_cols: Sequence[str] = (),
    cum_alias: str = "ytd",
) -> DataFrame:
    """W6 — ``DATESYTD``: running total over the period frame within each
    partition (year for YTD)."""
    aggd = _grouped(df, [*partition_cols, *time_cols]).agg(value_expr.alias(value_alias))
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(*[F.col(c) for c in time_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return aggd.withColumn(cum_alias, F.sum(value_alias).over(w))


def per_100k(
    counts: DataFrame,
    population: DataFrame,
    on: Sequence[str],
    count_col: str,
    pop_col: str,
    alias: str = "per_100k",
) -> DataFrame:
    """A11 — per-capita normalization: join the (small, broadcast)
    population dim and scale count/pop × 100 000."""
    joined = counts.join(F.broadcast(population), on=list(on), how="left")
    return joined.withColumn(
        alias, safe_div(F.col(count_col) * F.lit(100000.0), F.col(pop_col))
    )


def share_of_total(
    df: DataFrame,
    group_cols: Sequence[str],
    value_expr: Column,
    value_alias: str,
    share_alias: str = "share",
    remove_filters_on: Sequence[str] = (),
) -> DataFrame:
    """A12 — score and %-of-total: the DAX ``REMOVEFILTERS`` total is a
    window SUM over the partition that *keeps* every column except the
    removed ones."""
    aggd = _grouped(df, group_cols).agg(value_expr.alias(value_alias))
    keep = [c for c in group_cols if c not in set(remove_filters_on)]
    w = Window.partitionBy(*[F.col(c) for c in keep])
    return aggd.withColumn(
        share_alias, safe_div(F.col(value_alias), F.sum(value_alias).over(w))
    )
