"""The query workload: every SURVEY §2 operator expressed as a named
query over the driver's testdata tables, each with a DuckDB oracle twin.

Layout: ``QUERIES[name] = (spark_fn, oracle_sql_or_None)`` where
``spark_fn(spark, sf_dir) -> DataFrame``. ``__spark_entry__.py`` exposes
these to the driver harness.

Engine-portability rules used throughout (so order-insensitive value
hashes match across Spark and DuckDB):

* Monetary/metric sums go through ``DECIMAL(18,2)`` — exact, associative,
  order-independent — and are cast to double only at the very end.
* Averages are ``exact_decimal_sum / count`` (single double division),
  never engine-native ``avg`` over doubles (accumulation-order hazard).
* Dates are emitted as ``yyyy-MM-dd`` strings, booleans as 0/1 ints,
  int-typed outputs as BIGINT on both engines.
* Every computed column is aliased identically in both formulations.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.core import round_portable, safe_div
from air_quality_etl_pipeline_spark.operators.buckets import (
    binary_category,
    bucketize,
    flag_threshold,
    map_by_lists,
)
from air_quality_etl_pipeline_spark.operators.cleaning import dedup_first, keep_in, valid_rows
from air_quality_etl_pipeline_spark.operators.dates import with_date_parts
from air_quality_etl_pipeline_spark.plans import metrics
from air_quality_etl_pipeline_spark.plans.gold import star_join, surrogate_key
from air_quality_etl_pipeline_spark.plans.merge import merge_insert_if_absent

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: registry filled at import time: name -> (spark_fn, oracle_sql | None)
QUERIES: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            # a silent overwrite detaches the name from its driver
            # receipts and drops the old query's coverage on the floor
            # (round 8 nearly shipped exactly that: a new
            # 'cdc_apply_latest' shadowing the round-5 one)
            raise ValueError(f"query {name!r} is already registered")
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


#: scan-plan cache: (session, sf_dir, table) -> resolved DataFrame.
#: spark.read.parquet re-lists the directory and re-reads footers for
#: schema on EVERY call (~0.1 s/table on the driver) — a catalog-backed
#: engine resolves a table once; this dict is that catalog. DataFrame
#: plans are immutable, so reuse is safe. Keying on the session object
#: itself (kept alive by the dict) scopes entries to a live session.
#:
#: LIFECYCLE: entries are never evicted, and the session key keeps each
#: SparkSession (and its JVM handle) reachable for the life of the
#: process. That is the right trade for this registry's lifecycles —
#: one session per pytest run / bench run / driver gate, O(10 tables ×
#: 3 sf dirs) entries of lightweight plan objects. If this registry
#: ever backs a long-lived multi-tenant service that cycles sessions,
#: switch the session key to a weakref (``weakref.WeakValueDictionary``
#: keyed per-session, or evict on ``SparkSession.stop``) so stopped
#: sessions and their cached plans can be collected.
_SCAN_CACHE: dict[tuple, DataFrame] = {}


#: don't bother spreading scans of inputs below this size — the
#: round-robin exchange would cost a stage for dimension tables whose
#: downstream use is a broadcast anyway
_SPREAD_MIN_BYTES = 100_000

#: spread only PAYLOAD-HEAVY tables (stored bytes/row): wide text
#: payloads mean heavy per-row scan compute (tokenize, regex, md5)
#: where serial scanning starves 31 cores — documents ≈119 B/row vs
#: narrow relational rows (lineitem 18 B, orders 18 B, events 20 B)
#: whose trivial per-row work makes the added round-robin exchange
#: cost MORE than the serial scan (measured: +0.1–0.3 s per query
#: across the relational headline when spread unconditionally)
_SPREAD_MIN_BYTES_PER_ROW = 64


def _spread_small_scan(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Normalize scan parallelism for SMALL inputs: every driver
    parquet table is a single file with ONE row group, so Spark scans
    it as one task and every scan-stage expression (tokenize, explode,
    regex, md5, decode) runs on one core of 32 — a plan no real
    cluster would produce, since at 100 TB a table spans thousands of
    row groups and the scan parallelizes naturally. When the scan has
    fewer partitions than cores AND the input is small enough that
    redistributing it is free (≤ a few MB here), insert one
    round-robin repartition so downstream per-row work uses the
    machine; at scale the condition is false and this is a no-op.
    Filters/pruning still reach the scan (Catalyst pushes both
    through Repartition). Gated on stored bytes/row
    (``_SPREAD_MIN_BYTES_PER_ROW``): only payload-heavy tables
    (text/vectors) benefit; for narrow relational rows the exchange
    costs more than the serial scan saves (both directions measured —
    SCALE.md round 10). decontaminate_eval 2.77→0.56 s at sf0.1."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return df
    if size < _SPREAD_MIN_BYTES:
        return df
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return df
    if rows <= 0 or size / rows < _SPREAD_MIN_BYTES_PER_ROW:
        return df
    # string payload required: the serial-scan bottleneck class is
    # per-row STRING compute. Fixed-width numeric/array tables (e.g.
    # the 2000-row embeddings table, 400 B/row) measured a NET LOSS
    # when spread — their vector math streams fine from one scan task
    # and the pq/ivf builders pay an extra stage per rebuilt job
    # (family total 4.03→4.83 s with embeddings spread; SCALE.md r10)
    from pyspark.sql.types import StringType

    if not any(
        isinstance(f.dataType, StringType) for f in df.schema.fields
    ):
        return df
    dp = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < dp:
        df = df.repartition(dp)
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark, sf_dir, name)
    df = _SCAN_CACHE.get(key)
    if df is None:
        path = f"{sf_dir}/{name}.parquet"
        df = _spread_small_scan(spark, spark.read.parquet(path), path)
        _SCAN_CACHE[key] = df
    return df


#: prepared-statement cache: (session, sf_dir, query name) -> the fully
#: built DataFrame. Building a plan costs 0.4-1.6 s of py4j round-trips
#: on this rig while executing it costs 40-200 ms at sf0.1 — a real
#: engine parses/plans a repeated query once (prepared statements, plan
#: caches in Presto/Trino and Spark's own IR caching for SQL strings).
#: Only valid for side-effect-free queries: the cached object re-executes
#: the read path on every action but never re-runs Python-side writes.
_PLAN_CACHE: dict[tuple, DataFrame] = {}

#: Queries whose BUILDER performs the work the query represents (sink
#: round-trip writes, REST ingest, DAG execution, streaming
#: run-to-completion): their returned DataFrame is only a read-back of
#: an already-materialized result, so a cached plan re-times the
#: read-back, not the operator. ``prepared`` rebuilds these per call;
#: populated here and extended by the workload_* modules at import.
SIDE_EFFECT_QUERIES: set[str] = set()


def prepared(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The resolved DataFrame for a registered pure query, built once
    per (session, sf_dir) — re-running an action on it re-executes the
    plan against current data, exactly like a prepared statement.
    Queries in :data:`SIDE_EFFECT_QUERIES` are rebuilt on every call so
    each sample repeats the builder-time work they represent."""
    if name in SIDE_EFFECT_QUERIES:
        return QUERIES[name][0](spark, sf_dir)
    key = (spark, sf_dir, name)
    df = _PLAN_CACHE.get(key)
    if df is None:
        df = QUERIES[name][0](spark, sf_dir)
        _PLAN_CACHE[key] = df
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table loader, robust to the physical ``ts`` encoding.

    Driver-generated events.parquet has stored ``ts`` two ways across
    rounds: TIMESTAMP(NANOS) (which old Spark reads as INT64 nanos under
    the legacy conf) and plain TIMESTAMP(MICROS). Resolve the schema,
    then convert only if needed — INT64 nanos via integer DIV (not float
    division: nanos ≈ 1.7e18 exceeds double's 2^53 integer range), which
    matches DuckDB's own nanos→micros truncation. A micros timestamp
    (TIMESTAMP/TIMESTAMP_NTZ) passes through untouched."""
    key = (spark, sf_dir, "events:converted")
    df = _SCAN_CACHE.get(key)
    if df is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # value-preserving under the UTC session tz; keeps every
            # downstream consumer (unix_micros, watermarks, collect
            # semantics) on the same TIMESTAMP type as before
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df = _spread_small_scan(spark, df, f"{sf_dir}/events.parquet")
        _SCAN_CACHE[key] = df
    return df


def _dec_sum(col, alias: str, scale: int = 2):
    """Order-independent sum: decimal accumulate, double at the end.

    Cross-engine exactness bound: DuckDB double-rounds decimal→double
    once the SCALED integer exceeds 2^53 (portable_math.py), i.e. sums
    beyond ~9e13 currency units — four orders above anything the gate's
    sf0.01/sf0.1/sf1 runs produce. Were the gate ever run at a scale
    crossing it, route through
    ``portable_math.dec38_to_double_portable`` / ``sql_dec38_to_double``
    (the welch_t_test moments already do)."""
    return (
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)
    )


def _dec_avg(col, alias: str, decimals: int = 6):
    """Deterministic average: exact decimal sum / count, one division."""
    return round_portable(
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double") / F.count("*"),
        decimals,
    ).alias(alias)


# ---------------------------------------------------------------------------
# Silver-layer relational core (SURVEY §2.2/2.3: F1, F2, X1, X2, D1)
# ---------------------------------------------------------------------------

@register(
    "silver_filter_dedup",
    """
    WITH filtered AS (
      SELECT * FROM lineitem
      WHERE l_returnflag IN ('A', 'N')
        AND l_quantity IS NOT NULL
        AND l_discount BETWEEN 0.02 AND 0.08
    ), dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY l_orderkey, l_partkey
          ORDER BY l_linenumber, l_quantity, l_extendedprice, l_suppkey) AS rn
        FROM filtered) WHERE rn = 1
    )
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM dedup GROUP BY l_returnflag
    """,
)
def q_silver_filter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 IN-list + F2 conjunctive validity + D1 deterministic keyed dedup
    (reference Bronze→Silver measurement build), aggregated for compare."""
    li = _t(spark, sf_dir, "lineitem")
    df = keep_in(li, "l_returnflag", ["A", "N"])
    df = valid_rows(
        df,
        F.col("l_quantity").isNotNull(),
        F.col("l_discount").between(0.02, 0.08),
    )
    df = dedup_first(df, ["l_orderkey", "l_partkey"], order_by=["l_linenumber", "l_quantity", "l_extendedprice", "l_suppkey"])
    return df.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"), _dec_sum("l_quantity", "sum_qty")
    )


# ---------------------------------------------------------------------------
# dim_date build (SURVEY X3-X6, W1)
# ---------------------------------------------------------------------------

@register(
    "dim_date",
    """
    WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders)
    SELECT row_number() OVER (ORDER BY date) AS date_key,
           strftime(date, '%Y-%m-%d') AS date_str,
           year(date) AS year,
           month(date) AS month,
           monthname(date) AS month_name,
           day(date) AS day,
           dayofweek(date) + 1 AS day_of_week,
           dayname(date) AS day_name,
           quarter(date) AS quarter,
           CAST(CASE WHEN dayofweek(date) IN (0, 6) THEN 1 ELSE 0 END
                AS BIGINT) AS is_weekend
    FROM d
    """,
)
def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dim_date: distinct dates → date parts, display
    names, weekend flag (correct Sun/Sat semantics), surrogate key W1."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(F.to_date("o_orderdate").alias("date")).distinct()
    d = with_date_parts(d, "date")
    d = surrogate_key(d, ["date"], "date_key")
    return d.select(
        F.col("date_key"),
        F.date_format("date", "yyyy-MM-dd").alias("date_str"),
        F.col("year").cast("long").alias("year"),
        F.col("month").cast("long").alias("month"),
        F.col("month_name"),
        F.col("day").cast("long").alias("day"),
        F.col("day_of_week").cast("long").alias("day_of_week"),
        F.col("day_name"),
        F.col("quarter").cast("long").alias("quarter"),
        F.col("is_weekend").cast("long").alias("is_weekend"),
    )


# ---------------------------------------------------------------------------
# Dimension with surrogate key + categorical mapping (W1, X9)
# ---------------------------------------------------------------------------

@register(
    "dim_part_category",
    """
    SELECT row_number() OVER (ORDER BY p_partkey) AS part_key,
           p_partkey, p_type,
           CASE WHEN p_type IN ('PROMO', 'ECONOMY')
                THEN 'Value' ELSE 'Regular' END AS category
    FROM part
    """,
)
def q_dim_part_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 surrogate key + X9 two-way categorical split (the reference's
    parameter_code → Particulate Matter / Gas mapping). The part
    catalog SCALES WITH THE DATA (unlike the calendar dimension), so
    the key comes from the bucketed two-phase
    :func:`~.plans.gold.surrogate_key_ranked`, not the
    single-partition `surrogate_key` window."""
    from air_quality_etl_pipeline_spark.plans.gold import surrogate_key_ranked

    p = _t(spark, sf_dir, "part")
    p = surrogate_key_ranked(
        p, F.col("p_partkey"), [F.col("p_partkey")], "part_key"
    )
    return p.select(
        "part_key",
        "p_partkey",
        "p_type",
        binary_category(F.col("p_type"), ["PROMO", "ECONOMY"], "Value", "Regular")
        .alias("category"),
    )


# ---------------------------------------------------------------------------
# Star-join fact build (J1-J3, X7, X10), aggregated (A2)
# ---------------------------------------------------------------------------

@register(
    "gold_star_fact",
    """
    SELECT year(o.o_orderdate) AS year,
           CASE WHEN l.l_extendedprice IS NULL THEN NULL
                WHEN l.l_extendedprice <= 1000 THEN 'Low'
                WHEN l.l_extendedprice <= 3000 THEN 'Mid'
                WHEN l.l_extendedprice <= 5000 THEN 'High'
                ELSE 'VeryHigh' END AS price_bucket,
           count(*) AS n_rows,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(sum(CASE WHEN l.l_extendedprice > 3000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exceeds
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
    """,
)
def q_gold_star_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gold fact build: broadcast star join of the big fact to three
    dims (J1-J3), ordered bucketing X7 and exceedance flag X10, then an
    aggregate A2 so the compare payload stays small."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    supplier = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    fact = star_join(
        li,
        [
            (orders, ["l_orderkey"], "left"),
            (part, ["l_partkey"], "left"),
            (supplier, ["l_suppkey"], "left"),
        ],
    )
    fact = fact.withColumns(
        {
            "price_bucket": bucketize(
                F.col("l_extendedprice"),
                [(1000, "Low"), (3000, "Mid"), (5000, "High")],
                "VeryHigh",
            ),
            "exceeds": flag_threshold(F.col("l_extendedprice"), 3000),
        }
    )
    return fact.groupBy(
        F.year("o_orderdate").cast("long").alias("year"), "price_bucket"
    ).agg(
        F.count("*").alias("n_rows"),
        _dec_sum("l_extendedprice", "sum_price"),
        F.sum(F.col("exceeds").cast("long")).alias("n_exceeds"),
    )


# ---------------------------------------------------------------------------
# Metrics layer — the DAX measures (A4-A12, W3-W6)
# ---------------------------------------------------------------------------

@register(
    "avg_by_month",
    """
    SELECT year(o.o_orderdate) AS year, month(o.o_orderdate) AS month,
           count(*) AS n_rows,
           floor((CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def q_avg_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — AVERAGE at the year×month grain (the reference's core
    Avg-AQI measure), deterministic decimal-sum formulation."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    df = li.join(F.broadcast(o), on="l_orderkey")
    return df.groupBy(
        F.year("o_orderdate").cast("long").alias("year"),
        F.month("o_orderdate").cast("long").alias("month"),
    ).agg(F.count("*").alias("n_rows"), _dec_avg("l_extendedprice", "avg_price"))


@register(
    "filtered_count",
    """
    SELECT o_orderpriority,
           count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — COUNTROWS(FILTER(...)) — the Unhealthy-Day-Count measure."""
    o = _t(spark, sf_dir, "orders")
    return metrics.filtered_count(
        o, F.col("o_totalprice") > 200000, ["o_orderpriority"], alias="n_big"
    )


@register(
    "filtered_distinct_count",
    """
    SELECT year(o_orderdate) AS year,
           count(DISTINCT CASE WHEN o_totalprice > 200000
                 THEN strftime(o_orderdate, '%Y-%m-%d') END) AS n_days
    FROM orders GROUP BY 1
    """,
)
def q_filtered_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — DISTINCTCOUNT under a predicate (Total Unhealthy Days)."""
    o = _t(spark, sf_dir, "orders").withColumns(
        {
            "year": F.year("o_orderdate").cast("long"),
            "day_str": F.date_format("o_orderdate", "yyyy-MM-dd"),
        }
    )
    return metrics.filtered_distinct_count(
        o, "day_str", F.col("o_totalprice") > 200000, ["year"], alias="n_days"
    )


@register(
    "leading_group_top1",
    """
    WITH agg AS (
      SELECT p.p_type,
             floor((CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type)
    SELECT p_type, avg_price FROM (
      SELECT *, row_number() OVER (ORDER BY avg_price DESC, p_type ASC) AS rn
      FROM agg) WHERE rn = 1
    """,
)
def q_leading_group_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/W4 — TOPN(1) by per-group average with tiebreak (the
    Leading-Pollutant measure)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    df = li.join(F.broadcast(p), on="l_partkey")
    return metrics.top_n_by_agg(
        df,
        group_cols=["p_type"],
        agg_expr=round_portable(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ),
        agg_alias="avg_price",
        n=1,
        tiebreak=["p_type"],
    )


@register(
    "argmax_with_ties",
    """
    WITH agg AS (
      SELECT c.c_mktsegment, count(CASE WHEN o.o_totalprice > 150000 THEN 1 END) AS n_big
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment),
    best AS (
      SELECT * FROM (SELECT *, dense_rank() OVER (ORDER BY n_big DESC) AS rk FROM agg)
      WHERE rk = 1)
    SELECT n_big, string_agg(c_mktsegment, ', ' ORDER BY c_mktsegment) AS tied_groups
    FROM best GROUP BY n_big
    """,
)
def q_argmax_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — the Worst-State measure: argmax by filtered count, ties
    rendered as a sorted comma list (CONCATENATEX)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    df = o.join(F.broadcast(c), on="o_custkey")
    return metrics.argmax_with_ties(
        df,
        "c_mktsegment",
        F.count(F.when(F.col("o_totalprice") > 150000, F.lit(1))),
        "n_big",
        list_alias="tied_groups",
    )


@register(
    "mom_change",
    """
    WITH monthly AS (
      SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
             floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price
      FROM orders GROUP BY 1, 2)
    SELECT year, month, avg_price,
           lag(avg_price, 1) OVER (ORDER BY year, month) AS prev_avg_price,
           floor(((avg_price - lag(avg_price, 1) OVER (ORDER BY year, month))
                 / nullif(lag(avg_price, 1) OVER (ORDER BY year, month), 0)) * 1000000.0 + 0.5) / 1000000.0 AS change_pct
    FROM monthly
    """,
)
def q_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/A10 — MoM % change: monthly aggregate, lag(1), safe divide
    (NULL for the first month, like DAX DIVIDE/BLANK)."""
    o = _t(spark, sf_dir, "orders").withColumns(
        {
            "year": F.year("o_orderdate").cast("long"),
            "month": F.month("o_orderdate").cast("long"),
        }
    )
    out = metrics.period_over_period(
        o,
        time_cols=["year", "month"],
        value_expr=round_portable(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ),
        value_alias="avg_price",
        lag_periods=1,
        pct_alias="change_pct",
    )
    return out.withColumn("change_pct", round_portable(F.col("change_pct"), 6))


@register(
    "yoy_change",
    """
    WITH yearly AS (
      SELECT year(o_orderdate) AS year,
             floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price
      FROM orders GROUP BY 1)
    SELECT year, avg_price,
           lag(avg_price, 1) OVER (ORDER BY year) AS prev_avg_price,
           floor(((avg_price - lag(avg_price, 1) OVER (ORDER BY year))
                 / nullif(lag(avg_price, 1) OVER (ORDER BY year), 0)) * 1000000.0 + 0.5) / 1000000.0 AS change_pct
    FROM yearly
    """,
)
def q_yoy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — YoY % change (SAMEPERIODLASTYEAR on a yearly frame)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "year", F.year("o_orderdate").cast("long")
    )
    out = metrics.period_over_period(
        o,
        time_cols=["year"],
        value_expr=round_portable(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ),
        value_alias="avg_price",
        lag_periods=1,
        pct_alias="change_pct",
    )
    return out.withColumn("change_pct", round_portable(F.col("change_pct"), 6))


@register(
    "ytd_cumulative",
    """
    WITH monthly AS (
      SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
             count(*) AS n_orders
      FROM orders GROUP BY 1, 2)
    SELECT year, month, n_orders,
           CAST(sum(n_orders) OVER (PARTITION BY year ORDER BY month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ytd
    FROM monthly
    """,
)
def q_ytd_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — DATESYTD: running count within each year."""
    o = _t(spark, sf_dir, "orders").withColumns(
        {
            "year": F.year("o_orderdate").cast("long"),
            "month": F.month("o_orderdate").cast("long"),
        }
    )
    return metrics.cumulative_to_date(
        o,
        time_cols=["month"],
        value_expr=F.count("*"),
        value_alias="n_orders",
        partition_cols=["year"],
        cum_alias="ytd",
    )


@register(
    "group_rank",
    """
    WITH agg AS (
      SELECT n.n_name, count(*) AS n_customers
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT n_name, n_customers,
           dense_rank() OVER (ORDER BY n_customers ASC) AS rank
    FROM agg
    """,
)
def q_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — RANKX(ALL(dim), measure,, ASC, DENSE) — the State-Rank measure."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    df = c.join(F.broadcast(n), on="c_nationkey")
    return metrics.rank_groups(
        df, "n_name", F.count("*"), "n_customers", ascending=True, rank_alias="rank"
    ).withColumn("rank", F.col("rank").cast("long"))


@register(
    "per_100k",
    """
    WITH pop AS (
      SELECT n.n_name, count(*) AS population
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name),
    cnt AS (
      SELECT n.n_name, count(*) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT cnt.n_name, cnt.n_orders, pop.population,
           floor((cnt.n_orders * 100000.0 / pop.population) * 10000.0 + 0.5) / 10000.0 AS per_100k
    FROM cnt LEFT JOIN pop ON cnt.n_name = pop.n_name
    """,
)
def q_per_100k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — per-capita normalization (Unhealthy Days per 100k):
    count joined to a population dim, scaled per 100 000."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    pop = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), on="c_nationkey")
        .groupBy("n_name")
        .agg(F.count("*").alias("population"))
    )
    cnt = (
        o.join(F.broadcast(c), on="o_custkey")
        .join(F.broadcast(n), on="c_nationkey")
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"))
    )
    out = metrics.per_100k(
        cnt, pop, on=["n_name"], count_col="n_orders", pop_col="population"
    )
    return out.select(
        "n_name", "n_orders", "population", round_portable(F.col("per_100k"), 4).alias("per_100k")
    )


@register(
    "share_of_total",
    """
    WITH agg AS (
      SELECT n.n_name, sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT n_name,
           CAST(rev_dec AS DOUBLE) AS revenue,
           floor((CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
             AS share
    FROM agg
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — score + share-of-total: the REMOVEFILTERS total as a window
    sum over the exact-decimal per-group aggregates."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    aggd = (
        o.join(F.broadcast(c), on="o_custkey")
        .join(F.broadcast(n), on="c_nationkey")
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"))
    )
    total = F.sum("rev_dec").over(Window.partitionBy())
    return aggd.select(
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        round_portable(
            F.col("rev_dec").cast("double") / total.cast("double"), 6
        ).alias("share"),
    )


@register(
    "segment_region_map",
    """
    SELECT CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD') THEN 'Consumer'
                WHEN c_mktsegment IN ('MACHINERY', 'BUILDING') THEN 'Industrial'
                WHEN c_mktsegment IN ('FURNITURE') THEN 'Trade'
                ELSE 'Unknown' END AS segment_group,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY 1
    """,
)
def q_segment_region_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — IN-list label mapping (the census-region chain), aggregated."""
    c = _t(spark, sf_dir, "customer")
    mapped = c.withColumn(
        "segment_group",
        map_by_lists(
            F.col("c_mktsegment"),
            {
                "Consumer": ["AUTOMOBILE", "HOUSEHOLD"],
                "Industrial": ["MACHINERY", "BUILDING"],
                "Trade": ["FURNITURE"],
            },
            default="Unknown",
        ),
    )
    return mapped.groupBy("segment_group").agg(
        F.count("*").alias("n_customers"), _dec_sum("c_acctbal", "sum_bal")
    )


# ---------------------------------------------------------------------------
# Incremental path (D3/J8 anti-join, K4 merge, A3 high-water mark)
# ---------------------------------------------------------------------------

@register(
    "anti_join_new_keys",
    """
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
    """,
)
def q_anti_join_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/J8 — left_anti incremental dedup: keys present after the
    cutoff that never appeared before it."""
    o = _t(spark, sf_dir, "orders")
    after = o.filter(F.col("o_orderdate") >= "1998-01-01").select("o_custkey").distinct()
    before = o.filter(F.col("o_orderdate") < "1998-01-01").select("o_custkey")
    return after.join(before, on="o_custkey", how="left_anti")


@register(
    "merge_upsert",
    """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'),
    source AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
    merged AS (
      SELECT * FROM target
      UNION ALL
      SELECT s.* FROM source s
      WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey))
    SELECT o_orderstatus, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 — insert-if-absent MERGE via anti-join + union (the pure-Spark
    formulation of Delta whenNotMatchedInsertAll), on overlapping
    target/source windows."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    target = o.filter(F.col("o_orderdate") < "1998-01-01").select(*cols)
    source = o.filter(F.col("o_orderdate") >= "1997-01-01").select(*cols)
    merged = merge_insert_if_absent(target, source, keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"), _dec_sum("o_totalprice", "sum_price")
    )


# ---------------------------------------------------------------------------
# Grouping sets / top-k / set ops (SURVEY §2.5 tail, §2.7)
# ---------------------------------------------------------------------------

@register(
    "cube_measures",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measures at every grain — the BI layer's arbitrary-slicer
    re-aggregation, expressed as CUBE (SURVEY §2.5 note).

    r13 plan rework (guide §2.3, aggregate before you expand): a
    direct ``li.cube(...)`` plans ``Expand`` UNDER the aggregate, so
    every fact row is replicated ×4 (one copy per grouping set)
    before the partial aggregation — at 100 TB that quadruples the
    aggregate's input for a 4-grain rollup of a 2-value × 3-value
    key space. Instead aggregate once at the finest grain (count +
    exact decimal sum — both reassociate losslessly), then CUBE the
    ~|flag|×|status| partial relation: the Expand now replicates a
    handful of rows, and the fact table is scanned and aggregated
    exactly once at its own grain. Results are bit-identical (decimal
    sums are exact, counts sum), verified against the unchanged
    oracle."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"),
        # partial sums stay DECIMAL (exact) — double only at the edge
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_s"),
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            # coalesce: schema/nullability hygiene only — sum() is
            # nullable where count(*) was not, and on any emitted row
            # sum(_n) is non-NULL (CUBE/ROLLUP over an empty input
            # emits zero rows, r13 advisor correction), so this keeps
            # the column non-null-typed without changing any value
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_rows"),
            F.sum("_s").cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3 — deterministic top-k by sort + limit (TOPN measures).
    Physically a TakeOrderedAndProject: no global sort materialization."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregation (streaming twin, batch form)
# ---------------------------------------------------------------------------

@register(
    "events_daily_window",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_daily_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregate over the event stream — the batch
    twin of the Structured Streaming pipeline (same F.window operator
    works under readStream + watermark; see streaming module)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dec_sum("value", "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Exact percentiles (distribution measures beyond the reference's DAX set)
# ---------------------------------------------------------------------------

@register(
    "quantiles",
    """
    SELECT l_returnflag,
           floor((quantile_cont(l_quantity, 0.5)) * 1000000.0 + 0.5)
             / 1000000.0 AS median_qty,
           floor((quantile_cont(l_quantity, 0.9)) * 1000000.0 + 0.5)
             / 1000000.0 AS p90_qty,
           floor((quantile_cont(l_extendedprice, 0.99)) * 1000000.0 + 0.5)
             / 1000000.0 AS p99_price
    FROM lineitem GROUP BY 1
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL percentile_cont semantics on
    both engines — linear interpolation between order statistics).
    Exact percentile needs a per-group sort; at 100 TB swap in
    ``approx_percentile`` (t-digest, one pass, no sort) and accept the
    documented error bound."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_portable(F.expr("percentile(l_quantity, 0.5)"), 6).alias(
            "median_qty"
        ),
        round_portable(F.expr("percentile(l_quantity, 0.9)"), 6).alias(
            "p90_qty"
        ),
        round_portable(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias(
            "p99_price"
        ),
    )


# ---------------------------------------------------------------------------
# Rollup — the hierarchical-grain companion of cube_measures
# ---------------------------------------------------------------------------

@register(
    "rollup_measures",
    """
    SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS year,
           coalesce(CAST(month(o_orderdate) AS VARCHAR), 'ALL') AS month,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    """,
)
def q_rollup_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grain totals (year → year+month → grand total) via
    ``rollup`` — the "measure valid at any grain of a hierarchy"
    companion to the cube query. Null grouping slots are labeled 'ALL'
    so the subtotal rows hash identically across engines."""
    o = _t(spark, sf_dir, "orders")
    # r13: aggregate at the finest (y, m) grain BEFORE the rollup so
    # Expand replicates ~84 partial rows ×3 instead of every order row
    # (guide §2.3; same rework and equivalence argument as
    # q_cube_measures — counts and decimal sums reassociate exactly)
    base = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count("*").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_s"),
    )
    return (
        base.rollup("y", "m")
        .agg(
            # coalesce: schema/nullability hygiene only — sum() is
            # nullable where count(*) was not, and on any emitted row
            # sum(_n) is non-NULL (CUBE/ROLLUP over an empty input
            # emits zero rows, r13 advisor correction), so this keeps
            # the column non-null-typed without changing any value
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_orders"),
            F.sum("_s").cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("y").cast("string"), F.lit("ALL")).alias("year"),
            F.coalesce(F.col("m").cast("string"), F.lit("ALL")).alias("month"),
            "n_orders",
            "sum_price",
        )
    )


# ---------------------------------------------------------------------------
# Wide star join (J10 semantic relationships / analysis view)
# ---------------------------------------------------------------------------

@register(
    "star_join_wide",
    """
    SELECT r.r_name, count(*) AS n_rows,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(5,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def q_star_join_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — the full analysis view: fact chained through orders →
    customer → nation → region. Big-big joins (orders, customer) shuffle
    on their keys; the truly small dims (nation, region) broadcast so
    they never force an exchange. Revenue is exact decimal arithmetic
    end to end (product of decimals, summed), double only at the edge."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = star_join(
        li,
        [
            (o, [li["l_orderkey"] == o["o_orderkey"]], "inner"),
            (c, [o["o_custkey"] == c["c_custkey"]], "inner"),
        ],
        broadcast_dims=False,  # orders/customer scale with the fact
    )
    joined = star_join(
        joined,
        [
            (n, [c["c_nationkey"] == n["n_nationkey"]], "inner"),
            (r, [n["n_regionkey"] == r["r_regionkey"]], "inner"),
        ],
        broadcast_dims=True,  # nation/region are fixed-size smalls
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(5,2)")
    return joined.groupBy("r_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(rev).cast("double").alias("revenue"),
    )


@register(
    "star_join_wide_preagg",
    """
    SELECT r.r_name, count(*) AS n_rows,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(5,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def q_star_join_wide_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``star_join_wide`` (r14, VERDICT r13 item 7;
    guide §2.3 "aggregate before you shuffle" / §3): lineitem revenue
    pre-aggregates to ORDERKEY grain *below* the orders join, so the
    join's fact side carries one row per order (3 ints + a decimal)
    instead of every line item. Result is bit-identical — per-order
    line counts sum to count(*), and the decimal revenue reassociates
    exactly — and the oracle is the same SQL as star_join_wide's.

    Why a twin instead of rewriting star_join_wide: at bench scale
    orders/customer sit under the broadcast threshold, so the original
    plan never shuffles the fact and the pre-aggregate would only add
    an exchange it cannot pay for (r13 audit: all four joins
    BroadcastHashJoin). The twin carries the strategy that wins once
    orders/customer no longer broadcast — at sf1-cold the join inputs
    drop from 6 M line rows to 1.5 M order rows ahead of the
    sort-merge join (receipts in OPTIMIZATION_r14.md); at 100 TB the
    saved shuffle is (lines − orders) × row width."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(5,2)")
    lrev = li.groupBy("l_orderkey").agg(
        F.count("*").alias("_n_li"), F.sum(rev).alias("_rev")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        lrev.join(o, lrev["l_orderkey"] == o["o_orderkey"], "inner")
        .join(c, o["o_custkey"] == c["c_custkey"], "inner")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "inner")
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"], "inner")
    )
    return joined.groupBy("r_name").agg(
        F.sum("_n_li").cast("long").alias("n_rows"),
        F.sum("_rev").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Display mapping + conditional color (X13, X14) over ranked aggregates
# ---------------------------------------------------------------------------

@register(
    "display_labels",
    """
    WITH agg AS (
      SELECT r.r_name, n.n_name,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, dense_rank() OVER (ORDER BY revenue DESC) AS rnk FROM agg)
    SELECT concat(r_name, ' - ', n_name) AS label, revenue,
           CAST(rnk AS BIGINT) AS rnk,
           CASE WHEN rnk <= 2 THEN 'green'
                WHEN rnk <= 4 THEN 'yellow'
                ELSE 'red' END AS color
    FROM ranked
    """,
)
def q_display_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 concat display label ("STATE - POLLUTANT" in the reference)
    + X14 SWITCH(TRUE) rank→color flag, over a ranked aggregate (W3)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    aggd = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(_dec_sum("o_totalprice", "revenue"))
    )
    ranked = aggd.withColumn(
        "rnk", F.dense_rank().over(Window.orderBy(F.col("revenue").desc()))
    )
    return ranked.select(
        F.concat_ws(" - ", "r_name", "n_name").alias("label"),
        "revenue",
        F.col("rnk").cast("long").alias("rnk"),
        bucketize(F.col("rnk"), [(2, "green"), (4, "yellow")], "red").alias(
            "color"
        ),
    )


# ---------------------------------------------------------------------------
# Month truncation + union + distinct coverage (X12, O4, A13/D2)
# ---------------------------------------------------------------------------

@register(
    "month_rollup",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
             AS month_start,
           monthname(o_orderdate) AS month_name,
           count(*) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
)
def q_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — Power Query's Date.StartOfMonth + Date.MonthName as
    ``trunc(date, 'month')`` + month-name formatting."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format("o_orderdate", "MMMM").alias("month_name"),
        )
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "union_append",
    """
    WITH u AS (
      SELECT * FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT * FROM orders WHERE o_orderkey % 2 = 1)
    SELECT o_orderstatus, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM u GROUP BY 1
    """,
)
def q_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — ``unionByName`` (by-name, not positional: column order must
    not silently misalign) of two disjoint splits, re-aggregated."""
    o = _t(spark, sf_dir, "orders")
    evens = o.filter(F.col("o_orderkey") % 2 == 0)
    odds = o.filter(F.col("o_orderkey") % 2 == 1)
    u = evens.unionByName(odds)
    return u.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"), _dec_sum("o_totalprice", "sum_price")
    )


@register(
    "distinct_coverage",
    """
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
             AS types
    FROM events
    """,
)
def q_distinct_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/D2 — coverage summary: distinct count + deterministic sorted
    roster (the reference's states-covered QA set, made distributed)."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "types"
        ),
    )


# These register themselves into QUERIES on import.
from air_quality_etl_pipeline_spark import workload_llm  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_sources  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_curation  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_temporal  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_analytics  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_sketches  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_corpus  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_sql  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_training  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_graph  # noqa: E402,F401
from air_quality_etl_pipeline_spark import workload_lakehouse  # noqa: E402,F401

# Iterative/training queries whose CONSTRUCTION executes Spark jobs
# (eager localCheckpoint rounds, driver-side union-find, trainer
# argmax collects, moment passes): a cached prepared plan would re-time
# only the post-iteration stages, silently under-reporting the real
# cost — rebuild these per bench sample, same contract as the
# write/ingest/stream side-effect queries above them in this set.
#: Pure read-only queries whose BUILD phase runs driver-side actions
#: (iteration loops, or the tiny min/max + per-bucket-totals collects
#: of the two-phase order-statistics operators). They must be rebuilt
#: per bench sample so each timing includes that work — but unlike the
#: write/stream side-effect queries they are safe to construct
#: anywhere (plan sweeps, oracle checks) with no filesystem effects.
REBUILD_PURE_QUERIES: set[str] = {
    # r13: the √N auto-stride default runs the corpus count() that
    # sizes the coarse quantizer at BUILD time — rebuild per sample so
    # every timing pays the sizing job (the bench-honesty fence
    # test_pure_query_builds_run_no_jobs catches this mechanically)
    "ann_ivf_topk_auto",
    "dedup_clusters",
    "dedup_canonical_docs",
    "split_leakage_audit",
    "pagerank_trade_graph",
    "ppr_from_seeds",
    "bpe_learn_merges",
    "bpe_encode_corpus",
    "kmeans_parallel_init",
    "pca_project",
    "pack_sequences",
    # bucketed two-phase order statistics (operators/order_stats.py):
    # the round-6 fused builders run ONE summary-collect job at build
    # (and localCheckpoint their input — a reused DataFrame would serve
    # materialized blocks to samples 2+), so each sample rebuilds to
    # pay the summary job and the materialization honestly
    "orders_gini",
    "abc_pareto_classes",
    "psi_value_drift",
    "curriculum_shards",
    "shuffle_shards_audit",  # r10: seeded_shuffle rides with_global_rank
    "peak_concurrent_sessions",
    "id_gap_audit",
    "repeat_purchase_interval",
    "padding_waste_report",
    "dim_part_category",
    "ntile_deciles",
    "rfm_segments",
    "record_breaking_orders",
    "skyline_running_max",
    # MMR checkpoints its bounded candidate/pair relations before the
    # unrolled greedy rounds (the rounds reference them ~3x each; an
    # un-cut lineage re-executes the corpus scan per reference —
    # measured 8.1 s vs sub-second at sf1), so the builder runs the
    # candidate-generation jobs and each bench sample must pay them
    "mmr_diversified_rerank",
    # builders that execute Spark jobs at construction (found by the
    # job-group audit that is now the plan-quality fence
    # tests/test_plan_quality.py::test_pure_query_builds_run_no_jobs):
    # the PQ codebook collect (k lowest-id vectors) and the Bloom
    # bitmap build (dim scan → ≤4096 positions) are the operator's own
    # training/build work, so bench samples must pay them
    "pq_codes",
    "pq_adc_search",
    "ivf_pq_search",
    "bloom_filter_join",
    # merge_full_sync / merge_multi_clause left this list in round 9:
    # check_multiple_matches="lazy" compiles the Delta duplicate-match
    # probe into the plan as a raise_error branch, so their builders
    # run zero jobs again (verified by the builds-run-no-jobs fence)
    # and the whole validation cost is inside every timed sample
}
SIDE_EFFECT_QUERIES.update(REBUILD_PURE_QUERIES)

#: Queries whose physical plan carries a Window ON a single-partition
#: exchange over a relation that is provably BOUNDED (a fixed dimension
#: or an aggregate at a grain that does NOT scale with the data). Add a
#: name ONLY with the boundedness argument; "it's an aggregate" is not
#: enough — customer/part/document grains scale with data and belong in
#: operators/order_stats.py instead. Enforced registry-wide by
#: tests/test_plan_quality.py; bench.py silences exactly these queries'
#: (known, justified) WindowExec single-partition warnings so a NEW
#: offender's warning stays visible in the bench tail.
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "argmax_with_ties": "market-segment aggregate (5 rows; WindowGroupLimit also pre-bounds per partition)",
    "compaction_bin_packing": "file-manifest grain (month x priority, calendar-bounded ~420 rows/era)",
    "auc_rank_sum": "distinct rounded-score relation (bounded score domain, documented in its docstring)",
    "dim_date": "calendar-day dimension (~2.5k rows/decade, independent of fact volume)",
    "display_labels": "region x nation aggregate (25 rows)",
    "distinct_to_date": "month-grain aggregate (~84 rows/TPC-H era)",
    "group_rank": "nation-grain aggregate (25 rows)",
    "largest_remainder_alloc": "event-type aggregate (~5 rows)",
    "mom_change": "month-grain aggregate",
    "moving_avg_7d": "day-grain aggregate (calendar-bounded)",
    "order_backlog_daily": "day-grain running backlog (calendar-bounded)",
    "share_of_total": "nation-grain aggregate (25 rows)",
    "sql_keyset_pagination": "rn reconstruction window over the LIMIT-20 page",
    "skyline_pareto_parts": "distinct-price max-size relation (generator-bounded currency domain, 1000 values at sf0.01 and sf0.1 alike)",
    "cusum_changepoint": "day-grain aggregate (calendar-bounded)",
    "rolling_hll_distinct_7d": "day-grain HLL sketch relation (calendar-bounded; one 2.5kB register set per day)",
    "yoy_change": "month-grain aggregate",
    # top-k rank windows that Spark bounds with WindowGroupLimit /
    # TakeOrderedAndProject before the final single-partition pass
    # (verified in the round-6 verdict's plan audit): the WindowExec
    # warning fires but the window input is <= k rows per upstream
    # partition, never the data
    "hybrid_rrf_search": "rank<=20 / fused<=10 top-k windows, WindowGroupLimit-bounded",
    "boilerplate_gram_coverage": "vocabulary top-20 window, TakeOrderedAndProject-bounded",
    "sketch_cm_heavy_hitters": "top-k candidate rank window, WindowGroupLimit-bounded",
}

#: Queries REGISTERED WITHOUT a DuckDB oracle, by design — the single
#: definition site for the rows-only contract (round-4 verdict #7):
#: ``__spark_entry__.oracle_sql()`` omits exactly these names, and
#: ``_driver_checked_rounds`` below counts their ``err: no_oracle``
#: receipts (with rows returned) as a checked rows-only pass so they
#: stop re-entering the driver gate's first-50 window every round.
#: tests/test_invariants.py asserts this set equals the queries whose
#: registered oracle is ``None``.
#:
#: EMPTY since round 11: the last member, ``bpe_encode_corpus``,
#: gained a real unrolled-CTE oracle (the trainer oracle's round-t
#: rewrite relation IS the encoded vocabulary — see
#: workload_training._bpe_encode_oracle), so every registered query is
#: now hash-compared cross-engine. Leaving the set (per the round-5
#: advisor rule below in _driver_checked_rounds) drops its old
#: ``no_oracle`` credit, re-queueing it at the front of the driver
#: gate so the new oracle is driver-verified immediately.
ROWS_ONLY_QUERIES: frozenset[str] = frozenset()

#: Driver-verification priority. The driver's correctness gate checks
#: the FIRST 50 registered queries per round. Lifetime through round 3:
#: 146 distinct driver-green, 0 ever-failed, 107 never checked.
#:
#: This static list is the BASE order; the effective registry order is
#: computed at import by ``_driver_checked_rounds`` below, which reads
#: the driver-written ``CORRECTNESS_r*.json`` receipts and re-sorts so
#: that (1) never-driver-checked (or last-check-failed) queries come
#: first in base order, then (2) checked-green queries by OLDEST last
#: check first (drift re-confirmation). The round-3 verdict's
#: highest-leverage finding was that this re-ordering had to be done
#: by hand each round or the gate re-confirms known greens and retires
#: zero backlog — deriving it from the receipts makes the rotation
#: self-maintaining: each gate run demotes what it just checked.
#: Every queued name is locally verified at sf0.001 AND sf0.01 by
#: tests/test_oracle_parity.py — the driver signal is confirmation,
#: not first contact.
_DRIVER_PRIORITY = [
    # never driver-checked (107) — rounds 4+5 gate fodder, oldest-first
    "bm25_search",
    "chi2_lang_tokens",
    "train_val_test_split",
    "orders_gini",
    "bpe_pair_counts",
    "dedup_span_runs",
    "sql_volume_shipping",
    "sql_product_profit",
    "sql_important_parts",
    "sql_late_shipments",
    "sql_potential_promotion",
    "sql_waiting_suppliers",
    "sql_sales_opportunity",
    "semantic_dedup",
    "pq_codes",
    "pq_adc_search",
    "bigram_logprob_score",
    "sketch_cm_heavy_hitters",
    "embedding_covariance",
    "bpe_learn_merges",
    "pagerank_trade_graph",
    "ann_recall_at_k",
    "pca_project",
    "sketch_kmv_jaccard",
    "copurchase_pairs",
    "triangle_count",
    "entity_link_names",
    "dedup_canonical_docs",
    "lsh_recall_eval",
    "ivf_pq_search",
    "orc_roundtrip",
    "jsonl_roundtrip",
    "streaming_topk_daily",
    "bfs_reach_3",
    "hybrid_rrf_search",
    "boilerplate_gram_coverage",
    "trigram_backoff_score",
    "csv_quarantine_split",
    "sql_forecast_revenue",
    "matryoshka_recall",
    "quantization_error_stats",
    "cdc_apply_latest",
    "right_to_forget_scrub",
    "variant_props_extract",
    "sql_lateral_topn",
    "streaming_rest_ingest",
    "null_safe_join_counts",
    "pearson_corr_qty_price",
    "drill_across_monthly",
    "ppr_from_seeds",
    "bpe_encode_corpus",
    "fk_integrity_audit",
    "weighted_median_price",
    "topk_with_ties_orders",
    "dataset_card_summary",
    "rerank_crossencoder_stub",
    "multimodal_blob_dedup",
    "association_rules",
    "sft_pairs_assembly",
    "padding_waste_report",
    "mad_outliers",
    "late_dim_backfill",
    "table_fingerprint",
    "knn_classifier_eval",
    "keyword_extraction_topk",
    "text_char_entropy",
    "ols_price_by_qty",
    "benford_first_digit",
    "event_streaks",
    "winsorize_values",
    "tz_daily_counts",
    "largest_remainder_alloc",
    "streaming_outer_join",
    "event_transition_matrix",
    "dwell_time_stats",
    "multitouch_attribution",
    "sql_recursive_paths",
    "cube_grouping_flags",
    "revenue_reconciliation",
    "dow_seasonality",
    "retrieval_mrr_ndcg",
    "churn_flags",
    "class_separability",
    "vocab_similarity_langs",
    "target_encoding_smoothed",
    "abc_pareto_classes",
    "calendar_densify",
    "auc_rank_sum",
    "psi_value_drift",
    "lid_macro_f1",
    "jaccard_threshold_sweep",
    "join_fanout_audit",
    "bounce_rate_daily",
    "peak_concurrent_sessions",
    "revenue_decomposition",
    "shipping_latency_bands",
    "growth_accounting_daily",
    "supplier_hhi_by_nation",
    "ttr_by_length_band",
    "order_backlog_daily",
    "dead_stock_report",
    "id_gap_audit",
    "sql_keyset_pagination",
    "mean_imputation_report",
    "double_charge_detection",
    "priority_mix_shift",
    "repeat_purchase_interval",
    # driver-green, last verified round 1 — drift re-confirmation queue
    "silver_filter_dedup",
    "dim_date",
    "dim_part_category",
    "avg_by_month",
    "filtered_count",
    "filtered_distinct_count",
    "leading_group_top1",
    "argmax_with_ties",
    "mom_change",
    "yoy_change",
    "group_rank",
    "per_100k",
    "share_of_total",
    "segment_region_map",
    "anti_join_new_keys",
    "merge_upsert",
    "cube_measures",
    "topk_orders",
    "events_daily_window",
    "quantiles",
    "rollup_measures",
    "star_join_wide",
    "display_labels",
    "month_rollup",
    "union_append",
    "distinct_coverage",
    "text_stats",
    "lang_id",
    "quality_score",
    "bpe_token_count",
    "text_scrub",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "corpus_composition",
    "ann_cosine_topk",
    "ann_sign_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "embedding_normalize",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "dedup_fuzzy_edit",
    "doc_repetition",
    "embedding_quantize_int8",
    # driver-green, last verified round 3
    "kmeans_parallel_init",
    "decontaminate_eval",
    "pack_sequences",
    "streaming_static_enrich",
    "hard_negative_mining",
    "sql_shipping_priority",
    "sql_local_supplier_volume",
    "chunk_documents",
    "mixture_sample",
    "cross_doc_ngram_dup",
    "vocab_oov_rate",
    "zscore_anomalies",
    "moving_avg_7d",
    "ntile_deciles",
    "above_avg_orders",
    "iqr_outliers",
    "histogram_bins",
    "snapshot_diff",
    "user_journey",
    "funnel_steps",
    "sql_returned_items",
    "sql_top_supplier",
    "sql_parts_supplier",
    "sql_small_qty_revenue",
    "sql_large_volume_customer",
    "sql_discounted_revenue",
    "sql_promo_revenue",
    "sql_market_share",
    "unigram_logprob_score",
    "heavy_hitter_ngrams",
    "kl_corpus_divergence",
    "percent_rank_docs",
    "random_projection_lsh",
    "url_canonical_dedup",
    "suffix_prefix_dup",
    "zipf_token_ranks",
    "bloom_filter_join",
    "stopword_profile",
    "char_ngram_lid_confusion",
    "token_histogram_bands",
    "minhash_containment",
    "doc_dup_fraction_by_lang",
    "robots_quality_gate",
    "domain_balance_sample",
    "contamination_overlap_stats",
    "sql_order_priority_count",
    "sql_customer_distribution",
    "sql_min_cost_supplier",
    "asof_nearest_join",
    "embedding_drift_centroids",
]

def _driver_checked_rounds(root: str | None = None) -> dict[str, int]:
    """``name -> latest round whose driver gate checked it GREEN``,
    parsed from the driver-written ``CORRECTNESS_r*.json`` receipts at
    the repo root (or *root*, for tests). A query whose LATEST check
    failed or errored is excluded entirely — even if an earlier round
    was green — so a regression re-queues it at the front with the
    never-checked block. Missing/unreadable files contribute nothing,
    so a fresh clone falls back to the static base order.

    A receipt with ``err == "no_oracle"`` and ``spark_rows > 0`` counts
    as a checked ROWS-ONLY pass — but ONLY for current
    :data:`ROWS_ONLY_QUERIES` members: that is the strongest signal the
    driver can ever record for them, so treating it as unchecked would
    re-queue those queries into the gate's first-50 window every round
    forever, burning slots that should retire real backlog (round-4
    verdict, "What's wrong" #2). A query that has since GAINED an
    oracle (left the set) must NOT keep its old no_oracle credit, or
    its brand-new oracle would go driver-unverified for many rounds
    (round-5 advisor finding: bpe_learn_merges / pca_project)."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_green: dict[str, int] = {}
    latest_any: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            latest_any[name] = max(rnd, latest_any.get(name, 0))
            err = rec.get("err")
            green = (
                rec.get("rows_match") is True
                and rec.get("schema_match", True) is not False
                and rec.get("hash_match", True) is not False
                and err is None
            ) or (
                # rows-only pass: the driver ran the query, it returned
                # rows, and the query is STILL registered oracle-less
                err == "no_oracle"
                and (rec.get("spark_rows") or 0) > 0
                and name in ROWS_ONLY_QUERIES
            )
            if green:
                latest_green[name] = max(rnd, latest_green.get(name, 0))
    return {
        name: rnd
        for name, rnd in latest_green.items()
        if rnd >= latest_any[name]
    }


_snapshot = dict(QUERIES)
_base = [n for n in _DRIVER_PRIORITY if n in _snapshot] + [
    n for n in _snapshot if n not in _DRIVER_PRIORITY
]
_base_pos = {n: i for i, n in enumerate(_base)}
# SPARK_GRAFT_STATIC_ORDER=1 pins the registry to the static base order
# (receipt files vary per working tree, so two clones of one commit can
# otherwise expose different QUERIES orderings — set this for
# reproducible iteration/collection order; the receipt-driven rotation
# stays the default because the driver gate depends on it).
if os.environ.get("SPARK_GRAFT_STATIC_ORDER", "") not in ("", "0"):
    _checked: dict[str, int] = {}
else:
    _checked = _driver_checked_rounds()
# never-checked (and last-check-failed) first in base order, then
# checked-green by oldest-latest-check round first, ties in base order
_order = sorted(
    _base, key=lambda n: (_checked.get(n, -1), _base_pos[n])
)
QUERIES.clear()
QUERIES.update({n: _snapshot[n] for n in _order})
