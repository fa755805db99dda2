"""Lakehouse storage-layout & governance workload: the table-maintenance
operators a 100-TB lakehouse runs nightly — multi-dimensional clustering
(Z-order), small-file compaction planning, bitmap-index distinct rollups,
and k-anonymity audits — each with a DuckDB oracle twin.

These generalize the reference's warehouse-maintenance surface (its
pipelines rebuild tables wholesale — ``Automated_Silver_to_Gold`` drops
and reloads; a lakehouse at scale optimizes layout *in place*):

* Z-ORDER LAYOUT AUDIT — the file-assignment math behind
  ``OPTIMIZE ... ZORDER BY`` (Delta/Iceberg): interleave the bits of two
  cluster keys into a Morton code, assign rows to files by code range,
  and report each file's per-key min/max envelope. The envelope IS the
  data-skipping index: a predicate on either key prunes every file whose
  [lo, hi] misses it. Pure integer bit arithmetic — identical in every
  engine.
* COMPACTION BIN-PACKING — the ``OPTIMIZE`` small-file planner: fold a
  file manifest (here: month x priority row-group stats) in manifest
  order into target-sized output bins via an exclusive running total.
  The manifest is metadata-sized (calendar-bounded), never the data.
* BITMAP DISTINCT ROLLUP — exact COUNT(DISTINCT user) per day as a
  two-level bitmap aggregation (chunk = id DIV 64, one BIGINT of
  presence bits per chunk via BIT_OR, then SUM(BIT_COUNT(bits))). This
  is the partial-aggregatable distinct used by bitmap-indexed stores
  (Druid, Pinot, ClickHouse groupBitmap): BIT_OR combines map-side, so
  the shuffle carries one long per (day, chunk) instead of one row per
  event — at 100 TB that is the difference between shuffling gigabytes
  and shuffling the id-space bitmap. The oracle cross-verifies with a
  plain COUNT(DISTINCT) — two unrelated algorithms, same answer.
* K-ANONYMITY AUDIT — Sweeney's k-anonymity (IJUFKS 2002) over a
  quasi-identifier tuple: for each policy k, how many equivalence
  classes are smaller than k and how many rows they expose. One
  groupBy to class sizes (data-sized, one shuffle), then a broadcast
  nested-loop against the constant k-policy relation.

Scale notes: every query here is a single data-sized shuffle (the
groupBy to codes / classes / chunks) plus metadata-sized post-work.
The compaction window runs over the month x priority manifest
(calendar-bounded — allowlisted in tests/test_plan_quality.py with
that argument). No UDFs anywhere; all expressions are Catalyst
built-ins inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.workload import _events, _t, register

# ---------------------------------------------------------------------------
# Z-order (Morton) clustering layout audit
# ---------------------------------------------------------------------------

_ZBITS = 8  # bits interleaved per key -> 16-bit Morton code, 256 files


def _z_terms(pk: str, sk: str, shift_fmt: str) -> str:
    """The bit-interleave polynomial, shared by both engines: bit i of
    *pk* lands at position 2i, bit i of *sk* at 2i+1. ``shift_fmt`` is
    an engine-specific right-shift template ``(expr, i) -> str``-format
    with ``{x}``/``{i}`` placeholders; everything else is +, * and & 1,
    which behave identically on non-negative integers everywhere."""
    terms = [
        f"(({shift_fmt.format(x=pk, i=i)}) & 1) * {1 << (2 * i)}"
        for i in range(_ZBITS)
    ] + [
        f"(({shift_fmt.format(x=sk, i=i)}) & 1) * {1 << (2 * i + 1)}"
        for i in range(_ZBITS)
    ]
    return " + ".join(terms)


_Z_SPARK = _z_terms("__pk", "__sk", "shiftright({x}, {i})")
_Z_DUCK = _z_terms("pk8", "sk8", "({x} >> {i})")


@register(
    "zorder_layout_audit",
    f"""
    WITH keyed AS (
      SELECT (l_partkey % 256) AS pk8, (l_suppkey % 256) AS sk8
      FROM lineitem),
    coded AS (
      SELECT pk8, sk8, ({_Z_DUCK}) AS z FROM keyed)
    SELECT CAST(z // 256 AS BIGINT) AS file_id,
           count(*) AS n_rows,
           CAST(min(pk8) AS BIGINT) AS pk_lo,
           CAST(max(pk8) AS BIGINT) AS pk_hi,
           CAST(min(sk8) AS BIGINT) AS sk_lo,
           CAST(max(sk8) AS BIGINT) AS sk_hi
    FROM coded GROUP BY 1
    """,
)
def q_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code clustering audit: interleave 8 bits of two cluster
    keys (partkey, suppkey mod 256 — the cluster-key hash space) into a
    16-bit Z-value, assign rows to 256 files by Z-range, and report each
    file's min/max envelope on BOTH keys. Because the Morton curve is
    locality-preserving in every interleaved dimension, each file's
    envelope covers ~1/16 of either key's domain — so a point predicate
    on either key prunes ~15/16 of the files from file-level min/max
    stats alone, which a single-key sort layout only achieves for its
    leading key. (This is the assignment math of Delta/Iceberg
    ``OPTIMIZE ... ZORDER BY``; the reference rebuilds tables unsorted —
    ``Automated_Silver_to_Gold_Data_Transformation.py`` saveAsTable —
    so this is the scale extension of its maintenance surface.)

    Scale: one projection (pure integer bit arithmetic, codegen'd) and
    ONE shuffle on file_id; at real scale the groupBy becomes the
    repartitionByRange(z) before the writer and the audit rides the
    same pass as file statistics."""
    li = _t(spark, sf_dir, "lineitem")
    coded = li.select(
        (F.col("l_partkey") % 256).alias("__pk"),
        (F.col("l_suppkey") % 256).alias("__sk"),
    ).select("__pk", "__sk", F.expr(_Z_SPARK).alias("z"))
    return coded.groupBy(F.expr("z DIV 256").alias("file_id")).agg(
        F.count("*").alias("n_rows"),
        F.min("__pk").cast("long").alias("pk_lo"),
        F.max("__pk").cast("long").alias("pk_hi"),
        F.min("__sk").cast("long").alias("sk_lo"),
        F.max("__sk").cast("long").alias("sk_hi"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning (OPTIMIZE bin-packing)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 256 * 1024  # bytes per output bin
_ROW_BYTES = 128  # manifest row-size estimate per orders row


@register(
    "compaction_bin_packing",
    f"""
    WITH manifest AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             o_orderpriority AS prio,
             count(*) * {_ROW_BYTES} AS bytes
      FROM orders GROUP BY 1, 2),
    planned AS (
      SELECT ym, prio, bytes,
             CAST(coalesce(sum(bytes) OVER (
               ORDER BY ym, prio
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_COMPACT_TARGET} AS BIGINT) AS bin_id
      FROM manifest)
    SELECT bin_id,
           count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           min(ym || '/' || prio) AS first_file,
           max(ym || '/' || prio) AS last_file
    FROM planned GROUP BY bin_id
    """,
)
def q_compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style compaction plan: fold the file manifest (one entry
    per month x priority row group, sized at 128 B/row) in manifest
    order into ~256 KiB output bins. Bin assignment is the exclusive
    running total DIV target — the deterministic parallel form of
    sequential first-fit used by table-format compactors (files keep
    manifest order, so each bin rewrites a contiguous key range and
    data-skipping stats stay tight after the rewrite).

    Scale: the windowed relation is the MANIFEST, not the data —
    month x priority is calendar-bounded (~420 rows/TPC-H era,
    independent of fact volume; real table formats hold file stats in
    metadata at exactly this grain). The fact-sized work is the one
    groupBy that builds the manifest. Allowlisted global window with
    this argument in tests/test_plan_quality.py."""
    o = _t(spark, sf_dir, "orders")
    manifest = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.col("o_orderpriority").alias("prio"),
    ).agg((F.count("*") * _ROW_BYTES).alias("bytes"))
    w = (
        Window.orderBy("ym", "prio")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = (
        manifest.withColumn("__cum", F.coalesce(F.sum("bytes").over(w), F.lit(0)))
        .withColumn("bin_id", F.expr(f"__cum DIV {_COMPACT_TARGET}").cast("long"))
    )
    return planned.groupBy("bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min(F.concat_ws("/", "ym", "prio")).alias("first_file"),
        F.max(F.concat_ws("/", "ym", "prio")).alias("last_file"),
    )


# ---------------------------------------------------------------------------
# Bitmap-index distinct rollup
# ---------------------------------------------------------------------------


@register(
    "bitmap_distinct_rollup",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users via two-level bitmap aggregation:
    chunk = user_id DIV 64, one BIGINT of presence bits per (day, chunk)
    built with BIT_OR(1 << (user_id % 64)), then popcount-sum per day.

    Why not count_distinct: Spark plans COUNT(DISTINCT) as an Expand +
    re-aggregate whose shuffle carries one row per distinct (day, user)
    pair; BIT_OR is a declarative aggregate with a map-side partial, so
    the shuffle carries AT MOST one long per (day, id-chunk) — bounded
    by the id space / 64, not by event volume. This is the dense-bitmap
    core of the roaring/groupBitmap technique in bitmap-indexed stores
    (Chambi et al., "Better bitmap performance with Roaring bitmaps",
    SPE 2016); a sparse id space would add roaring's run/array
    containers on top of the same algebra.

    The oracle is a plain COUNT(DISTINCT) — two structurally unrelated
    algorithms agreeing on every day is a stronger check than
    same-formula mirroring."""
    e = _events(spark, sf_dir)
    chunks = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr("user_id DIV 64").alias("chunk"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
        ).alias("mask"),
    )
    bm = chunks.groupBy("day", "chunk").agg(
        F.expr("bit_or(mask)").alias("bits")
    )
    return bm.groupBy("day").agg(
        F.sum(F.expr("bit_count(bits)")).cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

_K_POLICIES = [2, 5, 10, 20, 50]


@register(
    "k_anonymity_audit",
    f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS csize
      FROM customer GROUP BY 1, 2),
    ks AS (SELECT * FROM (VALUES {", ".join(f"({k})" for k in _K_POLICIES)})
           AS t(k))
    SELECT CAST(k AS BIGINT) AS k,
           count(*) AS n_classes,
           CAST(sum(CASE WHEN csize < k THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_classes,
           CAST(sum(CASE WHEN csize < k THEN csize ELSE 0 END) AS BIGINT)
             AS rows_at_risk
    FROM cls CROSS JOIN ks GROUP BY k
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney, IJUFKS 2002) over the quasi-identifier
    tuple (nation, market segment): for each policy k in {2,5,10,20,50},
    the number of equivalence classes smaller than k and the rows they
    expose — the release gate a privacy review runs before publishing a
    training corpus keyed on user attributes (the right-to-forget scrub
    in workload_temporal.py is the deletion half of the same hygiene).

    Scale: ONE data-sized shuffle (groupBy to class sizes); the k-policy
    relation is 5 constant rows attached via broadcast nested loop
    (never a CartesianProduct over data), and the final rollup
    aggregates the class relation, which is bounded by the QI domain."""
    c = _t(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("csize")
    )
    ks = spark.createDataFrame([(k,) for k in _K_POLICIES], "k long")
    j = classes.crossJoin(F.broadcast(ks))
    return j.groupBy("k").agg(
        F.count("*").alias("n_classes"),
        F.sum(F.when(F.col("csize") < F.col("k"), 1).otherwise(0))
        .cast("long")
        .alias("violating_classes"),
        F.sum(F.when(F.col("csize") < F.col("k"), F.col("csize")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )
