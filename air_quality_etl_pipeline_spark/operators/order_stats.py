"""Exact distributed order statistics — global row numbers, ordered
running sums, and sequence-gap (gaps-and-islands) detection — WITHOUT
a single-partition global sort and WITHOUT driver-side collects.

Spark's ``Window.orderBy(...)`` with no ``partitionBy`` moves every row
to ONE partition (the ``WindowExec: No Partition Defined`` warning):
correct at test scale, a non-starter at 100 TB. These operators keep
the exact semantics with a fully declarative two-pass formulation:

1. tag every row with a DETERMINISTIC, DATA-INDEPENDENT quantized key
   ``__oq`` that is non-strictly monotone in the ordering key (see
   :func:`_with_quant_key` — octave + 16-bit mantissa prefix, built from
   floor / division-by-powers-of-two / integer ``pow`` only, every
   step an EXACT IEEE-754 operation, so monotonicity is guaranteed,
   not merely "libm is probably monotone");
2. aggregate one summary relation ``groupBy(__oq) → (count, sum)``.
   Its size is bounded by ``min(distinct keys, quantization universe)``
   — the universe is a hard data-independent constant (≈ 1.39 × 10⁸
   for the full double range; real keys populate a few hundred to a
   few thousand groups) — and NEVER by the data, so exclusive-prefix
   offsets, count-balanced bucket ids, and grand totals are computed
   with ordinary windows OVER THE SUMMARY and the whole thing stays
   one lazy plan: no ``collect()``, no driver round-trips, nothing
   for a 1000-executor cluster to serialize through one process;
3. collapse the summary to BUCKET grain (≤ ``num_ranges`` rows), fold
   it into one row holding a sorted ``(first group, bucket, offsets)``
   array, attach it with a one-row broadcast cross join, and resolve
   each row's bucket with an O(num_ranges) sorted-array probe — then
   rank / cumulate WITHIN each bucket with an ordinary partitioned
   window and add the per-bucket offset.

Cost shape: TWO passes over the input (summary aggregation, windowed
pass) — down from three in the collect-based formulation this module
replaced in round 5 — and one data shuffle (the ``__obkt`` window
exchange), same as before. Buckets are COUNT-BALANCED from the summary
prefix counts (each bucket targets ``n / num_ranges`` rows), which
beats fixed-width ranges under skew: a heavy band caps its bucket at
``target + band`` rows instead of dragging neighbours along with it.
A 100 %-tied key still collapses to one bucket — forced by exactness,
ties must share a bucket — and only parallelism degrades, never
correctness.

To avoid paying the input subquery twice, the operators
``localCheckpoint`` it by default (``materialize=True``): one
materialization of the narrow relation on the executors
(MEMORY_AND_DISK, spill-safe), then both passes read the materialized
blocks. ``localCheckpoint`` rather than ``.cache()`` deliberately —
Spark's cache manager matches by analyzed plan, so a cached input
would silently serve REBUILT copies of the same query (bench honesty)
and pile up entries; checkpointed blocks are owned by the DataFrame
and GC'd with it. Pass ``materialize=False`` for inputs too large to
materialize (correctness still holds — ``__oq`` is a pure function of
row values, so re-evaluation cannot disagree with itself — you just
pay the subquery twice).

Monotonicity contract: the bucket key must be numeric and NON-STRICTLY
monotone in the intended global order (``a ≺ b ⇒ key(a) ≤ key(b)``).
Ties in the key land in the same quantized group by construction, and
the within-bucket window applies the exact (total) ordering — so lossy
monotone keys are fine: a ``double`` cast of a decimal, or the leading
60 bits of a hex digest for lexicographic string order.

Null keys: by default nulls quantize BELOW every value (Spark's
ascending windows order NULLS FIRST). Callers ranking DESCENDING via a
negated key must pass ``nulls_last=True`` when null keys are possible:
Spark's ``desc()`` default is NULLS LAST, so a null-key row belongs
globally last, not first (round-4 advisor note — no current caller can
produce a null key; the flag makes the contract explicit instead of
latent). NaN quantizes with +Infinity (Spark orders NaN above +Inf;
sharing a group is fine — the within-bucket window separates them).

Resolution note: the quantized key resolves ~1.5 × 10⁻⁵ RELATIVE key
width (2⁻¹⁶ per octave). Keys whose entire span is narrower than that
— e.g. timestamps covering less than ~½ day at epoch-seconds magnitude
— collapse into few groups and hence few buckets: exact always, but
parallelism degrades. Pre-shift such keys toward zero (``key − const``)
to restore resolution; none of the registered callers need it (their
keys are prices, counts, ids, md5 prefixes, or multi-month timestamps).

No reference-repo counterpart (the reference's engine sorts on one
node); this module exists so the analytics queries that NEED global
order — Gini, Pareto/ABC shares, position-based quantiles, sweep-line
concurrency, id-sequence audits, batch packing — survive a
1000-executor scale-up.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_global_rank",
    "with_running_sum",
    "sequence_gaps",
    "hex_prefix_key",
]

#: Mantissa-prefix bands per octave: 2^12 bands → ~2.4e-4 relative
#: resolution; universe = ~2100 octaves × 4096 ≈ 8.6e6 possible
#: groups (hard, data-independent bound on the summary relation).
#: 4096/octave balances summary cost against resolution: real keys
#: populate at most a few tens of thousands of groups (each summary
#: row costs hash-aggregate + one bounded sort slot), while a key
#: spanning even 1 % of one octave still yields ~40 groups — enough
#: to balance the default 32 buckets.
_MANTISSA_BANDS = 1 << 12

#: Quantized-key sentinels. Finite keys map inside ±(1023+1100)·2^12 ≈
#: ±8.7e6; non-finite keys take literals strictly outside that range,
#: ordered the way Spark orders them: null < −Inf < finite < +Inf ≈ NaN
#: (NaN shares the +Inf group; the within-bucket window separates them).
_Q_INF = 20_000_000
_Q_NULL = 20_000_001


def _sum_type(dt):
    """The result type of Spark's SUM aggregate over *dt* — what the
    running sum and its grand total must be cast to so empty and
    non-empty inputs share one schema."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return T.DecimalType(min(38, dt.precision + 10), dt.scale)
    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return T.LongType()
    return T.DoubleType()


def hex_prefix_key(col: Column) -> Column:
    """A bigint bucket key that is non-strictly monotone in the
    LEXICOGRAPHIC order of a lowercase hex string (e.g. an md5 digest):
    the leading 15 hex digits (60 bits) parsed as an integer. Equal
    prefixes collapse to one group; the within-bucket window breaks
    them with the full string."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("bigint")


def _with_quant_key(
    df: DataFrame,
    key: Column,
    out: str = "__oq",
    nulls_last: bool = False,
) -> DataFrame:
    """Attach a bigint quantization of *key* that is EXACTLY
    non-strictly monotone and data-independent: ``sign · ((octave +
    1100) · 2¹⁶ + mantissa-prefix)``.

    Exactness argument (every step is a correctly-rounded IEEE-754
    operation whose composition is monotone, or exact outright):

    - ``e₀ = floor(log2(|x|))`` may wobble ±1 ulp near powers of two,
      so it is CORRECTED against ``p₀ = 2^e₀`` (exact — ``pow`` of an
      integral exponent yields the representable power of two): after
      the one-step correction the effective ``p = 2^e`` satisfies
      ``p ≤ |x| < 2p`` exactly. ``log2`` cannot be off by 2 (double
      log error ~1e-13 absolute over the ±1100 range), so one step
      suffices.
    - ``m = (|x| / p₀) · f`` with ``f ∈ {2, 1, ½}`` — division and
      multiplication by powers of two are EXACT, so ``m ∈ [1, 2)``
      holds bit-for-bit.
    - ``m − 1 ∈ [0, 1)`` is exact (Sterbenz), ``× 2¹⁶`` is exact
      (power-of-two scale), ``floor`` is exact → the mantissa prefix
      is the TRUE leading 16 fraction bits.

    So equal doubles always share a group and ``a < b`` can never map
    ``a`` above ``b`` — unlike a transcendental compression (asinh /
    log alone), whose 1-ulp non-monotonicity at band edges could
    misorder near-equal keys across a bucket boundary.

    Built as a CHAIN of intermediate columns, not one nested
    expression: Spark's subexpression elimination skips anything
    inside conditional branches, so a single CASE tree re-evaluates
    ``log2``/``pow`` per occurrence (~6× per row, measured ~660 ns/row
    at sf0.1). CollapseProject keeps a non-cheap alias that is
    referenced more than once as its own projection, so whole-stage
    codegen binds each intermediate to a local evaluated ONCE per row;
    the sentinel thin-CASE up front makes every intermediate safe to
    evaluate unconditionally on all rows (no log(0)/floor(Inf) under
    ANSI). Sentinel rows compute a garbage-but-finite key the final
    CASE discards.

    Nulls map below everything by default (ascending windows order
    NULLS FIRST); ``nulls_last=True`` maps them above everything for
    callers ranking descending via a negated key (Spark ``desc()``
    defaults to NULLS LAST)."""
    inf = float("inf")
    kd = key.cast("double")
    sentinel = (
        kd.isNull()
        | F.isnan(kd)
        | (kd == F.lit(inf))
        | (kd == F.lit(-inf))
        | (kd == F.lit(0.0))
    )
    df = df.withColumn("__qk", kd)
    df = df.withColumn(
        "__qax",
        F.when(sentinel, F.lit(1.0)).otherwise(F.abs(F.col("__qk"))),
    )
    df = df.withColumn("__qe0", F.floor(F.log2("__qax")))
    df = df.withColumn(
        "__qp0", F.pow(F.lit(2.0), F.col("__qe0").cast("double"))
    )
    df = df.withColumn(
        "__qdn", (F.col("__qax") < F.col("__qp0")).cast("bigint")
    )
    df = df.withColumn(
        "__qup",
        (F.col("__qax") >= F.col("__qp0") + F.col("__qp0")).cast(
            "bigint"
        ),
    )
    m = (F.col("__qax") / F.col("__qp0")) * (
        F.lit(1.0)
        + F.col("__qdn").cast("double")
        - F.col("__qup").cast("double") * F.lit(0.5)
    )
    df = df.withColumn(
        "__qpos",
        (
            F.col("__qe0") - F.col("__qdn") + F.col("__qup") + F.lit(1100)
        )
        * F.lit(_MANTISSA_BANDS)
        + F.floor((m - F.lit(1.0)) * F.lit(float(_MANTISSA_BANDS))),
    )
    q_null = F.lit(_Q_NULL if nulls_last else -_Q_NULL)
    qk = F.col("__qk")
    df = df.withColumn(
        out,
        F.when(qk.isNull(), q_null)
        .when(F.isnan(qk) | (qk == F.lit(inf)), F.lit(_Q_INF))
        .when(qk == F.lit(-inf), F.lit(-_Q_INF))
        .when(qk == F.lit(0.0), F.lit(0))
        .when(qk > 0, F.col("__qpos"))
        .otherwise(-F.col("__qpos") - 1)
        .cast("bigint"),
    )
    return df.drop(
        "__qk", "__qax", "__qe0", "__qp0", "__qdn", "__qup", "__qpos"
    )


def _bucket_table(
    df: DataFrame,
    key: Column,
    value: Column,
    num_ranges: int | None,
    materialize: bool = True,
    nulls_last: bool = False,
):
    """Phases 1+2, shared by every operator here, as ONE lazy plan:
    tag rows with the quantized group ``__oq`` (BEFORE the optional
    ``localCheckpoint``, so the quantization expression evaluates once
    per row total — both passes read the materialized column),
    aggregate the summary ``groupBy(__oq) → (count, sum(value))``,
    derive — with windows over the SUMMARY relation only — the
    exclusive prefix count/value-sum per group and a count-balanced
    bucket id ``floor(prefix_count / ceil(n / num_ranges))``, then
    COLLAPSE to bucket grain (≤ ``num_ranges`` rows) and fold the
    whole bucket table into ONE row:

    - ``__bmap``: sorted array of ``(first __oq, bucket id, exclusive
      row offset, exclusive value offset)`` structs,
    - ``__tn`` / ``__ts``: the grand total count / value-sum (so
      Pareto denominators and median positions ride along with zero
      extra passes).

    The one-row table is attached to the data with a broadcast
    nested-loop cross join (broadcasting ≤ ``num_ranges`` structs —
    the same driver traffic the collect-based formulation shipped as
    expression literals, minus the two driver round-trip jobs), and
    each row finds its bucket with an O(num_ranges) sorted-array
    probe: ``size(filter(__bmap, e → e.q ≤ __oq)) − 1``.

    The summary windows are unpartitioned but BY CONSTRUCTION BOUNDED:
    the relation under them has at most ``min(distinct keys,
    quantization universe)`` rows — a data-independent constant —
    which is the exception the plan fences recognize by the ``__oq`` /
    ``__obkt`` sort keys (tests/test_plan_quality.py).

    Returns ``(bucketed, one_row)``. On empty input the global
    aggregate still yields one row (empty ``__bmap``) and the cross
    join of zero data rows stays empty, so every downstream schema
    falls out naturally with no build-time emptiness probe."""
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = int(
            spark.conf.get("spark.sql.shuffle.partitions", "8")
        )
    df = _with_quant_key(df, key, "__oq", nulls_last=nulls_last)
    if materialize:
        df = df.localCheckpoint(eager=False)
    s = df.groupBy("__oq").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value).alias("__s"),
    )
    wq = Window.orderBy("__oq")
    prev = wq.rowsBetween(Window.unboundedPreceding, -1)
    full = wq.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = s.select(
        "__oq",
        F.coalesce(F.sum("__n").over(prev), F.lit(0)).alias("__cn"),
        F.coalesce(F.sum("__s").over(prev), F.lit(0)).alias("__cs"),
        F.sum("__n").over(full).alias("__tn"),
        F.sum("__s").over(full).alias("__ts"),
    )
    # ceil via double is exact to 2^53 rows; a 1-ulp slip would only
    # nudge bucket BALANCE, never correctness (offsets are per-bucket
    # exact sums regardless of how groups were sliced into buckets)
    target = F.greatest(
        F.ceil(F.col("__tn") / F.lit(num_ranges)), F.lit(1)
    )
    s = s.withColumn(
        "__obkt", F.floor(F.col("__cn") / target).cast("int")
    )
    # per-group BUCKET offsets without a new exchange: "first group of
    # its bucket" is lag(__obkt) != __obkt over the SAME window spec
    # (the summary is already sorted by __oq in one bounded
    # partition), and the bucket's exclusive offsets — that first
    # group's __cn / __cs — propagate forward to every group of the
    # bucket with last_value(..., ignoreNulls) over the cumulative
    # frame: still the same partitioning, still one window stage
    first = F.lag("__obkt").over(wq).isNull() | (
        F.lag("__obkt").over(wq) != F.col("__obkt")
    )
    cum = wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mapping = s.select(
        "__oq",
        "__obkt",
        F.last(F.when(first, F.col("__cn")), ignorenulls=True)
        .over(cum)
        .alias("__boffn"),
        F.last(F.when(first, F.col("__cs")), ignorenulls=True)
        .over(cum)
        .alias("__boffs"),
        "__tn",
        "__ts",
    )
    return df, mapping


def _attach_bucket(bucketed: DataFrame, mapping: DataFrame) -> DataFrame:
    """Broadcast-hash-join the summary-sized per-group map back onto
    the data on the materialized ``__oq`` column — a codegen'd probe
    of a bounded build side (explicitly ``F.broadcast`` so AQE can
    never fall back to shuffling the data on ``__oq``)."""
    return bucketed.join(F.broadcast(mapping), "__oq")


_HELPER_COLS = (
    "__oq", "__obkt", "__boffn", "__boffs", "__tn", "__ts",
)


def with_global_rank(
    df: DataFrame,
    key: Column,
    order_cols: Sequence[Column],
    out_col: str = "rn",
    num_ranges: int | None = None,
    materialize: bool = True,
    total_col: str | None = None,
    nulls_last: bool = False,
) -> DataFrame:
    """Exact global ``row_number()`` in ``order_cols`` order without a
    single-partition sort. *key* must be numeric and non-strictly
    monotone in that order (see module contract); *order_cols* is the
    exact within-bucket ordering (include tiebreakers for determinism —
    with value-only ordering the rank→value mapping is still exact,
    only the tie assignment floats). Pass ``nulls_last=True`` when
    ranking descending (negated key) and null keys are possible.

    ``total_col`` (optional) attaches the GLOBAL row count as a long
    column — it rides the summary's grand total, so median positions /
    decile cut ranks / Pareto denominators cost zero extra passes (a
    separate ``count()`` would re-execute the input end to end)."""
    bucketed, one_row = _bucket_table(
        df, key, F.lit(1), num_ranges, materialize, nulls_last
    )
    out = _attach_bucket(bucketed, one_row)
    w = Window.partitionBy("__obkt").orderBy(*order_cols)
    out = out.withColumn(
        out_col,
        (
            F.row_number().over(w).cast("long")
            + F.col("__boffn").cast("long")
        ).cast("long"),
    )
    if total_col is not None:
        out = out.withColumn(
            total_col, F.coalesce(F.col("__tn"), F.lit(0)).cast("long")
        )
    return out.drop(*_HELPER_COLS)


def with_running_sum(
    df: DataFrame,
    key: Column,
    order_cols: Sequence[Column],
    value_col: str,
    out_col: str = "cum",
    num_ranges: int | None = None,
    materialize: bool = True,
    total_col: str | None = None,
    nulls_last: bool = False,
) -> DataFrame:
    """Exact inclusive running sum of *value_col* in ``order_cols``
    order (ROWS UNBOUNDED PRECEDING .. CURRENT ROW frame) without a
    single-partition sort. The sum keeps *value_col*'s own type —
    decimal stays decimal-exact through both the window and the
    summary-derived per-bucket offsets.

    ``total_col`` (optional) attaches the GLOBAL sum of *value_col* —
    the summary's grand total (decimal stays decimal), so
    share-of-total denominators cost zero extra passes.

    Output typing: ``out_col`` and ``total_col`` are cast to the SUM
    type of *value_col* (Spark's aggregate widening: decimal(p,s) →
    decimal(min(38, p+10), s), integrals → long, floats → double), so
    the schema is identical on empty and non-empty inputs."""
    sum_type = _sum_type(df.schema[value_col].dataType)
    bucketed, one_row = _bucket_table(
        df, key, F.col(value_col), num_ranges, materialize, nulls_last
    )
    out = _attach_bucket(bucketed, one_row)
    w = (
        Window.partitionBy("__obkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(
        out_col,
        (F.sum(value_col).over(w) + F.col("__boffs")).cast(sum_type),
    )
    if total_col is not None:
        out = out.withColumn(
            total_col,
            F.coalesce(F.col("__ts"), F.lit(0)).cast(sum_type),
        )
    return out.drop(*_HELPER_COLS)


def sequence_gaps(
    df: DataFrame,
    id_col: str,
    num_ranges: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Gaps-and-islands at scale: for a DISTINCT integer id relation,
    return one row per gap — ``(id, next_id)`` where ``next_id`` is the
    next present id and ``next_id − id > 1`` — without a global sort.

    Two-phase ``lead()`` with boundary stitching, zero collects:
    ids bucket by the quantized key, ``lead`` runs within each bucket
    (covering every intra-bucket group seam), and the cross-BUCKET
    seams come from the per-bucket ``(min, max)`` summary — derived
    from the same ``groupBy(__oq)`` aggregate, with a ``lead`` over the
    bucket-grain relation (``≤ num_ranges`` rows). Empty buckets
    cannot exist (buckets are carved from populated groups), so the
    seam lead never skips ids."""
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = int(
            spark.conf.get("spark.sql.shuffle.partitions", "8")
        )
    df = df.select(F.col(id_col).cast("bigint").alias(id_col))
    bucketed = _with_quant_key(df, F.col(id_col), "__oq")
    if materialize:
        bucketed = bucketed.localCheckpoint(eager=False)
    s = bucketed.groupBy("__oq").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(id_col).alias("__mn"),
        F.max(id_col).alias("__mx"),
    )
    wq = Window.orderBy("__oq")
    prev = wq.rowsBetween(Window.unboundedPreceding, -1)
    full = wq.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = s.select(
        "__oq",
        "__mn",
        "__mx",
        F.coalesce(F.sum("__n").over(prev), F.lit(0)).alias("__cn"),
        F.sum("__n").over(full).alias("__tn"),
    )
    target = F.greatest(
        F.ceil(F.col("__tn") / F.lit(num_ranges)), F.lit(1)
    )
    s = s.withColumn(
        "__obkt", F.floor(F.col("__cn") / target).cast("int")
    )
    # all bucket-boundary work rides the SAME sorted summary partition
    # (lead over wq — no groupBy exchange, no extra sort): a seam gap
    # is an adjacent-group pair in DIFFERENT buckets with missing ids
    # between them (same-bucket pairs are covered by the data-side
    # lead), and the bucket lookup is a broadcast join on __oq
    s = s.withColumn("__nbkt", F.lead("__obkt").over(wq)).withColumn(
        "__nmn", F.lead("__mn").over(wq)
    )
    seams = s.filter(
        (F.col("__nbkt") != F.col("__obkt"))
        & (F.col("__nmn") - F.col("__mx") > 1)
    ).select(
        F.col("__mx").alias(id_col), F.col("__nmn").alias("next_id")
    )
    joined = bucketed.join(
        F.broadcast(s.select("__oq", "__obkt")), "__oq"
    )
    wd = Window.partitionBy("__obkt").orderBy(id_col)
    intra = (
        joined.withColumn("next_id", F.lead(id_col).over(wd))
        .filter(F.col("next_id") - F.col(id_col) > 1)
        .select(id_col, "next_id")
    )
    return intra.unionByName(seams)
