"""Incremental upsert (MERGE) semantics — pure-Spark formulation.

The reference's automated path upserts dims and fact with Delta
``MERGE ... WHEN NOT MATCHED INSERT`` after an anti-join and a
high-water-mark re-key (``Notebooks/Automated_Silver_to_Gold.Notebook/
notebook-content.py:271-394``). Delta isn't a hard dependency here: the
insert-if-absent MERGE is exactly ``target ∪ (source ⟕anti target)``,
which we implement with built-ins; when ``delta-spark`` is importable
the same API routes to a real ``DeltaTable.merge``.

Scale notes: the anti-join shuffles on the natural key — same cost
class as MERGE's inner join; the high-water mark is a scalar agg
(one collect of one value, reference A3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.plans.gold import surrogate_key


def high_water_mark(df: DataFrame, key_col: str) -> int:
    """A3 — ``agg(max(key)).collect()[0][0] or 0``."""
    v = df.agg(F.max(key_col)).first()[0]
    return int(v) if v is not None else 0


def new_rows(source: DataFrame, target: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D3/J8 — rows of *source* whose natural key is absent from *target*."""
    return source.join(target.select(*keys), on=list(keys), how="left_anti")


def merge_insert_if_absent(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    surrogate: str | None = None,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """K4 — insert-if-absent MERGE.

    Optionally re-keys the inserted rows with a surrogate continuing
    past the target's high-water mark (W2), like the reference's
    ``row_number().over(w) + max_key``.
    """
    fresh = new_rows(source, target, keys)
    if surrogate is not None:
        hwm = high_water_mark(target, surrogate)
        fresh = surrogate_key(fresh, order_by or list(keys), surrogate, offset=hwm)
    return target.unionByName(fresh.select(*target.columns))


def upsert_replace(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Full MERGE semantics — ``WHEN MATCHED UPDATE SET * / WHEN NOT
    MATCHED INSERT *`` — as pure Spark: source rows win wholesale on
    key match, unmatched target rows survive, unmatched source rows
    insert. Extends the reference's insert-only MERGE (K4) to the
    update case Delta expresses with ``whenMatchedUpdateAll``.

    ``source ∪ (target ⟕anti source)`` — ONE anti-join shuffle on the
    natural key (same cost class as MERGE's inner join) + a shuffle-free
    union. Requires *source* unique per key (standard MERGE
    precondition; enforce upstream with dedup_first when the feed may
    carry retractions)."""
    survivors = target.join(
        source.select(*keys), on=list(keys), how="left_anti"
    )
    return source.select(*target.columns).unionByName(survivors)


class MergeMultipleMatchesError(ValueError):
    """A target row matched more than one source row while an
    update/delete clause applies — the nondeterministic case Delta
    rejects (``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE``,
    Delta MERGE docs: "can produce unexpected results ... error")."""


def merge_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    when_matched: str | None = "update",
    matched_condition=None,
    when_not_matched: str | None = "insert",
    not_matched_condition=None,
    when_not_matched_by_source: str | None = None,
    not_matched_by_source_condition=None,
    matched_set: dict | None = None,
    not_matched_by_source_set: dict | None = None,
    check_multiple_matches: bool = True,
) -> DataFrame:
    """Delta Lake's full MERGE clause matrix as ONE pure-Spark plan —
    the general form of :func:`merge_insert_if_absent` (insert-only)
    and :func:`upsert_replace` (update+insert), written so a
    Delta-enabled cluster can swap in ``DeltaTable.merge`` behind the
    same call sites with identical results.

    Semantics per the documented matrix:

    * ``when_matched``: ``"update"`` (``WHEN MATCHED UPDATE SET *`` —
      the source row wins wholesale; pass ``matched_set`` for Delta's
      explicit-``SET`` form, ``{col: lambda t, s: expr}``, where
      UNLISTED columns keep their TARGET values), ``"delete"``, or
      ``None`` (keep the target row). ``matched_condition(t, s)``
      optionally gates the clause per row — unmatched-by-condition rows
      keep the target row, exactly Delta's fall-through.
    * ``when_not_matched``: ``"insert"`` (``WHEN NOT MATCHED INSERT
      *``) or ``None`` (drop the source-only row), gated by
      ``not_matched_condition(s)``.
    * ``when_not_matched_by_source``: ``"delete"``, ``"update"`` (takes
      ``not_matched_by_source_set`` — ``{col: lambda t: expr}``, only
      target columns visible, per Delta), or ``None`` (keep), gated by
      ``not_matched_by_source_condition(t)``.
    * Key equality is ``=`` (null keys never match either side), the
      join condition every reference MERGE uses.
    * ``check_multiple_matches``: when an update/delete clause is
      active, a target row matching >1 source rows is nondeterministic
      and Delta errors — so do we, with one bounded aggregate over the
      source's matched keys (``first()`` of a count, not a data-sized
      collect). Multiple source rows on an UNMATCHED key are fine and
      all insert, as in Delta.

    Condition callables receive struct columns (``t``, ``s``) so one
    expression can reference both sides, e.g.
    ``lambda t, s: s["updated_at"] > t["updated_at"]``.

    Scale: everything shuffles on the one natural key — the source
    key-dedup aggregate, the left join (target pass), and the
    anti-join (insert pass) share the same partitioning, so Spark
    reuses the exchange across them; the duplicate probe is an
    aggregate to one scalar on that same key. The cost class is Delta
    MERGE's own join phase. At 100 TB both sides would be bucketed by
    the key so the joins run exchange-free.
    """
    tcols = list(target.columns)
    key_list = list(keys)
    if check_multiple_matches and when_matched in ("update", "delete"):
        dup = (
            source.groupBy(*key_list)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .join(target.select(*key_list).distinct(), on=key_list)
            .agg(F.count(F.lit(1)))
            .first()[0]
        )
        if dup:
            raise MergeMultipleMatchesError(
                f"{dup} target key(s) match multiple source rows while a "
                f"when_matched={when_matched!r} clause is active"
            )
    # Target pass: LEFT join against ONE source row per key, so a
    # matched target row can never fan out — when update/delete is
    # active the duplicate probe above already guaranteed uniqueness
    # on matched keys (min(struct) is then exact, not a choice); with
    # no matched clause only key EXISTENCE matters.
    t = target.select(
        *key_list, F.struct(*[F.col(c) for c in tcols]).alias("_t")
    )
    s1 = (
        source.select(
            *key_list, F.struct(*[F.col(c) for c in tcols]).alias("_s")
        )
        .groupBy(*key_list)
        .agg(F.min("_s").alias("_s"))
    )
    j = t.join(s1, on=key_list, how="left")
    ts, ss = F.col("_t"), F.col("_s")
    matched = ss.isNotNull()

    def cond(c, *args):
        return F.lit(True) if c is None else c(*args)

    field_types = {
        f.name: f.dataType for f in j.schema["_t"].dataType.fields
    }

    def with_sets(base, sets, *cond_args):
        # Delta's explicit UPDATE SET form: listed columns take their
        # expression (cast to the target column's type, as Delta's
        # schema enforcement does), unlisted columns keep the base
        # (target) row's value
        return F.struct(
            *[
                (
                    sets[c](*cond_args).cast(field_types[c]).alias(c)
                    if c in sets
                    else base[c].alias(c)
                )
                for c in tcols
            ]
        )

    null_row = F.lit(None).cast(j.schema["_t"].dataType)
    if when_matched == "update":
        matched_value = (
            ss if matched_set is None else with_sets(ts, matched_set, ts, ss)
        )
    elif when_matched == "delete":
        matched_value = null_row
    else:
        matched_value = ts
    chooser = F.when(
        matched & cond(matched_condition, ts, ss), matched_value
    ).when(matched, ts)
    if when_not_matched_by_source == "delete":
        chooser = chooser.when(
            cond(not_matched_by_source_condition, ts), null_row
        ).otherwise(ts)
    elif when_not_matched_by_source == "update":
        if not_matched_by_source_set is None:
            raise ValueError(
                "when_not_matched_by_source='update' requires "
                "not_matched_by_source_set (Delta's UPDATE SET form; "
                "there is no source row for SET *)"
            )
        chooser = chooser.when(
            cond(not_matched_by_source_condition, ts),
            with_sets(ts, not_matched_by_source_set, ts),
        ).otherwise(ts)
    else:
        chooser = chooser.otherwise(ts)
    kept = (
        j.select(chooser.alias("_r"))
        .filter(F.col("_r").isNotNull())
        .select(*[F.col("_r")[c].alias(c) for c in tcols])
    )
    # Insert pass: ALL source rows on unmatched keys (duplicates all
    # insert, per Delta), straight from the raw source via anti-join.
    if when_not_matched == "insert":
        fresh = source.join(
            target.select(*key_list), on=key_list, how="left_anti"
        )
        if not_matched_condition is not None:
            fresh = fresh.filter(
                not_matched_condition(F.struct(*[F.col(c) for c in tcols]))
            )
        kept = kept.unionByName(fresh.select(*tcols))
    return kept


def table_diff(
    v1: DataFrame,
    v2: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot diff (the CDC primitive): classify every key as
    ``added`` / ``removed`` / ``changed`` between two versions of a
    table. Returns ``(*keys, diff_status)`` for keys that differ;
    unchanged keys are dropped.

    One full-outer join on the key plus an md5 over the compared
    columns on each side — change detection costs one hash per row,
    not a column-by-column comparison, and the join is the only
    shuffle. At 100 TB both snapshots would be bucketed by the key so
    the join runs exchange-free; the hash trick is what keeps the
    comparison O(1) per row regardless of column count.
    """
    cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in v1.columns if c not in set(keys)]
    )

    def hashed(df: DataFrame, h: str) -> DataFrame:
        return df.select(
            *keys,
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])).alias(h),
        )

    j = hashed(v1, "_h1").join(hashed(v2, "_h2"), on=list(keys), how="full_outer")
    status = (
        F.when(F.col("_h1").isNull(), F.lit("added"))
        .when(F.col("_h2").isNull(), F.lit("removed"))
        .when(F.col("_h1") != F.col("_h2"), F.lit("changed"))
    )
    return (
        j.withColumn("diff_status", status)
        .filter(F.col("diff_status").isNotNull())
        .select(*keys, "diff_status")
    )


def merge_into_table(
    spark,
    table: str,
    source: DataFrame,
    keys: Sequence[str],
) -> None:
    """MERGE into a catalog table: Delta ``merge`` when available,
    anti-join + append otherwise (identical insert-if-absent result).

    The fallback triggers ONLY when Delta is genuinely unusable —
    ``delta-spark`` not importable, or the target not a Delta table
    (``DeltaTable.forName`` raises ``AnalysisException``). A real
    Delta MERGE failure (concurrent-write conflict, multiple source
    matches, schema mismatch) propagates: silently degrading it to an
    append would hide a data bug behind a duplicate insert."""
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError:
        DeltaTable = None
    dt = None
    if DeltaTable is not None:
        from pyspark.errors import AnalysisException

        try:
            dt = DeltaTable.forName(spark, table)
        except AnalysisException:
            dt = None  # catalog table exists but is not Delta-backed
    if dt is not None:
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            dt.alias("t")
            .merge(source.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    target = spark.table(table)
    new_rows(source, target, keys).write.mode("append").saveAsTable(table)
