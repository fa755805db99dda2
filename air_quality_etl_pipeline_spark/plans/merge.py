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
    anti-join + append otherwise (identical insert-if-absent result)."""
    try:
        from delta.tables import DeltaTable  # type: ignore

        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            DeltaTable.forName(spark, table)
            .alias("t")
            .merge(source.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )
    except Exception:
        target = spark.table(table)
        new_rows(source, target, keys).write.mode("append").saveAsTable(table)
