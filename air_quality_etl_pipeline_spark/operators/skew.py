"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. These operators are
the *plan-level* tools for the cases AQE can't fix:

* ``salted_join`` — when one join key dominates (a "hot key"), every
  row with that key lands in one task no matter how AQE splits files.
  Salting shards the hot key's rows across ``buckets`` tasks by
  joining on ``(key, salt)``, with the build side replicated once per
  salt value.
* ``two_phase_agg`` — a skewed ``groupBy`` key concentrates one
  reducer; pre-aggregating on ``(key, salt)`` spreads the combine work,
  then a second (now small) aggregation merges partials. Only valid
  for algebraic aggregates (sum/count/min/max — anything with an
  associative merge).

Both rewrites are result-identical to their naive forms — the
``skew_salted_join`` workload query proves it against the plain-join
oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic row salt in ``[0, buckets)``: built from the
    row-identity counter (`monotonically_increasing_id`), so the SAME
    join/group key still spreads across buckets — hashing the key
    itself would defeat the purpose."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )


def replicate_per_salt(
    df: DataFrame, buckets: int, salt_col: str = "__salt"
) -> DataFrame:
    """Explode the (small) build side once per salt value so every
    ``(key, salt)`` probe finds its match. Costs ``buckets ×`` the build
    side — keep the build side the small one."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-proof equi join: salt the big side, replicate the small
    side, join on ``keys + salt``. Result-identical to
    ``big.join(small, on, how)`` for every join type that preserves
    only BIG-side rows (inner/left/left_semi/left_anti).

    Right/full outer joins are REJECTED: the small side is replicated
    once per salt value, so an unmatched small row would surface
    ``buckets`` times instead of once. Salt the other side (swap the
    arguments and mirror the join type) for those. ``cross`` is also
    REJECTED: this operator always joins on ``keys + salt``, so a
    'cross' request would silently degenerate to an inner equi join.
    """
    if how == "cross":
        raise ValueError(
            "salted_join(how='cross') is not supported: the operator "
            "joins on keys + salt, so 'cross' would silently become "
            "an inner equi join; use big.crossJoin(small) directly "
            "(replicate-and-salt buys nothing for a cartesian)"
        )
    if how.replace("outer", "").strip("_") in ("right", "full", ""):
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched "
            "small-side rows once per salt replica; swap the sides "
            "and use the mirrored join type instead"
        )
    salted_big = with_salt(big, buckets)
    salted_small = replicate_per_salt(small, buckets)
    return salted_big.join(
        salted_small, on=[*on, "__salt"], how=how
    ).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    partials: Sequence[tuple[Column, str, Column]],
    buckets: int = 8,
) -> DataFrame:
    """Skew-proof aggregation. *partials* is a list of
    ``(partial_agg_expr, alias, final_merge_expr)`` where the merge expr
    references the alias — e.g. ``(F.sum("x"), "s", F.sum("s"))`` or
    ``(F.count("*"), "c", F.sum("c"))``."""
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(alias) for expr, alias, _ in partials]
    )
    return phase1.groupBy(*group_cols).agg(
        *[merge.alias(alias) for _, alias, merge in partials]
    )
