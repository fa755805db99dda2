"""Approximate-aggregation sketches: HLL distinct counts and t-digest
quantiles, packaged with their accuracy contracts.

At 100 TB the exact forms of these two aggregates are the expensive
ones: exact distinct is an expand + two-phase aggregate (a second
shuffle carrying every distinct value) and exact percentiles sort every
group. The sketch forms are ONE pass, partial-aggregated map-side, with
published error bounds:

* ``approx_count_distinct`` — HyperLogLog++ (Heule/Nunkesser/Hall,
  "HyperLogLog in Practice", EDBT 2013): relative standard deviation
  *rsd* configurable, fixed sketch size per group.
* ``approx_percentile`` — a positional error sketch: rank error ≤
  1/accuracy of the true rank, single pass, mergeable.

Sketch OUTPUTS are engine-specific (register layouts differ), so the
cross-engine-verifiable surface is the accuracy CONTRACT, not the raw
estimate: each operator emits the exact value alongside a 0/1 flag
"estimate within its documented tolerance", which a DuckDB oracle
reproduces by construction (the flag must be 1; the exact values hash
identically). The raw estimates stay available for callers; unit tests
pin the tighter measured error.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct_with_contract(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    rsd: float = 0.02,
    tolerance_sigmas: float = 3.0,
) -> DataFrame:
    """Per-group HLL++ distinct estimate next to the exact count →
    ``(*group_cols, exact_distinct, approx_distinct, within_tol)``.

    ``within_tol`` asserts |approx − exact| ≤ tolerance_sigmas·rsd·exact
    — the 3σ bound of the estimator's relative standard deviation. Both
    aggregates run in ONE groupBy (Catalyst plans the exact distinct as
    expand + two-phase; the HLL rides the same shuffle), so the contract
    costs nothing extra to check in audits.
    """
    tol = tolerance_sigmas * rsd
    out = df.groupBy(*group_cols).agg(
        F.countDistinct(col).cast("long").alias("exact_distinct"),
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
    )
    return out.withColumn(
        "within_tol",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.lit(tol) * F.col("exact_distinct")
        ).cast("long"),
    )


def quantile_band_contract(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    rank_pad: float = 0.01,
    accuracy: int = 10_000,
) -> DataFrame:
    """t-digest quantile estimates banded by exact percentiles →
    one row per requested probability:
    ``(p, band_lo, band_hi, within_band)``.

    ``approx_percentile(col, p, accuracy)`` guarantees a rank within
    ``1/accuracy`` of ``p``; with *rank_pad* ≫ 1/accuracy the estimate
    must land inside the exact [p−pad, p+pad] percentile band, so
    ``within_band`` is 1 by the estimator's published bound. Bands are
    exact interpolated percentiles (portable across engines); the raw
    estimate stays in the row for callers but equality is asserted on
    the contract, not the sketch output.
    """
    ps = list(probs)
    lo = [max(0.0, p - rank_pad) for p in ps]
    hi = [min(1.0, p + rank_pad) for p in ps]
    agg = df.agg(
        F.expr(
            f"approx_percentile({col}, array({', '.join(map(str, ps))}), {accuracy})"
        ).alias("ap"),
        F.expr(f"percentile({col}, array({', '.join(map(str, lo))}))").alias("lo"),
        F.expr(f"percentile({col}, array({', '.join(map(str, hi))}))").alias("hi"),
    )
    idx = F.explode(F.sequence(F.lit(0), F.lit(len(ps) - 1))).alias("i")
    rows = agg.select(F.array(*[F.lit(p) for p in ps]).alias("p_arr"), "ap", "lo", "hi").select(
        idx, "p_arr", "ap", "lo", "hi"
    )
    return rows.select(
        F.element_at("p_arr", F.col("i") + 1).alias("p"),
        F.element_at("lo", F.col("i") + 1).alias("band_lo"),
        F.element_at("hi", F.col("i") + 1).alias("band_hi"),
        F.element_at("ap", F.col("i") + 1).alias("estimate"),
    ).withColumn(
        "within_band",
        (
            (F.col("estimate") >= F.col("band_lo"))
            & (F.col("estimate") <= F.col("band_hi"))
        ).cast("long"),
    )


def kmv_jaccard(
    df: DataFrame,
    group_col: str,
    token_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values, Bar-Yossef et al. RANDOM'02) set sketches
    per group + pairwise Jaccard estimation, with the exact Jaccard
    alongside as the accuracy contract.

    The mergeable-sketch pattern that matters at 100 TB: each group's
    token set collapses to its k smallest 60-bit md5 hashes (k rows,
    ONE partial-aggregated pass — bottom-k is a per-group min-heap
    map-side), and every pairwise comparison afterwards touches only
    sketch-sized relations: J ≈ |{h ∈ bottom-K(A ∪ B)} ∩ A ∩ B| / K
    with **K = min(k, |union sketch|)** — when two small sets' merged
    sketch holds fewer than k hashes, the union sketch IS the exact
    union and a fixed-k denominator would bias the estimate toward 0
    (A = B with 10 tokens at k=64 must estimate 1.0, not 10/64).
    The exact-Jaccard columns exist for the contract check and a small
    demo corpus — at scale you'd emit only the estimates.

    Deterministic by construction (md5 order, ties impossible modulo
    60-bit collisions), so a SQL oracle reproduces it bit-for-bit.
    Returns ``(source_a, source_b, kmv_matches, kmv_jaccard,
    exact_jaccard)`` for every unordered group pair.
    """
    from air_quality_etl_pipeline_spark.functions.core import md5_long

    toks = df.select(
        F.col(group_col).alias("g"), F.col(token_col).alias("tok")
    ).distinct()
    hashed = toks.select(
        "g", md5_long(F.col("tok"), salt="kmv").alias("h")
    ).distinct()
    from pyspark.sql import Window

    wg = Window.partitionBy("g").orderBy(F.asc("h"))
    sig = (
        hashed.withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") <= k)
        .select("g", "h")
    )
    srcs = sig.select("g").distinct()
    pairs = F.broadcast(
        srcs.alias("x")
        .crossJoin(srcs.alias("y"))
        .filter(F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("a"), F.col("y.g").alias("b"))
    )
    ua = pairs.join(sig.withColumnRenamed("g", "a"), on="a").select(
        "a", "b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    ub = pairs.join(sig.withColumnRenamed("g", "b"), on="b").select(
        "a", "b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ua.union(ub)
        .groupBy("a", "b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("a", "b").orderBy(F.asc("h"))
    est = (
        merged.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= k)
        .groupBy("a", "b")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
                "kmv_matches"
            ),
            # K = min(k, |union sketch|): the kept-row count per pair
            F.count("*").cast("long").alias("_uk"),
        )
        .withColumn(
            "kmv_jaccard",
            F.col("kmv_matches").cast("double") / F.col("_uk"),
        )
        .drop("_uk")
    )
    sizes = toks.groupBy("g").agg(F.count("*").cast("long").alias("n"))
    inter = (
        toks.alias("p")
        .join(toks.alias("q"), on="tok")
        .filter(F.col("p.g") < F.col("q.g"))
        .groupBy(F.col("p.g").alias("a"), F.col("q.g").alias("b"))
        .agg(F.count("*").cast("long").alias("ninter"))
    )
    exact = (
        pairs.join(inter, on=["a", "b"], how="left")
        .join(
            F.broadcast(sizes.withColumnRenamed("g", "a")).withColumnRenamed(
                "n", "na"
            ),
            on="a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("g", "b")).withColumnRenamed(
                "n", "nb"
            ),
            on="b",
        )
        .select(
            "a",
            "b",
            (
                F.coalesce(F.col("ninter"), F.lit(0).cast("long")).cast(
                    "double"
                )
                / (
                    F.col("na") + F.col("nb")
                    - F.coalesce(F.col("ninter"), F.lit(0).cast("long"))
                )
            ).alias("exact_jaccard"),
        )
    )
    return (
        est.join(exact, on=["a", "b"])
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            "kmv_matches",
            "kmv_jaccard",
            "exact_jaccard",
        )
    )
