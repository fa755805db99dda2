"""CASE/WHEN bucketing & categorical-mapping operators (reference X7-X10,
X13-X14).

The reference hand-writes three when/otherwise chains:
* AQI category — 6 ordered buckets on thresholds 50/100/150/200/300
  (``Batch_Silver_to_Gold:219-228``) → :func:`bucketize`.
* Census region — state_code IN-lists → Northeast/Midwest/South/West
  (``Batch_Silver_to_Gold:121-140``) → :func:`map_by_lists`.
* Parameter category — code IN {88101, 81102} → "Particulate Matter"
  else "Gas" (``Batch_Silver_to_Gold:108-111``) → :func:`binary_category`.

All compile to Catalyst ``CaseWhen`` — constant-folded, codegen'd, and
pushdown-transparent; nothing here blocks pruning at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The EPA AQI breakpoints used by the reference (X7).
AQI_BUCKETS: list[tuple[int, str]] = [
    (50, "Good"),
    (100, "Moderate"),
    (150, "Unhealthy for Sensitive Groups"),
    (200, "Unhealthy"),
    (300, "Very Unhealthy"),
]
AQI_ELSE = "Hazardous"

#: Census region map (X8), state FIPS → region.
REGION_MAP: dict[str, list[str]] = {
    "Northeast": ["09", "23", "25", "33", "44", "50", "34", "36", "42"],
    "Midwest": ["17", "18", "26", "39", "55", "19", "20", "27", "29", "31", "38", "46"],
    "South": ["10", "11", "12", "13", "24", "37", "45", "51", "54",
              "01", "21", "28", "47", "05", "22", "40", "48"],
    "West": ["04", "08", "16", "30", "32", "35", "49", "56",
             "02", "06", "15", "41", "53"],
}


def bucketize(
    col: Column,
    buckets: Sequence[tuple[float, str]],
    else_label: str,
    null_label: str | None = None,
) -> Column:
    """X7 — ordered ``<=``-threshold bucketing with optional null guard
    (the batch variant null-guards, the automated one doesn't; we keep
    the guard)."""
    expr = F.when(col.isNull(), F.lit(null_label))
    for threshold, label in buckets:
        expr = expr.when(col <= threshold, F.lit(label))
    return expr.otherwise(F.lit(else_label))


def map_by_lists(
    col: Column, mapping: dict[str, Sequence[str]], default: str = "Unknown"
) -> Column:
    """X8 — label by membership in per-label IN-lists."""
    expr: Column | None = None
    for label, values in mapping.items():
        cond = col.isin(list(values))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None, "mapping must be non-empty"
    return expr.otherwise(F.lit(default))


def binary_category(
    col: Column, in_list: Sequence, label_in: str, label_out: str
) -> Column:
    """X9 — two-way categorical split on an IN-list."""
    return F.when(col.isin(list(in_list)), F.lit(label_in)).otherwise(F.lit(label_out))


def flag_threshold(col: Column, threshold: float) -> Column:
    """X10 — boolean exceedance flag (``exceeds_standard = aqi > 100``)."""
    return col > threshold


def aqi_category(col: Column) -> Column:
    """The reference's exact AQI bucket chain (X7)."""
    return bucketize(col, AQI_BUCKETS, AQI_ELSE, null_label=None)


def region_of_state(col: Column) -> Column:
    """The reference's exact census-region chain (X8)."""
    return map_by_lists(col, REGION_MAP, default="Unknown")
