"""Readers (SURVEY §2.1 S5-S7).

Parquet scans and managed-table scans are stock Spark (the reference
uses them verbatim); the CSV reader reproduces the Power Query shape —
``Csv.Document`` → ``PromoteHeaders`` → ``TransformColumnTypes``
(reference: ``Population Dataflow.Dataflow/mashup.pq:12-14``) — as
header-aware reads plus explicit typed casts.

Scan hygiene at 100 TB: always pass a declared schema (no inference
pass) and keep filters/projections directly on the scan DataFrame so
Catalyst pushes predicates into the parquet reader (``PushedFilters``)
and prunes partition directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S5: hive-partitioned parquet scan; partition columns come from
    the directory layout and prune on partition-column predicates."""
    return spark.read.parquet(path)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """S6: managed-table scan."""
    return spark.table(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """S7: CSV with header promotion. Prefer a declared *schema*;
    without one, columns arrive as strings for :func:`cast_columns`
    (the PromoteHeaders → TransformColumnTypes sequence)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.csv(path)


def cast_columns(df: DataFrame, types: dict[str, str]) -> DataFrame:
    """TransformColumnTypes: explicit per-column casts, everything else
    untouched."""
    return df.select(
        *[
            F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
            for c in df.columns
        ]
    )
