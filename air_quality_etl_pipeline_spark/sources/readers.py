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


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV ingest that QUARANTINES malformed rows instead of dropping
    or dying on them: returns ``(clean_rows, corrupt_rows)``.

    PERMISSIVE mode parses what it can and lands the raw text of any
    row that doesn't fit the declared schema in ``_corrupt_record`` —
    the generalization of the reference's try/except-and-skip schema
    guard (``automated_ingestion...py:202-206`` in the reference repo),
    except nothing is silently lost: the quarantine side is a real
    DataFrame a pipeline can count (gate), persist (triage), or replay
    after a schema fix. One scan serves both sides.
    """
    full = f"{schema_ddl}, _corrupt_record STRING"
    df = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full)
        .csv(path)
        .cache()  # one scan; both filters read the parsed relation
    )
    clean = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, corrupt


def cast_columns(df: DataFrame, types: dict[str, str]) -> DataFrame:
    """TransformColumnTypes: explicit per-column casts, everything else
    untouched."""
    return df.select(
        *[
            F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
            for c in df.columns
        ]
    )
