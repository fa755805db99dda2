"""Canonical declared schemas.

The reference's data model is a single 31-column "wide bronze row" of EPA
AQS daily measurements (declared at ``Notebooks/Batch_ingestion.Notebook/
notebook-content.py:64-106`` in the reference) plus a small population
lookup, a snowflaked silver layer, and a Kimball gold star schema whose
exact column types are spelled out in the warehouse DDLs
(``team2_WH.Warehouse/dbo/Tables/*.sql``) and the dummy-data dataflow
(``Dummy Data Upload.Dataflow/mashup.pq:14-66``).

Declared-schema-first matters at scale: schema inference is an extra full
pass over source data and silently widens types.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _field(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: The wide bronze measurement row (reference: Batch_ingestion 31-col
#: ``aqs_daily_schema``). Everything downstream is projections, filters,
#: dedup, joins and aggregates over this record plus lookups.
AQS_DAILY = StructType(
    [
        _field("state_code", StringType()),
        _field("county_code", StringType()),
        _field("site_number", StringType()),
        _field("parameter_code", IntegerType()),
        _field("poc", IntegerType()),
        _field("latitude", DoubleType()),
        _field("longitude", DoubleType()),
        _field("datum", StringType()),
        _field("parameter", StringType()),
        _field("sample_duration", StringType()),
        _field("pollutant_standard", StringType()),
        _field("date_local", DateType()),
        _field("units_of_measure", StringType()),
        _field("event_type", StringType()),
        _field("observation_count", IntegerType()),
        _field("observation_percent", DoubleType()),
        _field("validity_indicator", StringType()),
        _field("arithmetic_mean", DoubleType()),
        _field("first_max_value", DoubleType()),
        _field("first_max_hour", IntegerType()),
        _field("aqi", IntegerType()),
        _field("method_code", IntegerType()),
        _field("method", StringType()),
        _field("local_site_name", StringType()),
        _field("site_address", StringType()),
        _field("state", StringType()),
        _field("county", StringType()),
        _field("city", StringType()),
        _field("cbsa_code", StringType()),
        _field("cbsa", StringType()),
        _field("date_of_last_change", DateType()),
    ]
)

#: Census/ACS state population lookup (reference: Population Ingestion).
STATE_POPULATION = StructType(
    [
        _field("state_name", StringType()),
        _field("population", LongType()),
        _field("state_code", StringType()),
    ]
)

#: Gold dim_date (reference: dbo/Tables/dim_date.sql, 10 columns).
DIM_DATE = StructType(
    [
        _field("date_key", LongType(), False),
        _field("date", DateType()),
        _field("year", IntegerType()),
        _field("month", IntegerType()),
        _field("month_name", StringType()),
        _field("day", IntegerType()),
        _field("day_of_week", IntegerType()),
        _field("day_name", StringType()),
        _field("quarter", IntegerType()),
        _field("is_weekend", BooleanType()),
    ]
)

#: Gold fact_daily_air_quality (reference: dbo/Tables/fact_daily_air_quality.sql).
FACT_DAILY_AIR_QUALITY = StructType(
    [
        _field("fact_key", LongType(), False),
        _field("date_key", LongType()),
        _field("location_key", LongType()),
        _field("parameter_key", LongType()),
        _field("method_key", LongType()),
        _field("arithmetic_mean", DoubleType()),
        _field("first_max_value", DoubleType()),
        _field("first_max_hour", IntegerType()),
        _field("aqi", IntegerType()),
        _field("observation_count", IntegerType()),
        _field("observation_percent", DoubleType()),
        _field("aqi_category", StringType()),
        _field("exceeds_standard", BooleanType()),
    ]
)
