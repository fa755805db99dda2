"""Bronze → Silver normalization plan (reference EP2, first half).

Re-expresses ``Notebooks/Batch_Bronze_to_Silver.Notebook/
notebook-content.py:44-200`` / ``Automated_Bronze_to_Silver:46-189``:
from the wide 31-column bronze row, build the measurement fact plus five
snowflaked lookup tables (cbsa, admin_area, site, parameter, method) —
each a project → filter → deterministic-dedup pipeline.

The silver build is where data volume drops by orders of magnitude, so
filters run FIRST (pushed into the scan) and dedup runs on the narrow
projected rows, not the wide record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.cleaning import (
    dedup_first,
    keep_in,
    non_null,
    trim_cols,
    valid_rows,
)

#: The six EPA pollutant standards the reference keeps (F1,
#: ``Batch_Bronze_to_Silver:55-64``).
POLLUTANT_STANDARDS = [
    "CO 8-hour 1971",
    "NO2 1-hour 2010",
    "Ozone 8-hour 2015",
    "PM10 24-hour 2006",
    "PM25 24-hour 2024",
    "SO2 1-hour 2010",
]

#: Natural keys (D1, ``Batch_Bronze_to_Silver:104-170``).
MEASUREMENT_PK = [
    "state_code", "county_code", "site_number",
    "parameter_code", "date_local", "pollutant_standard",
]
SITE_PK = ["state_code", "county_code", "site_number"]
ADMIN_PK = ["state_code", "county_code"]


def silver_measurement(bronze: DataFrame) -> DataFrame:
    """Measurement fact: trim → standard IN-list → validity filter →
    typed casts → deterministic keyed dedup."""
    df = trim_cols(bronze, "pollutant_standard")
    df = keep_in(df, "pollutant_standard", POLLUTANT_STANDARDS)
    df = valid_rows(
        df,
        F.col("validity_indicator") == "Y",
        F.col("arithmetic_mean").isNotNull(),
        F.col("aqi").isNotNull(),
    )
    df = df.withColumns(
        {
            "parameter_code": F.col("parameter_code").cast("int"),
            "aqi": F.col("aqi").cast("int"),
            "date_local": F.col("date_local").cast("date"),
        }
    )
    keep = [
        *MEASUREMENT_PK,
        "poc", "sample_duration", "units_of_measure", "event_type",
        "observation_count", "observation_percent", "arithmetic_mean",
        "first_max_value", "first_max_hour", "aqi", "method_code",
    ]
    return dedup_first(df.select(*keep), MEASUREMENT_PK)


def silver_site(bronze: DataFrame) -> DataFrame:
    """Site lookup (3-col natural key)."""
    cols = [*SITE_PK, "latitude", "longitude", "datum",
            "local_site_name", "site_address", "city", "cbsa_code"]
    return dedup_first(bronze.select(*cols), SITE_PK)


def silver_admin_area(bronze: DataFrame) -> DataFrame:
    """State/county lookup (2-col natural key)."""
    cols = [*ADMIN_PK, "state", "county"]
    return dedup_first(bronze.select(*cols), ADMIN_PK)


def silver_cbsa(bronze: DataFrame) -> DataFrame:
    """CBSA lookup, null codes dropped (F3)."""
    df = non_null(bronze.select("cbsa_code", "cbsa"), "cbsa_code")
    return dedup_first(df, ["cbsa_code"])


def silver_parameter(bronze: DataFrame) -> DataFrame:
    """Parameter lookup."""
    df = bronze.select("parameter_code", "parameter").withColumn(
        "parameter_code", F.col("parameter_code").cast("int")
    )
    return dedup_first(df, ["parameter_code"])


def silver_method(bronze: DataFrame) -> DataFrame:
    """Method lookup, null method codes dropped."""
    df = non_null(bronze.select("method_code", "method"), "method_code")
    return dedup_first(df, ["method_code"])
