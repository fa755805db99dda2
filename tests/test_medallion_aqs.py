"""End-to-end medallion test on AQS-shaped data: the reference's actual
Bronze → Silver → Gold pipeline run against a synthetic bronze fixture
with the edge cases the reference's data exhibits (trailing whitespace
in pollutant_standard, invalid validity rows, null aqi, duplicate
natural keys, null cbsa/method codes)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.buckets import aqi_category
from air_quality_etl_pipeline_spark.plans.gold import star_join, surrogate_key
from air_quality_etl_pipeline_spark.plans.merge import merge_insert_if_absent
from air_quality_etl_pipeline_spark.plans.silver import (
    MEASUREMENT_PK,
    silver_admin_area,
    silver_cbsa,
    silver_measurement,
    silver_method,
    silver_parameter,
    silver_site,
)
from air_quality_etl_pipeline_spark.schemas import AQS_DAILY


def _bronze_row(**overrides):
    base = {
        "state_code": "06",
        "county_code": "001",
        "site_number": "0001",
        "parameter_code": 88101,
        "poc": 1,
        "latitude": 37.0,
        "longitude": -122.0,
        "datum": "WGS84",
        "parameter": "PM2.5",
        "sample_duration": "24 HOUR",
        "pollutant_standard": "PM25 24-hour 2024",
        "date_local": datetime.date(2024, 1, 6),
        "units_of_measure": "ug/m3",
        "event_type": "None",
        "observation_count": 24,
        "observation_percent": 100.0,
        "validity_indicator": "Y",
        "arithmetic_mean": 12.5,
        "first_max_value": 30.0,
        "first_max_hour": 8,
        "aqi": 52,
        "method_code": 170,
        "method": "FEM",
        "local_site_name": "Site A",
        "site_address": "1 Main St",
        "state": "California",
        "county": "Alameda",
        "city": "Oakland",
        "cbsa_code": "36084",
        "cbsa": "Oakland",
        "date_of_last_change": datetime.date(2024, 2, 1),
    }
    base.update(overrides)
    return tuple(base[f.name] for f in AQS_DAILY.fields)


@pytest.fixture(scope="module")
def bronze(spark):
    rows = [
        _bronze_row(),
        # duplicate natural key, later poc — dedup keeps deterministic first
        _bronze_row(poc=2, arithmetic_mean=13.0),
        # trailing whitespace in the standard: must survive via trim (X1)
        _bronze_row(
            site_number="0002",
            pollutant_standard="Ozone 8-hour 2015   ",
            parameter_code=44201,
            parameter="Ozone",
            aqi=130,
            method_code=None,
            method=None,
            cbsa_code=None,
            cbsa=None,
        ),
        # invalid: validity flag N → dropped
        _bronze_row(site_number="0003", validity_indicator="N"),
        # invalid: null aqi → dropped
        _bronze_row(site_number="0004", aqi=None),
        # unknown pollutant standard → dropped by the IN-list (F1)
        _bronze_row(site_number="0005", pollutant_standard="Lead 3-month 2009"),
        # second state for the admin/site lookups
        _bronze_row(
            state_code="36",
            county_code="061",
            site_number="0010",
            state="New York",
            county="New York",
            city="NYC",
            aqi=165,
            date_local=datetime.date(2024, 1, 7),
        ),
    ]
    return spark.createDataFrame(rows, AQS_DAILY)


def test_silver_measurement_filters_and_dedups(bronze):
    m = silver_measurement(bronze)
    rows = m.collect()
    # 3 valid distinct keys: CA 0001 (deduped from 2), CA 0002 (trimmed
    # standard), NY 0010; invalid/unknown-standard rows dropped
    assert len(rows) == 3
    by_site = {r["site_number"]: r for r in rows}
    assert by_site["0001"]["poc"] == 1  # deterministic survivor
    assert by_site["0002"]["pollutant_standard"] == "Ozone 8-hour 2015"
    assert dict(m.dtypes)["aqi"] == "int"
    assert dict(m.dtypes)["date_local"] == "date"


def test_silver_lookups(bronze):
    assert silver_site(bronze).count() == 6  # 6 distinct site keys
    assert silver_admin_area(bronze).count() == 2
    assert silver_cbsa(bronze).count() == 1  # null cbsa dropped
    assert {r["parameter_code"] for r in silver_parameter(bronze).collect()} == {
        88101,
        44201,
    }
    assert silver_method(bronze).count() == 1  # null method dropped


def test_gold_star_from_silver(bronze):
    m = silver_measurement(bronze)
    dim_param = surrogate_key(
        silver_parameter(bronze), ["parameter_code"], "parameter_key"
    )
    dim_site = surrogate_key(
        silver_site(bronze),
        ["state_code", "county_code", "site_number"],
        "location_key",
    )
    fact = star_join(
        m,
        [
            (dim_param.select("parameter_code", "parameter_key"),
             ["parameter_code"], "left"),
            (dim_site.select("state_code", "county_code", "site_number",
                             "location_key"),
             ["state_code", "county_code", "site_number"], "left"),
        ],
    ).withColumn("aqi_category", aqi_category(F.col("aqi")))
    rows = {r["site_number"]: r for r in fact.collect()}
    assert len(rows) == 3
    assert all(r["parameter_key"] is not None for r in rows.values())
    assert all(r["location_key"] is not None for r in rows.values())
    assert rows["0001"]["aqi_category"] == "Moderate"  # aqi 52
    assert rows["0002"]["aqi_category"] == "Unhealthy for Sensitive Groups"
    assert rows["0010"]["aqi_category"] == "Unhealthy"  # aqi 165


def test_incremental_merge_on_measurement(bronze, spark):
    m = silver_measurement(bronze)
    # re-running the merge with the same source is a no-op
    merged = merge_insert_if_absent(m, m, MEASUREMENT_PK)
    assert merged.count() == m.count()
    # a new day's row is inserted, existing keys untouched
    new_day = silver_measurement(
        spark.createDataFrame(
            [_bronze_row(date_local=datetime.date(2024, 1, 8))], AQS_DAILY
        )
    )
    merged2 = merge_insert_if_absent(m, m.unionByName(new_day), MEASUREMENT_PK)
    assert merged2.count() == m.count() + 1
