"""End-to-end demo: the reference's weekly pipeline on this engine.

Mirrors the Fabric workspace flow step by step — ingest → bronze →
silver → gold star → warehouse copy → semantic measures — on a
deterministic synthetic EPA-AQS-shaped dataset, so a user of the
reference can see where each of their notebooks / DAX measures lands
in this engine.

Run: ``python examples/aqs_demo.py`` (finishes in ~1 min on local[*]).
"""

from __future__ import annotations

import datetime
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.buckets import (
    aqi_category,
    flag_threshold,
    region_of_state,
)
from air_quality_etl_pipeline_spark.operators.dates import with_date_parts
from air_quality_etl_pipeline_spark.plans import metrics
from air_quality_etl_pipeline_spark.plans.gold import star_join, surrogate_key
from air_quality_etl_pipeline_spark.plans.pipeline import Activity, run_pipeline
from air_quality_etl_pipeline_spark.plans.silver import (
    POLLUTANT_STANDARDS,
    silver_measurement,
    silver_parameter,
    silver_site,
)
from air_quality_etl_pipeline_spark.schemas import AQS_DAILY
from air_quality_etl_pipeline_spark.session import get_spark
from air_quality_etl_pipeline_spark.sources.ingest import coverage_gate, ingest

STATES = {
    "06": "California",
    "36": "New York",
    "17": "Illinois",
    "48": "Texas",
    "53": "Washington",
}
PARAMS = {88101: "PM2.5", 44201: "Ozone"}


def fake_aqs_fetch(params: dict) -> list[dict]:
    """Stands in for the EPA AQS REST endpoint (same payload shape);
    deterministic per (state, month)."""
    rng = random.Random(f"{params['state']}:{params['month']}")
    rows = []
    for day in range(1, 8):
        for code, name in PARAMS.items():
            rows.append(
                {
                    "state_code": params["state"],
                    "county_code": "001",
                    "site_number": "0001",
                    "parameter_code": code,
                    "poc": 1,
                    "latitude": 37.0,
                    "longitude": -122.0,
                    "datum": "WGS84",
                    "parameter": name,
                    "sample_duration": "24 HOUR",
                    "pollutant_standard": (
                        "PM25 24-hour 2024" if code == 88101 else "Ozone 8-hour 2015"
                    ),
                    "date_local": datetime.date(2024, params["month"], day),
                    "units_of_measure": "ug/m3",
                    "event_type": "None",
                    "observation_count": 24,
                    "observation_percent": 100.0,
                    "validity_indicator": "Y",
                    "arithmetic_mean": round(rng.uniform(5, 60), 1),
                    "first_max_value": round(rng.uniform(10, 90), 1),
                    "first_max_hour": rng.randint(0, 23),
                    "aqi": rng.randint(10, 260),
                    "method_code": 170,
                    "method": "FEM",
                    "local_site_name": f"Site {params['state']}",
                    "site_address": "1 Main St",
                    "state": STATES[params["state"]],
                    "county": "County",
                    "city": "City",
                    "cbsa_code": "10000",
                    "cbsa": "Metro",
                    "date_of_last_change": datetime.date(2024, 6, 1),
                }
            )
    return rows


def main() -> None:
    spark = get_spark(app_name="aqs_demo")

    def do_ingest(ctx):
        grid = [
            {"state": s, "month": m} for s in STATES for m in (1, 2, 3)
        ]
        bronze = ingest(
            spark, fake_aqs_fetch, grid, AQS_DAILY, sleep=lambda _: None
        )
        return coverage_gate(bronze, "state_code", len(STATES))

    def do_silver(ctx):
        return {
            "measurement": silver_measurement(ctx["ingest"]),
            "site": silver_site(ctx["ingest"]),
            "parameter": silver_parameter(ctx["ingest"]),
        }

    def do_gold(ctx):
        s = ctx["silver"]
        dim_date = surrogate_key(
            with_date_parts(
                s["measurement"].select(F.col("date_local").alias("date")).distinct(),
                "date",
            ),
            ["date"],
            "date_key",
        )
        dim_site = surrogate_key(
            s["site"].withColumn(
                "region", region_of_state(F.col("state_code"))
            ),
            ["state_code", "county_code", "site_number"],
            "location_key",
        )
        dim_param = surrogate_key(s["parameter"], ["parameter_code"], "parameter_key")
        fact = star_join(
            s["measurement"].withColumn("date", F.col("date_local")),
            [
                (dim_date.select("date", "date_key"), ["date"], "left"),
                (
                    dim_site.select(
                        "state_code", "county_code", "site_number",
                        "location_key", "region",
                    ),
                    ["state_code", "county_code", "site_number"],
                    "left",
                ),
                (
                    dim_param.select("parameter_code", "parameter_key", "parameter"),
                    ["parameter_code"],
                    "left",
                ),
            ],
        ).withColumns(
            {
                "aqi_category": aqi_category(F.col("aqi")),
                "exceeds_standard": flag_threshold(F.col("aqi"), 100),
                "year": F.year("date_local"),
                "month": F.month("date_local"),
                "state_name": F.col("state_code"),
            }
        )
        return fact

    run = run_pipeline(
        [
            Activity("ingest", do_ingest),
            Activity("silver", do_silver, depends_on=["ingest"]),
            Activity("gold", do_gold, depends_on=["silver"]),
        ]
    )
    assert run.succeeded, run.results
    fact = run.results["gold"].output
    fact.cache()

    print("\n=== fact_daily_air_quality (sample) ===")
    fact.select(
        "date_local", "state_code", "parameter", "aqi", "aqi_category",
        "exceeds_standard",
    ).show(5)

    print("=== AVG_AQI by month (DAX: AVERAGE within filter context) ===")
    metrics.avg_measure(fact, "aqi", ["year", "month"], alias="avg_aqi").orderBy(
        "year", "month"
    ).show()

    print("=== Unhealthy Day Count per state (DAX: COUNTROWS(FILTER(aqi>100))) ===")
    metrics.filtered_count(
        fact, F.col("aqi") > 100, ["state_code"], alias="unhealthy_days"
    ).orderBy("state_code").show()

    print("=== Worst State (DAX: TOPN + CONCATENATEX ties) ===")
    metrics.argmax_with_ties(
        fact.filter(F.col("aqi") > 150),
        "state_code",
        F.count("*"),
        "very_unhealthy_days",
        list_alias="states",
    ).show()

    print("=== State Rank (DAX: RANKX dense) ===")
    metrics.rank_groups(
        fact, "state_code", F.avg("aqi"), "avg_aqi", ascending=False
    ).orderBy("rank").show()

    print("=== MoM change of avg AQI (DAX: DATEADD -1 MONTH) ===")
    metrics.period_over_period(
        fact, ["year", "month"], F.avg("aqi"), "avg_aqi"
    ).orderBy("year", "month").show()

    print("=== Bad AQI days YTD (DAX: DATESYTD) ===")
    metrics.cumulative_to_date(
        fact.filter(F.col("aqi") > 150),
        ["month"],
        F.count("*"),
        "bad_days",
        partition_cols=["year"],
        cum_alias="bad_days_ytd",
    ).orderBy("year", "month").show()

    spark.stop()


if __name__ == "__main__":
    main()
