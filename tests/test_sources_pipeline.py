"""Unit tests for the sources layer and the pipeline runner — the
control-flow semantics (retry, skip-on-failure, coverage gate) that the
oracle-parity harness can't express."""

from __future__ import annotations

from datetime import datetime

import pytest

from air_quality_etl_pipeline_spark.plans.pipeline import (
    Activity,
    Schedule,
    ScheduledPipeline,
    foreach,
    run_pipeline,
)
from air_quality_etl_pipeline_spark.sources.ingest import (
    coverage_gate,
    fetch_with_retry,
    ingest,
    rows_from_header_payload,
)


class FlakyFetch:
    """Fails *fail_times* times, then returns the payload."""

    def __init__(self, fail_times: int, payload):
        self.fail_times = fail_times
        self.calls = 0
        self.payload = payload

    def __call__(self, params):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient")
        return self.payload


def test_retry_succeeds_after_transient_failures():
    sleeps: list[float] = []
    fetch = FlakyFetch(2, [{"a": 1}])
    out = fetch_with_retry(fetch, {}, max_attempts=4, sleep=sleeps.append)
    assert out == [{"a": 1}]
    assert fetch.calls == 3
    assert sleeps == [4.0, 8.0]  # exponential backoff


def test_retry_exhaustion_raises():
    fetch = FlakyFetch(10, [])
    with pytest.raises(RuntimeError, match="after 4 attempts"):
        fetch_with_retry(fetch, {"s": 1}, max_attempts=4, sleep=lambda _: None)


def test_ingest_skips_empty_payloads_and_applies_schema(spark):
    def fetch(params):
        if params["state"] == "empty":
            return []
        return [{"state_code": params["state"], "aqi": 42}]

    df = ingest(
        spark,
        fetch,
        [{"state": "01"}, {"state": "empty"}, {"state": "02"}],
        schema="state_code string, aqi int",
        sleep=lambda _: None,
    )
    rows = {r["state_code"] for r in df.collect()}
    assert rows == {"01", "02"}
    assert dict(df.dtypes)["aqi"] == "int"


def test_rows_from_header_payload(spark):
    df = rows_from_header_payload(
        spark, [["NAME", "POP"], ["Alabama", "5024279"], ["Alaska", "733391"]]
    )
    assert df.columns == ["NAME", "POP"]
    assert df.count() == 2


def test_coverage_gate_passes_and_fails(spark):
    df = spark.createDataFrame(
        [("01",), ("02",), ("03",)], "state_code string"
    )
    assert coverage_gate(df, "state_code", 3) is df
    with pytest.raises(RuntimeError, match="coverage gate failed"):
        coverage_gate(df, "state_code", 4)


def test_pipeline_skips_downstream_of_failure():
    ran: list[str] = []

    def ok(name):
        def fn(ctx):
            ran.append(name)
            return name

        return fn

    def boom(ctx):
        raise ValueError("exploded")

    run = run_pipeline(
        [
            Activity("a", ok("a")),
            Activity("b", boom, depends_on=["a"]),
            Activity("c", ok("c"), depends_on=["b"]),
            Activity("d", ok("d"), depends_on=["a"]),
        ]
    )
    assert run.results["a"].status == "succeeded"
    assert run.results["b"].status == "failed"
    assert "ValueError" in run.results["b"].error
    assert run.results["c"].status == "skipped"
    assert run.results["d"].status == "succeeded"  # independent branch runs
    assert not run.succeeded
    assert ran == ["a", "d"]


def test_pipeline_retry_recovers():
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise OSError("transient")
        return "ok"

    run = run_pipeline([Activity("flaky", flaky, retry=2)])
    assert run.succeeded
    assert run.results["flaky"].attempts == 3


def test_pipeline_context_passes_outputs():
    run = run_pipeline(
        [
            Activity("x", lambda ctx: 21),
            Activity("y", lambda ctx: ctx["x"] * 2, depends_on=["x"]),
        ]
    )
    assert run.results["y"].output == 42


def test_foreach_sequential_order():
    assert foreach([3, 1, 2], lambda x: x * 10) == [30, 10, 20]


def test_schedule_weekly_reference_trigger():
    """The reference's trigger: weekly Thursday 06:00 (C4)."""
    s = Schedule.weekly("thursday", 6)
    # 2026-01-01 is a Thursday
    assert s.next_fire(datetime(2025, 12, 31, 12, 0)) == datetime(2026, 1, 1, 6, 0)
    # just past this week's fire -> next Thursday
    assert s.next_fire(datetime(2026, 1, 1, 6, 0)) == datetime(2026, 1, 8, 6, 0)
    assert s.is_due(datetime(2026, 1, 1, 6, 0), last_run=None)
    assert s.is_due(datetime(2026, 1, 9), last_run=datetime(2026, 1, 1, 6, 0))
    assert not s.is_due(datetime(2026, 1, 7), last_run=datetime(2026, 1, 1, 6, 0))


def test_schedule_cron_fields():
    # every 15 min
    s = Schedule("*/15 * * * *")
    assert s.next_fire(datetime(2026, 3, 1, 10, 1)) == datetime(2026, 3, 1, 10, 15)
    # ranges, lists, dow-7 normalization
    s = Schedule("0 9-17/4 * * 7")  # 9:00/13:00/17:00 on Sundays
    f = s.next_fire(datetime(2026, 3, 2))  # Monday
    assert f == datetime(2026, 3, 8, 9, 0) and f.isoweekday() == 7
    # Vixie OR: dom 15 OR Friday, whichever first
    s = Schedule("0 0 15 * 5")
    assert s.next_fire(datetime(2026, 3, 10)) == datetime(2026, 3, 13)  # Friday
    assert s.next_fire(datetime(2026, 3, 14)) == datetime(2026, 3, 15)  # dom
    # month wrap + leap day: Feb 29 next exists in 2028
    s = Schedule("0 0 29 2 *")
    assert s.next_fire(datetime(2026, 3, 1)) == datetime(2028, 2, 29)
    with pytest.raises(ValueError):
        Schedule("60 * * * *")
    with pytest.raises(ValueError):
        Schedule("* * * *")


def test_schedule_cron_range_upper_bound_validated():
    """An out-of-range range END must raise, not wrap: '5-9' in dow is
    invalid (the %7 Sunday-alias normalization is only for the literal
    7), and the same range in a non-dow field is invalid too."""
    with pytest.raises(ValueError):
        Schedule("0 0 * * 5-9")
    with pytest.raises(ValueError):
        Schedule("0 25-30 * * *")
    # literal 7 stays a valid Sunday alias, alone and as a range end
    assert Schedule("0 0 * * 7").dows == frozenset({0})
    assert Schedule("0 0 * * 5-7").dows == frozenset({5, 6, 0})


def test_schedule_feb29_across_skipped_century_leap():
    """2100 is not a leap year, so Feb-29 crons gap 8 years around it
    (2096-02-29 → 2104-02-29); the bounded day-walk must cover it."""
    s = Schedule("0 0 29 2 *")
    assert s.next_fire(datetime(2096, 3, 1)) == datetime(2104, 2, 29)


def test_scheduled_pipeline_runs_only_when_due():
    pipe = ScheduledPipeline(
        [Activity("x", lambda ctx: 1)], schedule=Schedule.weekly("thursday", 6)
    )
    assert pipe.run_if_due(datetime(2026, 1, 7), datetime(2026, 1, 1, 6)) is None
    run = pipe.run_if_due(datetime(2026, 1, 8, 7), datetime(2026, 1, 1, 6))
    assert run is not None and run.succeeded


def test_rest_param_grid_datasource(spark):
    """Spark 4 Python Data Source expression of the REST ingest: one
    InputPartition per param-grid entry, schema-enforced scan. (Needs
    the package importable on executors — true under pytest; on a real
    cluster ship it via --py-files / pip, as with any Python source.)"""
    import json

    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.sources.rest_datasource import (
        RestParamGridDataSource,
    )

    spark.dataSource.register(RestParamGridDataSource)
    grid = [{"state": s, "year": y} for s in range(3) for y in (2023, 2024)]
    df = (
        spark.read.format("rest_param_grid")
        .schema("state_code string, year int, aqi int")
        .option("param_grid_json", json.dumps(grid))
        .option("fetcher_builtin", "demo")
        .load()
    )
    assert df.rdd.getNumPartitions() == len(grid)
    rows = df.groupBy("state_code").agg(F.count("*").alias("n")).collect()
    assert {r["state_code"]: r["n"] for r in rows} == {
        "0": 20, "1": 20, "2": 20,
    }
    total = df.agg(F.sum("aqi")).first()[0]
    expected = sum(
        (s * 31 + y) % 100 + i
        for s in range(3)
        for y in (2023, 2024)
        for i in range(10)
    )
    assert total == expected


# ---------------------------------------------------------------------------
# Avro (availability-gated: spark-avro is an external module this
# distribution doesn't ship — same gating pattern as the protobuf-less
# transformWithStateInPandas)
# ---------------------------------------------------------------------------

def test_avro_roundtrip_or_documented_gate(spark, tmp_path):
    from air_quality_etl_pipeline_spark.sources.readers import (
        avro_available,
        read_avro,
    )
    from air_quality_etl_pipeline_spark.sources.writers import write_avro

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "k long, s string, v double"
    )
    path = str(tmp_path / "avro_rt")
    if not avro_available(spark):
        # the gate must fail LOUDLY with the remediation, not with
        # Spark's generic 'Failed to find data source'
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_avro(df, path)
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, path)
        pytest.skip("spark-avro jar not in this distribution (documented)")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    assert back.schema == df.schema
