"""Cross-engine bit-identity pins for functions/portable_math.py.

The dual-engine correctness gate hash-compares values, so any
transcendental or decimal-conversion step that is merely *accurate*
(1-ulp) rather than *identical* eventually flips a quantization cell
(observed at sf0.1: 3/5000 docs in bigram_logprob_score, 4/2500 in
trigram_backoff_score).  These tests pin the two portable primitives
that closed the hazard:

* ``ln_int_portable`` / ``sql_ln_int`` — bitwise-equal doubles across
  Spark and DuckDB for integers spanning every binade, including the
  2^k ± 1 band edges where libm ``log2``-based designs misround, and
  close to true ``math.log`` (so the semantic is still "ln").
* ``mean_round6_micro`` / ``sql_mean_round6`` — exact half-up
  6-decimal rounding of the rational mean of nano-unit terms,
  including sums that land *exactly* on the .5 boundary and negative
  sums (where truncated ``%`` and floor disagree without the
  mod-adjustment).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.portable_math import (
    ln_int_portable,
    ln_ratio_portable,
    mean_round6_micro,
    quantize_micro9,
    sql_ln_int,
    sql_ln_ratio,
    sql_mean_round6,
    sql_quantize_micro9,
)


def _duck_rows(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


@pytest.fixture(scope="module")
def ln_sample() -> list[int]:
    rng = random.Random(20260815)
    vals = set(range(1, 4097))
    vals.update(2**k for k in range(1, 53))
    vals.update(2**k - 1 for k in range(2, 53))
    vals.update(2**k + 1 for k in range(1, 52))
    vals.update(rng.randrange(1, 2**52) for _ in range(2000))
    return sorted(vals)


def test_ln_int_bitwise_equal_across_engines(spark, ln_sample):
    sdf = spark.createDataFrame(
        [(v,) for v in ln_sample], "n long"
    ).select("n", ln_int_portable(F.col("n")).alias("l"))
    s = {r["n"]: r["l"] for r in sdf.collect()}

    values = ", ".join(f"({v})" for v in ln_sample)
    d = dict(
        _duck_rows(
            f"SELECT n, {sql_ln_int('n')} FROM (VALUES {values}) t(n)"
        )
    )
    bad = [v for v in ln_sample if s[v].hex() != d[v].hex()]
    assert bad == [], f"cross-engine ln mismatch on {bad[:5]}"


def test_ln_int_close_to_true_ln(spark, ln_sample):
    sdf = spark.createDataFrame(
        [(v,) for v in ln_sample], "n long"
    ).select("n", ln_int_portable(F.col("n")).alias("l"))
    for r in sdf.collect():
        n, got = r["n"], r["l"]
        want = math.log(n)
        assert abs(got - want) <= 1e-13 * max(abs(want), 1.0), (n, got)


def test_ln_ratio_matches_sql_twin(spark):
    pairs = [(1, 7), (3, 1000), (999, 1000), (2**40, 3), (5, 2**45)]
    sdf = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", ln_ratio_portable(F.col("a"), F.col("b")).alias("l")
    )
    s = {(r["a"], r["b"]): r["l"] for r in sdf.collect()}
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    d = {
        (a, b): v
        for a, b, v in _duck_rows(
            f"SELECT a, b, {sql_ln_ratio('a', 'b')} "
            f"FROM (VALUES {values}) t(a, b)"
        )
    }
    for k in s:
        assert s[k].hex() == d[k].hex(), k


MEAN_CASES = [
    # (sum_micro9, cnt) — includes exact .5 boundaries both signs.
    (-316573348500, 93),   # the sf0.1 doc-4234 case: mean·1e6 = k−0.5
    (316573348500, 93),
    (1500, 1),             # 1.5e-6 → exactly k+0.5 at 6dp? 1.5→2
    (-1500, 1),            # −1.5e-6: half-up → −1e-6
    (500, 1),              # 0.5 boundary from zero
    (-500, 1),
    (0, 5),
    (123456789123, 37),
    (-987654321987, 41),
    (35_000_000_000 * 10**6, 10**6),  # large-count group sum
]


def test_mean_round6_exact_and_cross_engine(spark):
    sdf = spark.createDataFrame(
        MEAN_CASES, "s long, c long"
    ).select(
        "s", "c", mean_round6_micro(F.col("s"), F.col("c")).alias("m")
    )
    got = {(r["s"], r["c"]): r["m"] for r in sdf.collect()}
    values = ", ".join(f"({s}, {c})" for s, c in MEAN_CASES)
    duck = {
        (s, c): m
        for s, c, m in _duck_rows(
            f"SELECT s, c, {sql_mean_round6('s', 'c')} "
            f"FROM (VALUES {values}) t(s, c)"
        )
    }
    for s, c in MEAN_CASES:
        # exact rational half-up rounding at 6 decimals
        num, den = 2 * s + 1000 * c, 2000 * c
        q = num // den  # python floordiv == mathematical floor
        want = q / 1e6
        assert got[(s, c)] == want, (s, c, got[(s, c)], want)
        assert duck[(s, c)] == want, (s, c, duck[(s, c)], want)


DEC38_CASES = [
    0,
    1,
    -1,
    2**53 - 1,              # below the exact-double line
    2**53 + 1,              # first value a double cannot hold
    2**53 + 3,
    -(2**53 + 3),
    10**19 + 7,             # the welch q1 magnitude class (~1.35e19)
    13_500_000_000_000_000_001,
    -13_500_000_000_000_000_001,
    10**27 + 11,            # n·Q − S² magnitude class
    10**37 + 123456789,     # near the DECIMAL(38,0) ceiling
    -(10**37 + 123456789),
    2**84,                  # limb boundaries
    2**84 - 1,
    2**84 + 1,
    2**42 - 1,
    2**42 + 1,
]


def test_dec38_to_double_cross_engine_and_accurate(spark):
    """The limb-split conversion must be bit-identical across engines
    (the gate's requirement) and within 1 ulp of the correctly-rounded
    value (Python's int→float IS correctly rounded)."""
    from decimal import Decimal

    from air_quality_etl_pipeline_spark.functions.portable_math import (
        dec38_to_double_portable,
        sql_dec38_to_double,
    )

    sdf = spark.createDataFrame(
        [(str(v), Decimal(v)) for v in DEC38_CASES],
        "k string, n decimal(38,0)",
    ).select("k", dec38_to_double_portable(F.col("n")).alias("d"))
    s = {r["k"]: r["d"] for r in sdf.collect()}
    values = ", ".join(
        f"('{v}', CAST('{v}' AS DECIMAL(38,0)))" for v in DEC38_CASES
    )
    d = dict(
        _duck_rows(
            f"SELECT k, {sql_dec38_to_double('n')} "
            f"FROM (VALUES {values}) t(k, n)"
        )
    )
    for v in DEC38_CASES:
        k = str(v)
        assert s[k].hex() == d[k].hex(), (v, s[k], d[k])
        want = float(v)  # correctly rounded
        ulp = math.ulp(want) if want else 5e-324
        assert abs(s[k] - want) <= ulp, (v, s[k], want)


def test_quantize_micro9_cross_engine(spark):
    xs = [0.1234567894, -0.9999999995, 3.0000000004, -2.5e-9, 1.5e-9]
    sdf = spark.createDataFrame(
        [(x,) for x in xs], "x double"
    ).select("x", quantize_micro9(F.col("x")).alias("q"))
    s = {r["x"]: r["q"] for r in sdf.collect()}
    values = ", ".join(f"(CAST({x!r} AS DOUBLE))" for x in xs)
    d = dict(
        _duck_rows(
            f"SELECT x, {sql_quantize_micro9('x')} "
            f"FROM (VALUES {values}) t(x)"
        )
    )
    for x in xs:
        assert s[x] == d[x], (x, s[x], d[x])
