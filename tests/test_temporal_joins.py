"""Edge-case semantics for the temporal joins: as-of tie resolution,
boundary inclusivity of the banded interval join, zero-match behavior,
and the plan-shape guarantee (band join = hash/merge join, never the
nested-loop plan a raw range predicate gets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.joins import (
    asof_join,
    count_in_window,
    interval_join,
)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k long, lt long, lval string",
    )
    right = spark.createDataFrame(
        # k=1: two rows at the same ts=100 (tie), one later at 200
        [(1, 100, 10, 1.0), (1, 100, 11, 2.0), (1, 200, 12, 3.0),
         (2, 60, 20, 4.0)],  # k=2: only AFTER the left row
        "k long, rt long, rid long, rv double",
    )
    return left, right


def test_asof_backward_match_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["k"], "lt", "rt", ["rid", "rv"], tiebreak="rid"
    )
    got = {r.lval: (r.asof_rid, r.asof_rv, r.asof_rt) for r in out.collect()}
    assert got["a"] == (11, 2.0, 100)  # ts tie -> max tiebreak wins
    assert got["b"] == (12, 3.0, 200)  # latest <= 205
    assert got["c"] == (None, None, None)  # right row is in the future
    assert got["d"] == (None, None, None)  # no right rows for key
    assert out.count() == left.count()  # left-preserving


def test_asof_fractional_tiebreak_not_truncated(spark):
    # r12 advisor: a long-cast of the tiebreak would truncate 1.2 and
    # 1.9 to equal longs, making the equal-ts winner partition-order-
    # dependent; the window must order by the NATIVE double
    left = spark.createDataFrame([(1, 100)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 100, 1.9, "lo"), (1, 100, 1.2, "hi-id-lo-tb")],
        "k long, rt long, tb double, tag string",
    )
    out = asof_join(
        left, right, ["k"], "lt", "rt", ["tag"], tiebreak="tb"
    )
    assert out.first().asof_tag == "lo"  # 1.9 > 1.2 after NO truncation


def test_asof_rejects_string_tiebreak(spark):
    left = spark.createDataFrame([(1, 100)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 100, "9")], "k long, rt long, tb string"
    )
    with pytest.raises(ValueError, match="numeric"):
        asof_join(left, right, ["k"], "lt", "rt", [], tiebreak="tb")


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, 100)], "k long, lt long")
    right = spark.createDataFrame([(1, 100, 7)], "k long, rt long, rid long")
    out = asof_join(left, right, ["k"], "lt", "rt", ["rid"], tiebreak="rid")
    assert out.first().asof_rid == 7


def test_interval_join_boundaries(spark):
    left = spark.createDataFrame([(1, 1000, 1)], "k long, lt long, lid long")
    right = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate([1000, 1001, 1500, 2000, 2001])],
        "k long, rt long, rid long",
    )
    out = interval_join(left, right, ["k"], "lt", "rt", 0, 1000)
    got = sorted(r.rt for r in out.collect())
    assert got == [1001, 1500, 2000]  # strict lower, inclusive upper


def test_interval_join_band_edges(spark):
    # windows that straddle a band boundary must still match (the
    # 2-band explode covers the overlap)
    left = spark.createDataFrame([(1, 999, 1)], "k long, lt long, lid long")
    right = spark.createDataFrame(
        [(1, 1001, 0), (1, 1999, 1), (1, 2000, 2)],
        "k long, rt long, rid long",
    )
    out = interval_join(left, right, ["k"], "lt", "rt", 0, 1000)
    assert sorted(r.rt for r in out.collect()) == [1001, 1999]


def test_interval_join_no_duplicate_pairs(spark):
    left = spark.createDataFrame(
        [(1, t, t) for t in range(0, 50, 7)], "k long, lt long, lid long"
    )
    right = spark.createDataFrame(
        [(1, t, t) for t in range(0, 50)], "k long, rt long, rid long"
    )
    out = interval_join(left, right, ["k"], "lt", "rt", 0, 10)
    rows = [(r.lid, r.rid) for r in out.collect()]
    assert len(rows) == len(set(rows))  # explode never double-matches
    for lid, rid in rows:
        assert lid < rid <= lid + 10


def test_interval_join_plans_as_hash_join(spark):
    import contextlib
    import io

    left, right = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interval_join(left, right, ["k"], "lt", "rt", 0, 100).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "NestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_count_in_window_keeps_zero_match_probes(spark):
    probe = spark.createDataFrame(
        [(1, 0, 100), (2, 0, 200)], "pid long, k long, pt long"
    )
    events = spark.createDataFrame(
        [(0, 150, 2.5), (0, 160, 1.5)], "k long, et long, v double"
    )
    out = count_in_window(
        probe, events, ["k"], "pt", "et", F.col("v"), 100, ["pid", "k"]
    )
    got = {r.pid: (r.n_follow, r.sum_follow) for r in out.collect()}
    assert got[1] == (2, 4.0)
    assert got[2] == (0, 0.0)


# ---------------------------------------------------------------------------
# Property tests vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ts = st.integers(0, 20)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1,
                   max_size=10),
    rights=st.lists(st.tuples(st.integers(0, 2), _ts), min_size=0,
                    max_size=10),
)
def test_asof_join_property_matches_bruteforce(spark, lefts, rights):
    """Random probe/quote streams with heavy key and timestamp
    collisions: backward as-of (<= inclusive, greatest-tiebreak tie
    resolution) matches the brute-force per-row maximum."""
    rrows = [(k, t, i, float(i)) for i, (k, t) in enumerate(rights)]
    lrows = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    left = spark.createDataFrame(lrows, "k long, lt long, lid long")
    right = (
        spark.createDataFrame(rrows, "k long, rt long, rid long, rv double")
        if rrows
        else spark.createDataFrame([], "k long, rt long, rid long, rv double")
    )
    out = asof_join(
        left, right, ["k"], "lt", "rt", ["rv"], tiebreak="rid"
    )
    got = sorted(
        (r["k"], r["lt"], r["lid"], r["asof_rv"], r["asof_rt"])
        for r in out.collect()
    )
    want = []
    for k, lt, lid in lrows:
        best = None
        for rk, rt, rid, rv in rrows:
            if rk == k and rt <= lt:
                cand = (rt, rid, rv)
                if best is None or cand > best:
                    best = cand
        want.append(
            (k, lt, lid, best[2] if best else None,
             best[0] if best else None)
        )
    assert got == sorted(want)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1,
                   max_size=8),
    rights=st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1,
                    max_size=8),
    lower=st.integers(-6, 4),
    width=st.integers(1, 6),
)
def test_interval_join_property_matches_bruteforce(
    spark, lefts, rights, lower, width
):
    """Random streams and band parameters (negative lower bounds,
    width-1 bands): the banded interval join emits exactly the pairs
    with l.ts + lower < r.ts <= l.ts + upper, no duplicates."""
    upper = lower + width
    lrows = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    rrows = [(k, t, 100 + i) for i, (k, t) in enumerate(rights)]
    left = spark.createDataFrame(lrows, "k long, lt long, lid long")
    right = spark.createDataFrame(rrows, "k long, rt long, rid long")
    out = interval_join(left, right, ["k"], "lt", "rt", lower, upper)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    want = sorted(
        (lid, rid)
        for k, lt, lid in lrows
        for rk, rt, rid in rrows
        if rk == k and lt + lower < rt <= lt + upper
    )
    assert got == want


def test_interval_join_rejects_column_clash(spark):
    """The documented disjoint-columns contract is enforced: a shared
    non-key column would silently produce ambiguous duplicate output
    columns."""
    import pytest

    a = spark.createDataFrame([(1, 5, "x")], "k long, ts long, v string")
    b = spark.createDataFrame([(1, 6, "y")], "k long, ts long, v string")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(a, b, ["k"], "ts", "ts", 0, 10)
