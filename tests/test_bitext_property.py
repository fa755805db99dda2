"""Property: bitext_margin_mine == a pure-Python reference of the
whole Artetxe-Schwenk pipeline (kNN with rounded-cosine tie-breaks →
integer neighborhood sums → one integer margin division → mutual-best)
on random small fixtures with OVERLAPPING id spaces — the strongest pin
on the margin algebra beyond the hand-traced cases, and a standing
regression net for the round-11 cross-relation exclude_self fix.

Vector components are dyadic rationals (k/4), so the float64 dot/norm
folds are bit-identical between Spark's left-fold `aggregate` and
Python's left-to-right loop — the same determinism argument the
registry oracles rely on."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from air_quality_etl_pipeline_spark.operators.similarity import (
    bitext_margin_mine,
)

DIMS = 3


def _cm(a: list[float], b: list[float]) -> int | None:
    """Integer micro-unit cosine, replicating _pair_cosine exactly:
    left-fold dot and norms, rounded cosine (floor(x·1e6+0.5)/1e6),
    then the operator's floor(rounded·1e6+0.5)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    den = math.sqrt(na) * math.sqrt(nb)
    if den == 0.0:
        return None
    c6 = math.floor((dot / den) * 1e6 + 0.5) / 1e6
    return math.floor(c6 * 1e6 + 0.5)


def _ref_margin(src: list, tgt: list, k: int) -> list[tuple]:
    """Pure-Python bitext_margin_mine: fwd/bwd top-k by (rounded
    cosine desc, neighbor id asc), exact integer neighborhood sums,
    margin = (cm·2k·1e6) // (sum_f+sum_b) over non-negative operands,
    mutual-best by (margin desc, id asc) row_number == 1."""
    def topk(queries, corpus):
        out = {}
        for qid, qv in queries:
            scored = sorted(
                ((_cm(qv, cv), nid) for nid, cv in corpus),
                key=lambda t: (-t[0], t[1]),
            )
            out[qid] = scored[:k]
        return out

    fwd = topk(src, tgt)  # src queries over tgt corpus
    bwd = topk(tgt, src)  # tgt queries over src corpus
    sum_f = {x: sum(c for c, _ in nn) for x, nn in fwd.items()}
    sum_b = {y: sum(c for c, _ in nn) for y, nn in bwd.items()}
    cand = {}
    for x, nn in fwd.items():
        for c, y in nn:
            cand[(x, y)] = c
    for y, nn in bwd.items():
        for c, x in nn:
            cand[(x, y)] = c
    m = []
    for (x, y), c in cand.items():
        if x not in sum_f or y not in sum_b:
            continue
        den = sum_f[x] + sum_b[y]
        if c < 0 or den <= 0:
            continue
        m.append((x, y, c, (c * 2 * k * 1000000) // den))
    qf = {}
    qb = {}
    for x, y, c, mm in sorted(m, key=lambda t: (-t[3], t[1])):
        qf.setdefault(x, (y, mm))
    for x, y, c, mm in sorted(m, key=lambda t: (-t[3], t[0])):
        qb.setdefault(y, (x, mm))
    return sorted(
        (x, y, c, mm)
        for x, y, c, mm in m
        if qf.get(x, (None,))[0] == y and qb.get(y, (None,))[0] == x
    )


_vec = st.lists(
    st.integers(min_value=-4, max_value=4).map(lambda i: i / 4.0),
    min_size=DIMS,
    max_size=DIMS,
).filter(lambda v: any(x != 0.0 for x in v))


def _side(max_n: int):
    # ids 0..n-1 on BOTH sides — overlapping id spaces by construction
    return st.lists(_vec, min_size=1, max_size=max_n).map(
        lambda vs: [(i, v) for i, v in enumerate(vs)]
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(src=_side(5), tgt=_side(5), k=st.integers(min_value=1, max_value=3))
def test_margin_mine_matches_reference(spark, src, tgt, k):
    sdf = spark.createDataFrame(src, "vec_id long, embedding array<double>")
    tdf = spark.createDataFrame(tgt, "vec_id long, embedding array<double>")
    got = sorted(
        tuple(r) for r in bitext_margin_mine(sdf, tdf, k=k).collect()
    )
    assert got == _ref_margin(src, tgt, k)
