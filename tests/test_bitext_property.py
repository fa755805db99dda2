"""Property test: bitext_margin_mine == a pure-Python reference.

The hand-traced fixture in tests/test_bitext_mining.py pins one known
case; this pins the whole algebra (micro-unit cosine rounding, top-k
tie-breaks, neighborhood sums, the non-negative integer-division
margin, and the mutual-best filter) against an independent brute-force
implementation over random small-integer vectors — the repo's standard
second-reference discipline (cf. test_span_removal, test_merge_matrix).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from air_quality_etl_pipeline_spark.operators.similarity import (
    bitext_margin_mine,
)


def _cm(a, b):
    """Integer micro-unit cosine with EXACTLY the operator's fold
    order: sequential index-order accumulation (zip_with + aggregate),
    norms as sum-of-squares then sqrt — same IEEE doubles."""
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
    return math.floor(dot / den * 1000000.0 + 0.5)


def _ref_bitext(src, tgt, k):
    pairs = {
        (sid, tid): _cm(sv, tv) for sid, sv in src for tid, tv in tgt
    }
    fwd = {}
    for sid, _ in src:
        ranked = sorted(
            ((tid, pairs[(sid, tid)]) for tid, _ in tgt),
            key=lambda r: (-r[1], r[0]),
        )[:k]
        fwd[sid] = ranked
    bwd = {}
    for tid, _ in tgt:
        ranked = sorted(
            ((sid, pairs[(sid, tid)]) for sid, _ in src),
            key=lambda r: (-r[1], r[0]),
        )[:k]
        bwd[tid] = ranked
    sum_f = {sid: sum(c for _, c in nn) for sid, nn in fwd.items()}
    sum_b = {tid: sum(c for _, c in nn) for tid, nn in bwd.items()}
    cand = set()
    for sid, nn in fwd.items():
        cand.update((sid, tid) for tid, _ in nn)
    for tid, nn in bwd.items():
        cand.update((sid, tid) for sid, _ in nn)
    margins = {}
    for sid, tid in cand:
        cm = pairs[(sid, tid)]
        den = sum_f[sid] + sum_b[tid]
        if cm < 0 or den <= 0:
            continue
        margins[(sid, tid)] = (cm * 2 * k * 1000000) // den
    best_f, best_b = {}, {}
    for (sid, tid), m in margins.items():
        cur = best_f.get(sid)
        if cur is None or (m, -tid) > (cur[1], -cur[0]):
            best_f[sid] = (tid, m)
        cur = best_b.get(tid)
        if cur is None or (m, -sid) > (cur[1], -cur[0]):
            best_b[tid] = (sid, m)
    out = []
    for sid, (tid, m) in best_f.items():
        if best_b.get(tid, (None,))[0] == sid:
            out.append((sid, tid, pairs[(sid, tid)], m))
    return sorted(out)


_vec = st.lists(
    st.integers(-3, 3), min_size=3, max_size=3
).filter(lambda v: any(x != 0 for x in v))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    svecs=st.lists(_vec, min_size=1, max_size=5),
    tvecs=st.lists(_vec, min_size=1, max_size=5),
    k=st.integers(1, 3),
)
def test_bitext_margin_matches_reference(spark, svecs, tvecs, k):
    src = [(2 * i, [float(x) for x in v]) for i, v in enumerate(svecs)]
    tgt = [(2 * i + 1, [float(x) for x in v]) for i, v in enumerate(tvecs)]
    sdf = spark.createDataFrame(src, "vec_id long, embedding array<double>")
    tdf = spark.createDataFrame(tgt, "vec_id long, embedding array<double>")
    got = sorted(
        tuple(r) for r in bitext_margin_mine(sdf, tdf, k=k).collect()
    )
    assert got == _ref_bitext(src, tgt, k)
