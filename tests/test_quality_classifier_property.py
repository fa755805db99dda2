"""Property test: quality_classifier train+score == pure-Python NB.

The registry oracle pins Spark↔DuckDB; this pins both against an
independent pure-Python multinomial-NB implementation, including a
bit-exact Python replica of the portable ln (same Horner series, same
IEEE ops) and of the micro9 quantization (shortest-repr double →
HALF_UP at scale 9 — the BigDecimal.valueOf path Spark's double→decimal
cast takes). Random small vocabularies + labels, so bucket collisions,
unseen-gram smoothing and the prior all get exercised.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from air_quality_etl_pipeline_spark.functions.portable_math import (
    _ATANH_COEF,
    LN2,
)
from air_quality_etl_pipeline_spark.operators.text import (
    quality_classifier_score,
    quality_classifier_weights,
)


def _py_ln_int(n: int) -> float:
    e = n.bit_length() - 1
    m = n / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    w = z * z
    s = _ATANH_COEF[-1]
    for c in reversed(_ATANH_COEF[:-1]):
        s = s * w + c
    return e * LN2 + (2.0 * z) * s


def _py_q9(x: float) -> int:
    return int(
        Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        * 1_000_000_000
    )


def _qln(n: int) -> int:
    return _py_q9(_py_ln_int(n))


def _grams(text: str) -> list[str]:
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram: str, n_buckets: int, salt: str = "qc") -> int:
    h = int(hashlib.md5(f"{salt}:{gram}".encode()).hexdigest()[:15], 16)
    return h % n_buckets


def _ref(train, docs, n_buckets):
    c1, c0 = Counter(), Counter()
    n1 = n0 = 0
    for _, text, y in train:
        (n1, n0) = (n1 + 1, n0) if y else (n1, n0 + 1)
        for g in _grams(text):
            (c1 if y else c0)[_bucket(g, n_buckets)] += 1
    t1b = sum(c1.values()) + n_buckets
    t0b = sum(c0.values()) + n_buckets
    w = {
        b: _qln(c1[b] + 1) - _qln(t1b) - _qln(c0[b] + 1) + _qln(t0b)
        for b in range(n_buckets)
    }
    prior = _qln(n1) - _qln(n0)
    out = {}
    for doc_id, text in docs:
        gs = _grams(text)
        if not gs:
            continue
        score = prior + sum(w[_bucket(g, n_buckets)] for g in gs)
        out[doc_id] = (len(gs), score, 1 if score > 0 else 0)
    return out


_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "spam", "eggs", "ham", "x1"]
)
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    texts=st.lists(_text, min_size=4, max_size=10),
    labels=st.data(),
)
def test_classifier_matches_python_reference(spark, texts, labels):
    ys = [
        labels.draw(st.integers(0, 1), label=f"y{i}")
        for i in range(len(texts))
    ]
    # both classes must be present (operator contract: ln of doc counts)
    ys[0], ys[1] = 1, 0
    train = [(i, t, y) for i, (t, y) in enumerate(zip(texts, ys))]
    docs = [(i, t) for i, t in enumerate(texts)]
    tdf = spark.createDataFrame(train, "doc_id long, text string, y int")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    w = quality_classifier_weights(tdf, label_col="y", n_buckets=32)
    got = {
        r["doc_id"]: (r["n_grams"], r["score_micro9"], r["pred"])
        for r in quality_classifier_score(ddf, w, n_buckets=32).collect()
    }
    assert got == _ref(train, docs, 32)
