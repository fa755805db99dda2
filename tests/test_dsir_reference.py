"""Independent reference for dsir_importance_weights.

The DuckDB oracle mirrors the Spark formulation, so it cannot catch a
shared formula error. This reference recomputes DSIR importance
weights from the paper's definition — hashed-feature bag LLR between
the target and raw unigram models with add-1 smoothing — in pure
Python floats (``math.log``), then checks that the operator's
integer-micro weights agree to quantization precision and induce the
same selection ranking on a corpus with well-separated weights.
"""

from __future__ import annotations

import hashlib
import math

from air_quality_etl_pipeline_spark.workload import QUERIES

B = 4096


def _bucket(tok: str) -> int:
    h = int(hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:15], 16)
    return h % B


def ref_dsir(rows):
    """rows: (doc_id, text, source). Returns {doc_id: (n_tokens, llr)}
    for raw-pool docs, llr in nats (float)."""
    nt: dict[int, int] = {}
    nr: dict[int, int] = {}
    raw_docs: dict[int, list[int]] = {}
    for did, text, src in rows:
        toks = text.strip().split() if text.strip() else []
        bs = [_bucket(t.lower()) for t in toks]
        if src in ("src1", "src2", "src3"):
            for b in bs:
                nt[b] = nt.get(b, 0) + 1
        else:
            raw_docs[did] = bs
            for b in bs:
                nr[b] = nr.get(b, 0) + 1
    n_t_total = sum(nt.values())
    n_r_total = sum(nr.values())
    out = {}
    for did, bs in raw_docs.items():
        llr = sum(
            math.log(
                (nt.get(b, 0) + 1)
                * (n_r_total + B)
                / ((nr.get(b, 0) + 1) * (n_t_total + B))
            )
            for b in bs
        )
        out[did] = (len(bs), llr)
    return out


def test_dsir_weights_match_float_reference(spark, tmp_path):
    # corpus engineered for separated weights: target domain talks
    # about telescopes, the raw pool mixes telescope docs (should rank
    # high) with cooking docs (low) at varying lengths
    rows = []
    tgt_words = "telescope mirror lens aperture star galaxy orbit focus"
    raw_hi = "telescope lens star focus galaxy"
    raw_lo = "flour butter sugar oven whisk batter"
    for i in range(6):
        rows.append((100 + i, f"{tgt_words} {i}", f"src{1 + i % 3}"))
    docs = [
        (1, f"{raw_hi} {raw_hi}", "src9"),
        (2, raw_hi, "src9"),
        (3, f"{raw_hi} {raw_lo}", "src8"),
        (4, raw_lo, "src8"),
        (5, f"{raw_lo} {raw_lo} {raw_lo}", "src7"),
        (6, "", "src7"),  # empty raw doc: no tokens, no output row
    ]
    rows.extend(docs)
    # write a documents table the registry query can read
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight_micro"])
        for r in QUERIES["dsir_importance_weights"][0](
            spark, sf_dir
        ).collect()
    }
    want = ref_dsir(rows)
    # doc 6 has no tokens → absent from both
    assert set(got) == {d for d, (n, _) in want.items() if n > 0}
    for did, (n_ref, llr_ref) in want.items():
        if n_ref == 0:
            continue
        n_got, w_micro = got[did]
        assert n_got == n_ref
        # per-term quantization error ≤ 0.5e-9, so total ≤ n·1e-9 + ulps
        assert abs(w_micro / 1e9 - llr_ref) <= n_ref * 2e-9 + 1e-9, (
            did, w_micro / 1e9, llr_ref,
        )
    # ranking (selection order) agrees with the float reference
    rank_got = sorted(got, key=lambda d: (-got[d][1], d))
    rank_ref = sorted(
        (d for d in want if want[d][0] > 0),
        key=lambda d: (-want[d][1], d),
    )
    assert rank_got == rank_ref
