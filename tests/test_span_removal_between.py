"""Incremental (cross-snapshot) exact-substring span removal.

Pins the operator contract of operators.dedup.span_removal_between:
strictly cross-relation flagging, whole-clone cut, and batch-boundary
independence (the round-10 verdict's ask: the same documents give the
same answer however the crawl is sliced into batches). Cross-engine
values are checked by the registry oracle (``span_removal_between``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.dedup import (
    span_removal,
    span_removal_between,
)

SPAN = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_span_covered_by_corpus_is_cut(spark):
    corpus = _docs(spark, [(1, f"corpus holds {SPAN} already")])
    batch = _docs(spark, [(10, f"new crawl prefix {SPAN} suffix x")])
    out = span_removal_between(batch, corpus, min_run=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 10
    assert r["n_removed"] == 12
    assert r["dedup_text"] == "new crawl prefix suffix x"


def test_strictly_cross_relation(spark):
    """Duplication WITHIN the batch is not this operator's job — two
    identical batch docs with an unrelated corpus flag nothing."""
    corpus = _docs(spark, [(1, "totally unrelated corpus text here")])
    batch = _docs(spark, [(10, SPAN), (11, SPAN)])
    assert span_removal_between(batch, corpus, min_run=8).count() == 0


def test_whole_clone_of_corpus_doc_cut_entirely(spark):
    corpus = _docs(spark, [(1, SPAN)])
    batch = _docs(spark, [(10, SPAN)])
    out = span_removal_between(batch, corpus, min_run=8).collect()
    assert len(out) == 1
    assert out[0]["n_kept"] == 0 and out[0]["dedup_text"] == ""


def test_duplicate_gram_rows_in_corpus_grams_are_harmless(spark):
    """A caller-supplied corpus_grams relation with duplicate gh rows
    (e.g. a raw non-distinct gram dump) must give the same answer as
    the distinct table: the operator dedups the semi-join side itself
    (round-11 advisor — duplicated gh rows would otherwise multiply
    flagged (doc, pos) rows and fragment the gaps-and-islands runs)."""
    from air_quality_etl_pipeline_spark.operators.dedup import (
        corpus_gram_hashes,
    )

    corpus = _docs(spark, [(1, f"corpus holds {SPAN} already")])
    batch = _docs(spark, [(10, f"new crawl prefix {SPAN} suffix x")])
    cg = corpus_gram_hashes(corpus)
    dup_cg = cg.unionByName(cg).unionByName(cg)  # every gh three times
    want = sorted(
        tuple(r)
        for r in span_removal_between(
            batch, None, corpus_grams=cg, min_run=8
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in span_removal_between(
            batch, None, corpus_grams=dup_cg, min_run=8
        ).collect()
    )
    assert got == want
    assert len(want) == 1 and want[0][4] == "new crawl prefix suffix x"


def test_batch_boundary_independence(spark, sf_dir):
    """Slicing the batch differently cannot change any document's
    result: processing the two halves of the batch separately against
    the same corpus equals processing the whole batch at once."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = d.filter(F.col("doc_id") % 4 == 0)
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    whole = {
        r["doc_id"]: tuple(r)
        for r in span_removal_between(batch, corpus).collect()
    }
    sliced = {}
    for half in (0, 1):
        part = batch.filter((F.col("doc_id") % 8 == 4 * half))
        for r in span_removal_between(part, corpus).collect():
            sliced[r["doc_id"]] = tuple(r)
    assert whole and sliced == whole


def test_composes_with_batch_twin_on_full_clone_corpus(spark):
    """When the 'corpus' is the rest of the same snapshot, incremental
    flags exactly the spans the batch twin would cut from those docs
    whose duplicates all live OUTSIDE the batch (canonical included —
    between-mode cuts every covered occurrence, so a batch doc whose
    twin lives in the corpus is cut even though the batch twin would
    have kept one of the two)."""
    corpus = _docs(spark, [(1, f"one copy {SPAN} here")])
    batch = _docs(spark, [(2, f"two copy {SPAN} there")])
    between = span_removal_between(batch, corpus, min_run=8).collect()
    both = span_removal(
        corpus.unionByName(batch), min_run=8
    ).collect()
    # batch twin keeps the canonical (doc 1), cuts doc 2; between-mode
    # cuts doc 2 as well — same surviving text for the batch doc
    assert len(between) == 1 and len(both) == 1
    assert between[0]["doc_id"] == both[0]["doc_id"] == 2
    assert between[0]["dedup_text"] == both[0]["dedup_text"]


# ---------------------------------------------------------------------------
# Property: random batch/corpus == pure-Python reference
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_between(batch_rows, corpus_rows, n=5, min_run=8):
    """Pure-Python reference of span_removal_between: flag batch gram
    positions present in the corpus's distinct gram set, gaps-and-
    islands, cut every run of >= min_run (no canonical-keeping), emit
    original-case survivors."""
    def toks(txt):
        return txt.split() if txt.strip() else []

    corpus_grams = set()
    for _, txt in corpus_rows:
        ts = [t.lower() for t in toks(txt)]
        for p in range(1, max(len(ts) - (n - 1), 1) + 1):
            corpus_grams.add(" ".join(ts[p - 1 : p - 1 + n]))
    out = {}
    for i, txt in batch_rows:
        ots = toks(txt)
        ts = [t.lower() for t in ots]
        flagged = [
            p
            for p in range(1, max(len(ts) - (n - 1), 1) + 1)
            if " ".join(ts[p - 1 : p - 1 + n]) in corpus_grams
        ]
        cut = set()
        run = []
        for p in flagged + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= min_run:
                    tend = min(run[-1] + n - 1, len(ts))
                    cut.update(range(run[0], tend + 1))
                run = []
            if p is not None:
                run.append(p)
        if not cut:
            continue
        kept = [t for j, t in enumerate(ots, start=1) if j not in cut]
        out[i] = (len(ots), len(ots) - len(kept), len(kept), " ".join(kept))
    return out


_BLOCKS = [
    "qa qb qc qd qe qf qg qh qi qj qk ql qm",
    "ra rb rc rd re rf rg rh ri rj rk rl",
    "sa sb sc sd se sf sg sh si sj sk sl sm sn",
]
_seg = st.one_of(
    st.sampled_from(_BLOCKS),
    st.lists(
        st.sampled_from(["u1", "u2", "U3", "u4", "u5", "U6"]),
        min_size=1,
        max_size=6,
    ).map(" ".join),
)
_doc = st.lists(_seg, min_size=0, max_size=4).map(" ".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    batch_texts=st.lists(_doc, min_size=1, max_size=4),
    corpus_texts=st.lists(_doc, min_size=1, max_size=4),
)
def test_between_property_matches_reference(spark, batch_texts, corpus_texts):
    batch = [(i, t) for i, t in enumerate(batch_texts)]
    corpus = [(100 + i, t) for i, t in enumerate(corpus_texts)]
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_kept"],
            r["dedup_text"],
        )
        for r in span_removal_between(bdf, cdf, min_run=8).collect()
    }
    assert got == _ref_between(batch, corpus)
