"""Round-3 training-data operators: BPE merge learning (vs a pure-
Python reference — the exactness pin for the one iterative, rows-only
query), SemDeDup invariants, PQ encode/ADC contracts, and the Count-Min
overcount guarantee."""

from __future__ import annotations

import collections

import duckdb
import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.pq import (
    collect_codebook,
    pq_adc_topk,
    pq_encode,
)
from air_quality_etl_pipeline_spark.operators.similarity import semantic_dedup
from air_quality_etl_pipeline_spark.operators.text import (
    apply_bpe_merge,
    learn_bpe_merges,
)


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

def ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python Sennrich-style reference: greedy left-to-right apply,
    argmax pair by (count DESC, pair ASC)."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            n = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def test_apply_bpe_merge_greedy(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(
            apply_bpe_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert got[0] == ["aa", "a"]          # greedy left-to-right, no overlap
    assert got[1] == ["a", "b", "a", "b"]  # untouched
    assert got[2] == ["x"]


def test_bpe_oracle_sql_greedy_overlap_runs():
    """The unrolled-CTE oracle (workload_training._bpe_merges_oracle)
    must reproduce the GREEDY non-overlap rewrite on equal-symbol runs
    — merge (l, l) over 'llll…' takes alternate positions from the run
    head — which the driver-generated corpus never exercises. A crafted
    corpus forces (a, a) to win round 0 ('aaaa' → [aa, aa], odd run
    'aaaaa' → [aa, aa, a]) and then (aa, aa) to win a later round, and
    the SQL must match the pure-Python reference on every round."""
    from air_quality_etl_pipeline_spark.workload_training import (
        _bpe_merges_oracle,
    )

    corpus = [
        ("aaaa aaaa aaaaa aaaa",),
        ("aaaa aaaaa bcbc",),
        ("aaaa bcbc bcbc aaaa",),
        ("  ",),  # blank → zero tokens (token_array contract)
    ]
    word_counts: collections.Counter = collections.Counter()
    for (t,) in corpus:
        if t.strip():
            word_counts.update(w.lower() for w in t.split())
    expected = ref_bpe(dict(word_counts), 4)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", corpus)
    got = [tuple(r) for r in con.execute(_bpe_merges_oracle(4)).fetchall()]
    assert got == expected
    # the crafted corpus really did exercise overlapping candidates:
    # round 0 must be the equal-symbol pair
    assert (expected[0][1], expected[0][2]) == ("a", "a")
    assert ("aa", "aa") in {(l, r) for _, l, r, _ in expected}


def test_bpe_matches_reference(spark, sf_dir):
    words = duckdb.sql(
        f"""
        SELECT lower(tok) AS w, count(*) AS n FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM '{sf_dir}/documents.parquet' WHERE trim(text) <> '')
        GROUP BY 1
        """
    ).fetchall()
    expected = ref_bpe({w: n for w, n in words}, 6)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = learn_bpe_merges(d, n_merges=6)
    assert got == expected


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_semantic_dedup_invariants(embeddings):
    out = semantic_dedup(embeddings, num_clusters=8, threshold=0.35)
    rows = out.collect()
    n = embeddings.count()
    assert len(rows) == n                      # every vector classified
    assert {r["cluster"] for r in rows} <= set(range(8))
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r["vec_id"])
        # the earliest member of a cluster has no earlier neighbor
        assert lowest["status"] == "keep"
    for r in rows:
        if r["status"] == "drop":
            assert r["n_dup_neighbors"] >= 1
            assert r["max_dup_cosine"] >= 0.35
        else:
            assert r["n_dup_neighbors"] == 0
            assert r["max_dup_cosine"] is None


# ---------------------------------------------------------------------------
# PQ
# ---------------------------------------------------------------------------

def test_pq_encode_shape_and_range(embeddings):
    cb = collect_codebook(embeddings, m=8, k=16, dims=64)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
    codes = pq_encode(embeddings, cb)
    n = embeddings.count()
    assert codes.count() == n * 8
    stats = codes.agg(
        F.min("code"), F.max("code"), F.countDistinct("subspace")
    ).first()
    assert stats[0] >= 0 and stats[1] <= 15 and stats[2] == 8


def test_pq_codebook_vectors_encode_to_themselves(embeddings):
    """A codebook source vector's sub-vector is at distance 0 from its
    own centroid, so vector c must encode to code c in every subspace."""
    cb = collect_codebook(embeddings, m=8, k=16, dims=64)
    codes = pq_encode(embeddings.filter(F.col("vec_id") < 16), cb)
    for r in codes.collect():
        assert r["code"] == r["vec_id"], r


def test_pq_adc_ranks_are_contract_shaped(embeddings):
    cb = collect_codebook(embeddings, m=8, k=16, dims=64)
    out = pq_adc_topk(
        embeddings, embeddings.filter(F.col("vec_id") < 4), cb, topk=5
    ).collect()
    assert len(out) == 4 * 5
    per_q: dict[int, list] = {}
    for r in out:
        assert r["adc_micro"] >= 0
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        dists = [r["adc_micro"] for r in rs]
        assert dists == sorted(dists)
        # the query itself is excluded
        assert all(r["neighbor_id"] != q for r in rs)


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

def test_pca_spectral_contracts(embeddings):
    import numpy as np

    from air_quality_etl_pipeline_spark.operators.pca import (
        pca_components,
        project,
    )

    comps, eigs = pca_components(embeddings, dims=64, q=4)
    c = np.array(comps)
    # orthonormal basis, eigenvalues descending and positive
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)
    assert eigs == sorted(eigs, reverse=True)
    assert all(e > 0 for e in eigs)
    # sign pin: the largest-|x| entry of each component is positive
    for row in c:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # projected variance per PC matches its eigenvalue (PCA's defining
    # property); the projection is rounded at 1e-6 so tolerate 1e-4
    out = project(embeddings, comps).toPandas()
    for pc in range(4):
        vals = out[out["pc"] == pc]["value"].to_numpy()
        assert abs(vals.var() - eigs[pc]) < 1e-4, (pc, vals.var(), eigs[pc])


def test_pca_moment_pass_is_exact_across_runs(embeddings):
    from air_quality_etl_pipeline_spark.operators.pca import moment_sums_micro

    g1, s1, n1 = moment_sums_micro(embeddings.repartition(7))
    g2, s2, n2 = moment_sums_micro(embeddings.repartition(3))
    assert (g1, s1, n1) == (g2, s2, n2)  # integer sums ⇒ partition-proof


def test_pca_moment_pass_survives_empty_partitions(embeddings):
    """Empty Arrow batches (empty partitions after a filter over a wide
    repartition) must be skipped, not np.stack'ed (round-12
    self-review: the one mapInPandas closure without the guard)."""
    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.operators.pca import (
        moment_sums_micro,
    )

    few = embeddings.repartition(16).filter(F.col("vec_id") < 3)
    g, s, n = moment_sums_micro(few)
    assert n == 3 and len(s) == 64 and len(g) == 64


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def test_pagerank_mass_and_dangling(spark):
    from air_quality_etl_pipeline_spark.operators.graph import pagerank_pico

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    out = {r["node"]: r["rank_pico"] for r in pagerank_pico(edges, 3).collect()}
    assert set(out) == {"a", "b", "c"}
    # hand-computed 3-iteration fixed trace (integer floor-div per step;
    # 'c' is dangling, so its mass evaporates — the documented
    # simplified-variant semantics, NOT conserved mass)
    assert out["a"] == 50_000_000_000          # base term only (no in-edges)
    assert out["b"] == 71_250_000_000          # base + d·(a/2)
    assert out["c"] == 131_812_500_000         # base + d·(a/2 + b)
    assert sum(out.values()) <= 1_000_000_000_000
    # 'c' (two in-edges) outranks 'b' (one)
    assert out["c"] > out["b"] > out["a"]


def test_pq_arrow_encode_agrees_with_catalyst(embeddings):
    from air_quality_etl_pipeline_spark.operators.pq import pq_encode_arrow

    cb = collect_codebook(embeddings, m=8, k=16, dims=64)
    a = sorted(map(tuple, pq_encode(embeddings, cb).collect()))
    b = sorted(map(tuple, pq_encode_arrow(embeddings, cb).collect()))
    assert a == b


def test_bpe_encode_vocab_matches_reference(spark, sf_dir):
    # encode exactness: every distinct word's piece count must equal a
    # pure-Python greedy merge walk with the same learned merges
    from air_quality_etl_pipeline_spark.operators.text import (
        bpe_encode_vocab,
        learn_bpe_merges,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = learn_bpe_merges(d, n_merges=6)

    def encode(word: str) -> int:
        syms = list(word)
        for _, left, right, _ in merges:
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return len(syms)

    got = bpe_encode_vocab(d, merges).collect()
    assert got, "empty vocabulary"
    for row in got:
        assert row["tok_len"] == encode(row["word"]), row["word"]
