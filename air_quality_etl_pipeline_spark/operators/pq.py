"""Product quantization (Jégou et al., TPAMI'11): compress vectors to
``m`` sub-space codes and search with asymmetric distance (ADC) lookup
tables — the memory-side half of a billion-scale ANN index (IVF-PQ).

Spark-first decomposition:

- **Encode** is embarrassingly parallel: with the (tiny) codebook bound
  into the plan as ONE constant-folded literal, every vector's ``m``
  codes are computed INSIDE the scan by higher-order-function
  expressions — no shuffle, no UDF, no per-row Python. At 100 TB this
  is a map-only pass whose output is ~``m`` bytes/vector.
  (First cut unrolled all m·k distances into straight-line codegen;
  that compiled a multi-thousand-line Janino method and OOM'd a 1 GiB
  default driver — the lambda form keeps the plan O(1) in m·k and the
  codebook a single array literal. Interpreted HOF eval costs ~2× per
  element but the plan builds in milliseconds and runs anywhere.)
- **ADC search** joins the (queries × m × k, broadcast) lookup table to
  the code relation on ``(subspace, code)`` and sums ``m`` table hits
  per (query, vector) — one partial-aggregated shuffle carrying a
  single integer per pair, never the vectors themselves.

Determinism contract (what lets DuckDB reproduce the result bit-for-
bit): codebooks are a fixed rule over the corpus (sub-vectors of the
first ``k`` ids — :func:`kmeans_fit` per sub-space slots in when oracle
parity isn't needed); every distance is a left-associated fold over the
sub-dimensions quantized to integer micro-units BEFORE any argmin/sum,
so downstream comparisons are exact integer math; argmin ties break on
the lowest code id (``array_position`` returns the FIRST index of the
min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.similarity import _as_double


def collect_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dims: int = 64,
) -> list[list[list[float]]]:
    """Deterministic codebook: sub-vectors of the ``k`` lowest-id corpus
    vectors. ``codebook[j][c]`` is the ``dims//m``-wide centroid for
    code ``c`` of sub-space ``j``. The collect is O(k·dims) scalars —
    the same bounded-closure pattern as the k-means centroid matrix
    (similarity.assign_nearest_numpy)."""
    dsub = dims // m
    rows = (
        corpus.select(
            F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
        )
        .filter(F.col("_id") < k)
        .orderBy("_id")
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors with id < k")
    return [
        [list(r["_v"][j * dsub : (j + 1) * dsub]) for r in rows]
        for j in range(m)
    ]


def _cb_literal(codebook: list[list[list[float]]]) -> str:
    """The codebook as one SQL array literal (``repr`` round-trips
    doubles exactly; the ``D`` suffix pins DOUBLE, not DECIMAL).
    Catalyst constant-folds the CreateArray tree to a single Literal,
    so codegen sees one constant, not m·k·dsub leaf expressions."""
    return (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x!r}D" for x in cent) + ")"
                for cent in sub
            )
            + ")"
            for sub in codebook
        )
        + ")"
    )


def _dmat(vec: str, codebook: list[list[list[float]]]) -> Column:
    """``array<array<bigint>>`` of micro-quantized squared-L2 distances:
    ``dmat[j][c]`` = ``floor(‖vec_sub_j − codebook[j][c]‖² · 10⁶ + ½)``.
    The inner fold is ``aggregate(zip_with(...))`` — left-associated,
    the same element order as DuckDB's ``list_sum(list_transform(...))``
    twin, which is the cross-engine contract."""
    m = len(codebook)
    dsub = len(codebook[0][0])
    cb = _cb_literal(codebook)
    return F.expr(
        f"""
        transform(sequence(0, {m - 1}), j ->
          transform(element_at({cb}, j + 1), cent ->
            CAST(floor(aggregate(
              zip_with(slice(`{vec}`, j * {dsub} + 1, {dsub}), cent,
                       (x, y) -> (x - y) * (x - y)),
              0.0D, (acc, t) -> acc + t) * 1e6 + 0.5) AS BIGINT)))
        """
    )


def pq_encode(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codes — returns ``(vec_id, subspace,
    code)``, one row per sub-space (unnested for joinability; pack with
    ``collect_list`` if a code column is wanted). Entirely map-side:
    per sub-space the argmin over the distance row is
    ``array_position(min)`` (first index ⇒ lowest code wins ties)."""
    v = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_dmat", _dmat("_v", codebook))
    return v.select(
        "vec_id", F.posexplode("_dmat").alias("subspace", "_dd")
    ).select(
        "vec_id",
        F.col("subspace").cast("long").alias("subspace"),
        (F.array_position(F.col("_dd"), F.array_min("_dd")) - 1)
        .cast("long")
        .alias("code"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 5,
    encode_mode: str = "arrow",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k: exact query sub-vector → quantized
    corpus. Cross-relation callers with independent id spaces must
    pass ``exclude_self=False`` (same contract as
    ``similarity.cosine_topk``). Returns ``(query_id, neighbor_id,
    adc_micro, rank)`` where
    ``adc_micro`` is the ADC squared-L2 distance in integer micro-units
    (sum of m per-sub-space distances, each pre-quantized — exact, so
    cross-engine and partition-order independent).

    Plan shape: the LUT is queries × m × k rows (tiny — broadcast); the
    code relation streams through the join and the (query, vector) sum
    partial-aggregates map-side. The corpus vectors are never touched
    after encoding — that is the point of PQ. *encode_mode* picks the
    corpus-encode path — ``"arrow"`` (default; ~20× throughput) or
    ``"catalyst"`` (pure-JVM plan); both are bit-identical
    (agreement-tested), so the choice is operational, not semantic."""
    enc = pq_encode_arrow if encode_mode == "arrow" else pq_encode
    codes = enc(corpus, codebook, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_dmat", _dmat("_q", codebook))
    lut = F.broadcast(
        q.select("query_id", F.posexplode("_dmat").alias("subspace", "_dd"))
        .select(
            "query_id",
            F.col("subspace").cast("long").alias("subspace"),
            F.posexplode("_dd").alias("code", "dmicro"),
        )
        .select(
            "query_id",
            "subspace",
            F.col("code").cast("long").alias("code"),
            "dmicro",
        )
    )
    scored = codes.join(lut, on=["subspace", "code"])
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("vec_id"))
    scored = scored.groupBy(
        "query_id", F.col("vec_id").alias("neighbor_id")
    ).agg(F.sum("dmicro").cast("long").alias("adc_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adc_micro", "rank")
    )


def pq_encode_arrow(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched encode — bit-identical to :func:`pq_encode` but
    ~20× the throughput: the Catalyst HOF path evaluates m·k
    interpreted folds per row (~0.5 ms/vector single-threaded); here
    each Arrow batch runs the same arithmetic as vectorized numpy.

    Exactness is engineered, not hoped for: the distance accumulates
    with an explicit per-dimension loop (``acc = acc + diff²``) — the
    SAME left-associated float64 fold order as the Catalyst lambda and
    the DuckDB ``list_sum`` twin (numpy's ``.sum()`` would use pairwise
    summation and drift in the last ulp) — then micro-quantizes before
    ``argmin`` (first-min ⇒ lowest code, matching ``array_position``).
    The agreement test in tests/test_training_ops.py pins
    Catalyst ≡ Arrow on every vector.

    The closure is self-contained (imports inside, codebook captured as
    plain lists) so workers never import this package."""
    m = len(codebook)
    k = len(codebook[0])
    dsub = len(codebook[0][0])
    cb = [[list(c) for c in sub] for sub in codebook]

    def encode(batches):
        import numpy as np
        import pandas as pd

        C = np.array(cb, dtype="float64")  # (m, k, dsub)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            M = np.stack(pdf["_v"].to_numpy()).astype("float64")
            n = M.shape[0]
            codes = np.empty((n, m), dtype="int64")
            for j in range(m):
                sub = M[:, j * dsub : (j + 1) * dsub]
                acc = np.zeros((n, k), dtype="float64")
                for i in range(dsub):
                    diff = sub[:, i : i + 1] - C[j][:, i][None, :]
                    acc = acc + diff * diff
                dm = np.floor(acc * 1e6 + 0.5).astype("int64")
                codes[:, j] = dm.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, m),
                    "subspace": np.tile(np.arange(m, dtype="int64"), n),
                    "code": codes.reshape(-1),
                }
            )

    return corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    ).mapInPandas(encode, "vec_id long, subspace long, code long")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 5,
    centroid_stride: int | None = None,
    nprobe: int = 2,
    sim_decimals: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ: the full billion-scale ANN index architecture (Jégou et
    al., TPAMI'11 §V) — coarse quantizer partitions the corpus into
    inverted lists, product quantization compresses the residents, and
    a query scans only its ``nprobe`` nearest lists with ADC lookup
    tables. Composition of :func:`~.similarity.ivf_topk`'s routing
    with :func:`pq_adc_topk`'s scoring:

    - *assignment* (corpus → list) is a map-side ``max_by`` over the
      broadcast centroid set — one row per vector on the wire, no
      window sort;
    - *codes* come from the Arrow encode path (bit-identical to the
      Catalyst path, agreement-tested);
    - *search* joins the slim ``(vec_id, cid, subspace, code)``
      relation to the broadcast probe set on ``cid`` and the broadcast
      LUT on ``(query_id, subspace, code)``, then partial-aggregates
      the ``m`` integer micro-distances per (query, vector).

    At scale the code relation would be written out bucketed by
    ``cid`` once and reused across every query batch; all per-query
    state (probes, LUT) is broadcast-sized. Distances are integer
    micro-units end-to-end, so ranking is exact and engine-portable.
    """
    from air_quality_etl_pipeline_spark.operators.similarity import (
        _norm_expr,
        _pair_cosine,
        _resolve_stride,
    )

    # None → √N-balanced coarse quantizer (see similarity.balanced_stride)
    centroid_stride = _resolve_stride(centroid_stride, corpus)
    c = corpus.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", _norm_expr("_v"))
    cents = F.broadcast(
        c.filter(F.col("_id") % centroid_stride == 0).select(
            F.col("_id").alias("cid"),
            F.col("_v").alias("centv"),
            F.col("_n").alias("centn"),
        )
    )
    # rank-1 list assignment: max_by on (rounded cosine DESC, cid ASC)
    # — ties break to the LOWEST cid via the negated id in the struct
    scored = c.crossJoin(cents).withColumn(
        "_cos", _pair_cosine("_v", "_n", "centv", "centn", None, sim_decimals)
    )
    assign = scored.groupBy(F.col("_id").alias("vec_id")).agg(
        F.max_by(
            "cid", F.struct(F.col("_cos").alias("c"), (-F.col("cid")).alias("t"))
        ).alias("cid")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_qn", _norm_expr("_q"))
    qscored = q.crossJoin(cents).withColumn(
        "_cos", _pair_cosine("_q", "_qn", "centv", "centn", None, sim_decimals)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("cid").asc()
    )
    probes = F.broadcast(
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cid")
    )

    codes = pq_encode_arrow(corpus, codebook, id_col, vec_col)
    lut = F.broadcast(
        q.withColumn("_dmat", _dmat("_q", codebook))
        .select("query_id", F.posexplode("_dmat").alias("subspace", "_dd"))
        .select(
            "query_id",
            F.col("subspace").cast("long").alias("subspace"),
            F.posexplode("_dd").alias("code", "dmicro"),
        )
        .select(
            "query_id",
            "subspace",
            F.col("code").cast("long").alias("code"),
            "dmicro",
        )
    )
    cand = codes.join(assign, on="vec_id").join(probes, on="cid")
    adc = cand.join(lut, on=["query_id", "subspace", "code"])
    if exclude_self:
        adc = adc.filter(F.col("query_id") != F.col("vec_id"))
    adc = adc.groupBy(
        "query_id", F.col("vec_id").alias("neighbor_id")
    ).agg(F.sum("dmicro").cast("long").alias("adc_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adc_micro", "rank")
    )
