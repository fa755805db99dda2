"""PCA for embedding columns — the dimensionality-reduction /
whitening step of an embedding-pipeline (dedup preprocessing, index
compression, drift monitoring).

Distributed decomposition (why this scales to 100 TB):

1. **Moment pass** (:func:`moment_sums_micro`): the d×d second-moment
   (Gram) matrix and the d column sums in ONE Arrow-batched pass —
   per-batch numpy matmul (BLAS), per-row products quantized to integer
   micro-units so the cross-partition sums are EXACT (order-independent
   → the covariance matrix, and therefore the eigenbasis, is
   bit-deterministic run to run). The shuffle carries d·(d+1)/2 + d
   BIGINTs per partition — nothing corpus-sized.
2. **Eigendecomposition** (:func:`pca_components`): driver-side
   ``numpy.linalg.eigh`` on the d×d covariance — O(d³) on a matrix
   that fits in L2 cache; sign-normalized (largest-|component| entry
   positive) so the basis is unique.
3. **Projection** (:func:`project`): map-side dot products against the
   component matrix bound into the plan as one constant-folded array
   literal (same plan discipline as operators/pq.py — lambdas, not
   m·d unrolled codegen).

The eigen step is genuinely non-relational, but the registered query
(workload_training.q_pca_project) emits an oracle-checkable invariant
contract — covariance diagonal + trace recomputed by DuckDB from the
raw parquet, spectral/variance-conservation checks run distributedly
over the projection — so it is fully driver-verified since round 5;
tests/test_training_ops.py additionally pins the spectral contracts
(orthonormality, descending eigenvalues, variance match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.similarity import _as_double


def moment_sums_micro(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> tuple[list[list[int]], list[int], int]:
    """One pass → (gram_micro[d][d], colsum_micro[d], n): per-row
    products/values are quantized to micro-units (``floor(x·10⁶+½)``)
    and summed as int64, so the result is exact and partition-order
    independent. The per-batch work is a numpy matmul (BLAS) over the
    Arrow batch — the closure is self-contained (imports inside) so
    workers never need this package importable."""
    def gram(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                # empty Arrow batches arrive from empty partitions
                # (e.g. a filtered/repartitioned input) — np.stack
                # raises on an empty sequence
                continue
            m = np.stack(pdf["_v"].to_numpy()).astype("float64")
            q = np.floor(
                m[:, :, None] * m[:, None, :] * 1e6 + 0.5
            ).astype("int64")
            g = q.sum(axis=0)
            s = np.floor(m * 1e6 + 0.5).astype("int64").sum(axis=0)
            yield pd.DataFrame(
                {
                    "g": [g.reshape(-1).tolist()],
                    "s": [s.tolist()],
                    "n": [int(m.shape[0])],
                }
            )

    # one row of d²+d BIGINTs per Arrow batch; the driver sums the
    # per-batch partials (#batches rows — the bounded-driver-state
    # pattern of plans/gold.dense_id, recorded in SCALE.md)
    part = df.select(_as_double(F.col(vec_col)).alias("_v")).mapInPandas(
        gram, "g array<long>, s array<long>, n long"
    )
    import numpy as np

    rows = part.collect()
    g = np.zeros(dims * dims, dtype="int64")
    s = np.zeros(dims, dtype="int64")
    n = 0
    for r in rows:
        g += np.array(r["g"], dtype="int64")
        s += np.array(r["s"], dtype="int64")
        n += r["n"]
    return (
        g.reshape(dims, dims).tolist(),
        s.tolist(),
        n,
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    q: int = 4,
    moments: tuple[list[list[int]], list[int], int] | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Top-*q* principal components of the (centered) covariance.
    Returns ``(components[q][dims], eigenvalues[q])``, eigenvalues
    descending, each component sign-normalized so its largest-magnitude
    entry is positive (LAPACK's sign is arbitrary; this pins it).
    Pass *moments* (a prior :func:`moment_sums_micro` result) to reuse
    an already-run moment pass instead of paying a second scan."""
    import numpy as np

    g, s, n = (
        moments
        if moments is not None
        else moment_sums_micro(df, vec_col, dims)
    )
    gm = np.array(g, dtype="float64") / 1e6
    sm = np.array(s, dtype="float64") / 1e6
    mu = sm / n
    cov = gm / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:q]
    comps = []
    eigs = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigs.append(float(vals[idx]))
    return comps, eigs


def projection_expr(
    components: list[list[float]], decimals: int = 6
) -> Column:
    """The projection of a ``_v`` (array<double>) column onto
    *components*, as ONE constant-folded expression returning an
    ``array<double>`` of per-component dot products quantized to
    *decimals* — the shared kernel of :func:`project` and the wide
    (one-column-per-component) form the invariant checks use."""
    comp_lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{x!r}D" for x in c) + ")"
            for c in components
        )
        + ")"
    )
    f = float(10**decimals)
    return F.expr(
        f"""
        transform({comp_lit}, c ->
          floor(aggregate(zip_with(`_v`, c, (x, y) -> x * y),
                          0.0D, (acc, t) -> acc + t) * {f}D + 0.5D) / {f}D)
        """
    )


def project(
    df: DataFrame,
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Project vectors onto *components* — returns ``(vec_id, pc,
    value)``, one row per (vector, component). Map-only: the component
    matrix constant-folds to a single plan literal and each dot product
    is a zip_with/aggregate fold inside the scan."""
    proj = projection_expr(components, decimals)
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            _as_double(F.col(vec_col)).alias("_v"),
        )
        .withColumn("_p", proj)
        .select("vec_id", F.posexplode("_p").alias("pc", "value"))
        .select("vec_id", F.col("pc").cast("long").alias("pc"), "value")
    )
