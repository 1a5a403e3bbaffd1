"""Embedding dimensionality reduction: distributed PCA + seeded
Gaussian random projection.

The standard ANN-pipeline preprocessing pair (public methods: Pearson
1901 PCA; Johnson-Lindenstrauss random projection): cut an
``array<float>`` embedding column from d to d' before indexing, either
variance-optimally (PCA) or obliviously (JL), shrinking the IVF/LSH
index and every GEMM downstream by d'/d.

Spark shape for PCA: covariance needs exactly (count, Σx, ΣxxT) —
d²+d+1 numbers REGARDLESS of corpus size. One Arrow-batched pass emits
per-batch partial sums as (index, value) rows, one aggregation
combines them (the only shuffle, key domain d²+d+1), and the d×d
eigendecomposition runs driver-side on the collected moment matrix —
the same bounded-collect discipline as the IVF k-means trainer.
Eigenvector SIGNS are canonicalized (the largest-|loading| component
is made positive) so the learned basis is reproducible up to the
float-summation order of the partial aggregation.

Projection (both methods) is an Arrow-batched GEMM against the
broadcast (d×d') matrix — vectors stream once, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_partials(vec_col: str, d: int):
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if x.shape[1] != d:
                raise ValueError(
                    f"embedding dim {x.shape[1]} != declared {d}"
                )
            n = x.shape[0]
            s = x.sum(axis=0)
            g = x.T @ x
            idx = [0] + [1 + i for i in range(d)] + [
                1 + d + i * d + j for i in range(d) for j in range(d)
            ]
            val = [float(n)] + s.tolist() + g.reshape(-1).tolist()
            yield pd.DataFrame({"idx": idx, "val": val})

    return op


def pca_train(
    df: DataFrame, vec_col: str = "embedding", d: int = 64, d_out: int = 16
) -> dict:
    """One distributed pass → {"mean": (d,), "components": (d_out, d),
    "explained": (d_out,)}: covariance from the aggregated moments,
    driver-side ``eigh``, top ``d_out`` eigenvectors by eigenvalue
    descending with canonical signs."""
    moments = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(_moment_partials(vec_col, d), "idx long, val double")
        .groupBy("idx")
        .agg(F.sum("val").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d)
    for r in moments:
        flat[r["idx"]] = r["v"]
    n = flat[0]
    if n < 2:
        raise ValueError(f"PCA needs >= 2 vectors, got {int(n)}")
    mean = flat[1 : 1 + d] / n
    gram = flat[1 + d :].reshape(d, d)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:d_out]
    comps = evecs[:, order].T  # (d_out, d)
    for i in range(comps.shape[0]):  # canonical sign: max-|loading| > 0
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained": evals[order],
    }


def project(
    df: DataFrame,
    matrix: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    out_col: str = "reduced",
) -> DataFrame:
    """Arrow-batched GEMM projection: out = (x - mean) @ matrix.T for a
    (d_out, d) matrix. The matrix rides the closure (broadcast by
    Spark's task serialization — d·d' floats)."""
    mat = np.asarray(matrix, dtype=np.float64)
    mu = np.zeros(mat.shape[1]) if mean is None else np.asarray(mean, float)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            red = (x - mu) @ mat.T
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [row.astype(np.float32).tolist() for row in red],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        op, f"{id_col} bigint, {out_col} array<float>"
    )


def random_projection_matrix(d: int, d_out: int, seed: int = 0) -> np.ndarray:
    """Seeded Gaussian JL matrix, scaled by 1/sqrt(d_out) so expected
    pairwise distances are preserved; deterministic in (d, d_out,
    seed)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((d_out, d)) / np.sqrt(d_out)
