"""Embedding dim-reduction contract (operators/projection.py).

The distributed PCA must match numpy's reference PCA on the SAME data
(subspace equality via projector comparison — eigenvector sign and
order ambiguity handled by comparing P = VᵀV); random projection must
be deterministic in its seed and approximately preserve pairwise
distances (the JL property); and reduced-dimension ANN must retain
most of the full-dimension neighbor structure on clustered data.
"""

from __future__ import annotations

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import projection


def _clustered(rng, n=400, d=24, n_clusters=5, spread=0.15):
    centers = rng.standard_normal((n_clusters, d)) * 2
    labels = rng.integers(0, n_clusters, n)
    return centers[labels] + rng.standard_normal((n, d)) * spread


def _df(spark, x):
    rows = [(i, row.astype(np.float32).tolist()) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "doc_id bigint, embedding array<float>")


def test_pca_matches_numpy_reference_subspace(spark):
    rng = np.random.default_rng(0xBCA)
    x = _clustered(rng, d=24)
    model = projection.pca_train(_df(spark, x), d=24, d_out=4)
    # reference PCA, float64, centered
    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(np.cov(xc.T, bias=True))
    ref = evecs[:, np.argsort(evals)[::-1][:4]].T
    # subspace equality: projectors must agree regardless of sign/order
    p_got = model["components"].T @ model["components"]
    p_ref = ref.T @ ref
    assert np.allclose(p_got, p_ref, atol=1e-8)
    assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-9)
    assert np.all(np.diff(model["explained"]) <= 1e-12)  # sorted desc


def test_pca_partition_count_does_not_change_subspace(spark):
    rng = np.random.default_rng(1)
    x = _clustered(rng, n=300, d=16)
    m1 = projection.pca_train(_df(spark, x).repartition(2), d=16, d_out=3)
    m2 = projection.pca_train(_df(spark, x).repartition(17), d=16, d_out=3)
    p1 = m1["components"].T @ m1["components"]
    p2 = m2["components"].T @ m2["components"]
    assert np.allclose(p1, p2, atol=1e-8)


def test_projection_gemm_matches_local(spark):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 12))
    mat = projection.random_projection_matrix(12, 4, seed=9)
    got = {
        r.doc_id: np.array(r.reduced)
        for r in projection.project(_df(spark, x), mat).collect()
    }
    # the operator consumes float32-typed vectors — compare against the
    # same float32-rounded input
    want = x.astype(np.float32).astype(np.float64) @ mat.T
    for i in range(50):
        assert np.allclose(got[i], want[i], atol=1e-6), i


def test_random_projection_seed_determinism_and_jl(spark):
    m1 = projection.random_projection_matrix(64, 16, seed=5)
    m2 = projection.random_projection_matrix(64, 16, seed=5)
    m3 = projection.random_projection_matrix(64, 16, seed=6)
    assert (m1 == m2).all() and not (m1 == m3).all()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 64))
    red = x @ m1.T
    # JL: pairwise distance ratios concentrate near 1
    idx = rng.integers(0, 200, (300, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_full = np.linalg.norm(x[idx[:, 0]] - x[idx[:, 1]], axis=1)
    d_red = np.linalg.norm(red[idx[:, 0]] - red[idx[:, 1]], axis=1)
    ratios = d_red / d_full
    assert 0.75 < np.median(ratios) < 1.25
    assert (np.abs(ratios - 1) < 0.6).mean() > 0.95


def test_reduced_ann_preserves_neighbor_structure(spark):
    """PCA-4 on 5-cluster data: nearest-neighbor CLUSTER assignments
    survive the reduction for almost every point — the property that
    makes reduced-dim ANN useful."""
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((5, 24)) * 2
    labels = rng.integers(0, 5, 300)
    x = centers[labels] + rng.standard_normal((300, 24)) * 0.1
    model = projection.pca_train(_df(spark, x), d=24, d_out=4)
    red = {
        r.doc_id: np.array(r.reduced)
        for r in projection.project(
            _df(spark, x), model["components"], mean=model["mean"]
        ).collect()
    }
    red_centers = (centers - model["mean"]) @ model["components"].T
    assigned = np.array(
        [np.argmin(np.linalg.norm(red_centers - red[i], axis=1)) for i in range(300)]
    )
    assert (assigned == labels).mean() > 0.97


def test_errors(spark):
    rng = np.random.default_rng(5)
    with pytest.raises(ValueError, match=">= 2"):
        projection.pca_train(_df(spark, rng.standard_normal((1, 8))), d=8, d_out=2)
    with pytest.raises(Exception):  # dim mismatch surfaces from the pass
        projection.pca_train(_df(spark, rng.standard_normal((10, 8))), d=16, d_out=2)
