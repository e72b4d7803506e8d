"""Distributed PCA (operators/decomposition.py) against numpy ground
truth on the embeddings corpus."""

from __future__ import annotations

import numpy as np
import pytest

from white_elephant_spark.operators.decomposition import fit_pca, project_pca
from white_elephant_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x - mean, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    return mean, vals[order], vecs[:, order].T


def test_components_match_numpy(spark, emb):
    model = fit_pca(emb, K)
    x = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    mean, vals, comps = _numpy_pca(x, K)
    assert np.allclose(model.mean, mean, atol=1e-9)
    # Components match up to sign; model normalizes sign itself.
    for i in range(K):
        c = comps[i] if comps[i][np.argmax(np.abs(comps[i]))] > 0 else -comps[i]
        assert np.allclose(model.components[i], c, atol=1e-6), i
    # Orthonormal, variance-ordered
    assert np.allclose(model.components @ model.components.T, np.eye(K), atol=1e-8)
    assert all(a >= b - 1e-12 for a, b in zip(model.explained, model.explained[1:]))


def test_projection_reduces_reconstruction_error(spark, emb):
    model_small = fit_pca(emb, 2)
    model_big = fit_pca(emb, 32)
    x = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)

    def recon_err(model):
        red = model.transform_np(x)
        back = red @ model.components + model.mean
        return float(((x - back) ** 2).sum())

    assert recon_err(model_big) < recon_err(model_small)

    out = project_pca(emb, model_small).collect()
    assert len(out) == len(x)
    assert all(len(r["reduced"]) == 2 for r in out)
    by_id = {r["vec_id"]: np.array(r["reduced"]) for r in out}
    ids = [r["vec_id"] for r in emb.collect()]
    expected = model_small.transform_np(x)
    for vid, exp in zip(ids, expected):
        assert np.allclose(by_id[vid], exp, atol=1e-9)


def test_partitioning_invariance(spark, emb):
    m1 = fit_pca(emb.repartition(1), K)
    m8 = fit_pca(emb.repartition(8), K)
    assert np.allclose(m1.mean, m8.mean, atol=1e-9)
    assert np.allclose(np.abs(m1.components), np.abs(m8.components), atol=1e-6)


def test_driver_input_bounded_by_reduce_width(spark, emb):
    """The driver combine reads at most REDUCE_WIDTH rows even when the
    scan has far more partitions (the tree-reduce level, not the
    partition count, bounds driver input)."""
    from white_elephant_spark.operators import decomposition as dc

    wide = emb.repartition(dc.DIRECT_COLLECT_MAX + 8)  # beyond direct collect
    m = fit_pca(wide, K)
    m1 = fit_pca(emb.repartition(1), K)
    assert np.allclose(m.mean, m1.mean, atol=1e-9)
    assert dc.REDUCE_WIDTH < dc.DIRECT_COLLECT_MAX


def test_null_vectors_dropped_not_errored(spark):
    # A NULL embedding row must not kill the fit or the projection
    # (np.array over a None-bearing column degrades to dtype object):
    # drop-don't-error, like every other operator boundary.
    import numpy as np

    rows = [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [5.0, 6.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    model = fit_pca(df, k=1)
    clean = df.filter(df.embedding.isNotNull())
    want = fit_pca(clean, k=1)
    assert np.allclose(model.mean, want.mean)
    assert np.allclose(model.components, want.components)
    out = project_pca(df, model).collect()
    assert sorted(r["id"] for r in out) == [1, 3, 4]
