"""Distributed PCA (operators/pca.py) vs single-node numpy PCA.

The oracle-checked surface (trace identity) rides
``embedding_label_stats``; these tests certify what SQL cannot see:
eigenvector directions, the projection fold, and the per-label moment
decomposition, all against a one-shot numpy reference on the same
parquet."""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import pca as P


def _numpy_vectors(sf_dir):
    import duckdb

    rows = duckdb.sql(
        f"SELECT label, CAST(embedding AS DOUBLE[]) FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    labels = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    return labels, V


def _ref_model(V, k):
    mean = V.mean(axis=0)
    X = V - mean
    cov = (X.T @ X) / V.shape[0]
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    comps = v[:, :k].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, w, comps


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    return P.pca_fit(emb, "embedding", label_col=None, k=8), emb


def test_global_model_matches_numpy(fitted, sf_dir):
    models, _ = fitted
    assert set(models) == {0}
    m = models[0]
    _, V = _numpy_vectors(sf_dir)
    mean, w, comps = _ref_model(V, 8)
    assert m.n == V.shape[0]
    np.testing.assert_allclose(m.mean, mean, rtol=0, atol=1e-10)
    np.testing.assert_allclose(m.eigvals, w, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(m.components, comps, rtol=0, atol=1e-6)
    # trace identity the SQL oracle checks
    assert float(m.eigvals.sum()) == pytest.approx(V.var(axis=0).sum(), rel=1e-10)


def test_per_label_models(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    models = P.pca_fit(emb, "embedding", label_col="label", k=4)
    labels, V = _numpy_vectors(sf_dir)
    assert set(models) == set(int(x) for x in np.unique(labels))
    for lab, m in models.items():
        Vl = V[labels == lab]
        assert m.n == Vl.shape[0]
        assert float(m.eigvals.sum()) == pytest.approx(Vl.var(axis=0).sum(), rel=1e-9)


def test_projection_matches_numpy(fitted, sf_dir):
    models, emb = fitted
    m = models[0]
    out = (
        P.pca_project(emb, m, "embedding", "pca")
        .orderBy("vec_id")
        .select("pca")
        .collect()
    )
    got = np.array([r["pca"] for r in out])
    _, V = _numpy_vectors(sf_dir)
    ref = (V - m.mean) @ m.components.T
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_projection_is_jvm_only(fitted):
    models, emb = fitted
    plan = (
        P.pca_project(emb, models[0], "embedding", "pca")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_explained_variance_ratio(fitted):
    models, _ = fitted
    r = P.explained_variance_ratio(models[0])
    assert np.all(np.diff(r) <= 1e-12)  # descending
    assert 0 < r.sum() <= 1.0 + 1e-9


def test_validation(spark, sf_dir, monkeypatch):
    emb = load_tables(spark, sf_dir)["embeddings"]
    with pytest.raises(ValueError, match="k must be"):
        P.pca_fit(emb, "embedding", k=0)
    monkeypatch.setattr(P, "_MAX_LABELS", 100)
    with pytest.raises(ValueError, match="budget"):
        P.pca_fit(emb, "embedding", label_col="vec_id")


def test_non_integral_label_raises(spark):
    """A string label column would silently cast-to-NULL every row and
    return {} (indistinguishable from an all-invalid corpus) — it must
    raise up front instead (r11 ADVICE)."""
    df = spark.createDataFrame(
        [("en", [1.0, 2.0]), ("fr", [3.0, 4.0])],
        "lang string, embedding array<double>",
    )
    with pytest.raises(ValueError, match="integral"):
        P.pca_fit(df, "embedding", label_col="lang")
