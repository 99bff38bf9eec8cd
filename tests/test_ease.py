"""EASE-specific tests (beyond-reference model; see implicit_tpu/ease.py).

The shared behavioral contract runs through tests/test_models_common.py via
the ``ease`` fixture; these cover the closed-form math, the sparsification,
persistence of the extra hyperparameters, and end-to-end quality.
"""

import io

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from implicit_tpu.ease import EASERecommender, ease_weights


def _dense_ease_oracle(X, lam):
    """Direct numpy transcription of the closed form (Steck 2019, eq. 8)."""
    G = X.T @ X + lam * np.eye(X.shape[1])
    P = np.linalg.inv(G)
    B = -P / np.diag(P)[None, :]
    np.fill_diagonal(B, 0.0)
    return B


def test_weights_match_closed_form():
    rng = np.random.default_rng(0)
    X = (rng.random((60, 25)) < 0.2).astype(np.float32)
    lam = 3.0
    B = np.asarray(ease_weights(csr_matrix(X), lam))
    np.testing.assert_allclose(B, _dense_ease_oracle(X, lam), atol=2e-4)
    np.testing.assert_allclose(np.diag(B), 0.0)


def test_negative_weights_survive_sparsification():
    # EASE's suppression of popular-but-unpredictive co-occurrence lives in
    # its negative weights; with K = items they must all be stored
    rng = np.random.default_rng(1)
    X = (rng.random((80, 20)) < 0.3).astype(np.float32)
    model = EASERecommender(K=20, regularization=2.0)
    model.fit(csr_matrix(X), show_progress=False)
    assert (model.similarity.data < 0).any()


def test_self_affinity_diagonal():
    # the stored similarity ranks every item most similar to itself (KNN
    # family serving parity), strictly above its row max
    rng = np.random.default_rng(2)
    X = (rng.random((50, 15)) < 0.3).astype(np.float32)
    model = EASERecommender(K=15, regularization=2.0)
    model.fit(csr_matrix(X), show_progress=False)
    sim = model.similarity.toarray()
    for i in range(15):
        off = np.delete(sim[i], i)
        assert sim[i, i] > off.max()


def test_binarize_flag():
    rng = np.random.default_rng(3)
    X = (rng.random((40, 12)) < 0.3) * rng.integers(1, 9, (40, 12))
    X = csr_matrix(X.astype(np.float32))
    binary = EASERecommender(K=12, regularization=2.0)
    binary.fit(X, show_progress=False)
    raw = EASERecommender(K=12, regularization=2.0, binarize=False)
    raw.fit(X, show_progress=False)
    Xb = X.copy()
    Xb.data = np.ones_like(Xb.data)
    np.testing.assert_allclose(
        binary.similarity.toarray(),
        _ease_similarity_oracle(Xb.toarray(), 2.0),
        atol=2e-4,
    )
    assert not np.allclose(binary.similarity.toarray(), raw.similarity.toarray())


def _ease_similarity_oracle(X, lam):
    B = _dense_ease_oracle(X, lam)
    rowmax = np.maximum(B.max(axis=1), 0.0) + 1.0
    np.fill_diagonal(B, rowmax)
    return B


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    X = csr_matrix((rng.random((40, 12)) < 0.3).astype(np.float32))
    model = EASERecommender(K=8, regularization=7.5, binarize=False)
    model.fit(X, show_progress=False)

    path = str(tmp_path / "ease_model")
    model.save(path)
    loaded = EASERecommender.load(path)
    assert loaded.K == 8
    assert loaded.regularization == 7.5
    assert loaded.binarize is False
    np.testing.assert_allclose(
        loaded.similarity.toarray(), model.similarity.toarray())

    ids1, s1 = model.recommend(0, X[0], N=5)
    ids2, s2 = loaded.recommend(0, X[0], N=5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(s1, s2)

    # file-object round trip (the reference mixin's save/load file contract)
    buf = io.BytesIO()
    model.save(buf)
    buf.seek(0)
    from_buf = EASERecommender.load(buf)
    np.testing.assert_allclose(
        from_buf.similarity.toarray(), model.similarity.toarray())


def test_catalog_cap():
    from implicit_tpu import ease

    big = csr_matrix((np.ones(2), (np.zeros(2, int), [0, ease._EASE_MAX_ITEMS])),
                     shape=(1, ease._EASE_MAX_ITEMS + 1))
    with pytest.raises(ValueError, match="don't fit one chip"):
        ease_weights(big)


def test_quality_clustered():
    """End-to-end p@10 on the clustered synthetic set — EASE should be at
    least as strong as the heuristic KNN models on clusterable data."""
    from implicit_tpu.datasets.synthetic import get_synthetic_clustered
    from implicit_tpu.evaluation import ranking_metrics_at_k, train_test_split

    likes = get_synthetic_clustered(users=1500, items=400, groups=16,
                                    likes_per_user=20, seed=7)
    train, test = train_test_split(likes, train_percentage=0.8, random_state=19)
    model = EASERecommender(K=100, regularization=50.0)
    model.fit(train, show_progress=False)
    p10 = ranking_metrics_at_k(model, train, test, K=10,
                               show_progress=False)["precision"]
    assert p10 > 0.5, p10


def test_size1_mesh_degrades_to_plain_solve():
    """A 1-chip mesh gains nothing from the sharded EASE formulation but
    pays its higher per-chip footprint, which would LOWER the catalog cap
    below the plain solve's — so mesh=1 must route to the plain path (and
    keep the plain cap)."""
    from implicit_tpu.ease import _ease_max_items, _resolve_ease_mesh

    assert _resolve_ease_mesh(None) is None
    assert _resolve_ease_mesh(1) is None
    assert _ease_max_items(None) > _ease_max_items(2)

    rng = np.random.RandomState(3)
    mat = csr_matrix((rng.rand(30, 12) < 0.4).astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(ease_weights(mat, 2.0, mesh=1)),
        np.asarray(ease_weights(mat, 2.0)),
        rtol=1e-6, atol=1e-7,
    )
