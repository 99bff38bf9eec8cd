"""LMF-specific tests."""

import numpy as np
from scipy.sparse import csr_matrix

from implicit_tpu.lmf import LogisticMatrixFactorization


def test_factor_layout():
    # factors+2 columns; user[:, -2] and item[:, -1] pinned to 1.0
    likes = csr_matrix(np.ones((6, 5), dtype=np.float32))
    model = LogisticMatrixFactorization(factors=4, iterations=3, random_state=1)
    model.fit(likes, show_progress=False)
    assert model.user_factors.shape == (6, 6)
    assert model.item_factors.shape == (5, 6)
    np.testing.assert_allclose(model.user_factors[:, -2], 1.0)
    np.testing.assert_allclose(model.item_factors[:, -1], 1.0)


def test_empty_matrix():
    model = LogisticMatrixFactorization(factors=2, iterations=2, random_state=0)
    model.fit(csr_matrix(np.zeros((3, 3), dtype=np.float32)), show_progress=False)


def test_finite_factors():
    rng = np.random.RandomState(3)
    mat = (rng.rand(40, 30) < 0.2).astype(np.float32)
    model = LogisticMatrixFactorization(factors=8, iterations=10, random_state=3)
    model.fit(csr_matrix(mat), show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert np.isfinite(model.item_factors).all()
