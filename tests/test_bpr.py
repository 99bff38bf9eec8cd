"""BPR-specific tests (see /root/reference/tests/bpr_test.py:31-39)."""

import numpy as np
from scipy.sparse import csr_matrix

from implicit_tpu.bpr import BayesianPersonalizedRanking


def test_empty_matrix():
    # fitting an empty matrix must not crash (reference issue #264)
    raw = [[0.0, 2.0, 1.5], [0.0, 0.0, 0.0]]
    model = BayesianPersonalizedRanking(factors=2, iterations=2, random_state=0)
    model.fit(csr_matrix(np.zeros((3, 3), dtype=np.float32)), show_progress=False)

    model = BayesianPersonalizedRanking(factors=2, iterations=2, random_state=0)
    model.fit(csr_matrix(np.array(raw, dtype=np.float32)), show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert np.isfinite(model.item_factors).all()


def test_factor_layout():
    # factors+1 columns; user bias column pinned to 1.0
    likes = csr_matrix(np.ones((6, 5), dtype=np.float32))
    model = BayesianPersonalizedRanking(factors=4, iterations=3, random_state=1)
    model.fit(likes, show_progress=False)
    assert model.user_factors.shape == (6, 5)
    assert model.item_factors.shape == (5, 5)
    np.testing.assert_allclose(model.user_factors[:, -1], 1.0)


def test_unliked_users_items_zeroed():
    mat = np.zeros((5, 5), dtype=np.float32)
    mat[0, 0] = mat[1, 1] = mat[2, 2] = 1.0
    model = BayesianPersonalizedRanking(factors=3, iterations=2, random_state=2)
    model.fit(csr_matrix(mat), show_progress=False)
    # users/items with no interactions start at all-zero factors and are
    # never sampled, so they stay zero (up to the pinned user bias column)
    np.testing.assert_allclose(model.user_factors[4, :-1], 0.0)
    np.testing.assert_allclose(model.user_factors[4, -1], 1.0)
    np.testing.assert_allclose(model.item_factors[4], 0.0)
