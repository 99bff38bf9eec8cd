"""Behavioral-contract tests mirrored from reference cases not otherwise
covered by name (als_test.py:60-71,256-268, bpr_test.py:37-39,
approximate_als_test.py:136-146)."""

import pickle

import numpy as np
from scipy.sparse import coo_matrix, csr_matrix

from implicit_tpu.als import AlternatingLeastSquares
from implicit_tpu.bpr import BayesianPersonalizedRanking


def _checker(n):
    dense = np.indices((n, n)).sum(axis=0) % 2
    return csr_matrix(dense.astype(np.float32))


def test_small_nan():
    # factors larger than users/items must not produce NaNs
    # (reference issue #377, als_test.py:256-268)
    likes = coo_matrix((np.ones(10), (np.arange(10), np.arange(10)))).tocsr()
    model = AlternatingLeastSquares(factors=15, random_state=0)
    model.fit(likes, show_progress=False)

    ids, scores = model.recommend(0, likes[0], N=10, filter_already_liked_items=False)
    assert not np.isnan(scores).any()
    assert ids[0] == 0  # the only liked item ranks first


def test_fit_almost_empty_matrix():
    raw = [[0, 0, 0], [0, 1, 0], [0, 0, 0]]
    BayesianPersonalizedRanking(random_state=1).fit(
        csr_matrix(np.array(raw, dtype=np.float32)), show_progress=False
    )


def test_recalculate_after_pickle():
    user_items = _checker(10)
    model = AlternatingLeastSquares(factors=2, regularization=0.1, random_state=3)
    model.fit(user_items, show_progress=False)

    original_ids, _ = model.recommend(0, user_items[0], recalculate_user=True)
    model = pickle.loads(pickle.dumps(model))
    ids, _ = model.recommend(0, user_items[0], recalculate_user=True)
    np.testing.assert_array_equal(ids, original_ids)


def test_large_recommend():
    # N beyond the catalog: results pad with id -1 / -FLT_MAX instead of
    # failing (the reference's faiss-gpu wrapper falls back to exact here)
    plays = _checker(64)
    model = AlternatingLeastSquares(factors=8, random_state=5)
    model.fit(plays, show_progress=False)

    ids, scores = model.similar_items(0, N=100)
    assert ids.shape == (100,)
    assert ids[0] == 0
    assert (ids[64:] == -1).all()

    ids, scores = model.recommend(0, plays[0], N=100, filter_already_liked_items=False)
    assert ids.shape == (100,)
    valid = ids[ids >= 0]
    assert len(np.unique(valid)) == len(valid)


def test_to_gpu_to_cpu_shims():
    """Reference conversion idioms must work unchanged
    (/root/reference/implicit/cpu/als.py:439, gpu/als.py:300): a single
    device-native implementation makes them the identity."""
    model = AlternatingLeastSquares(factors=8, iterations=2, random_state=0)
    likes = coo_matrix((np.ones(10), (np.arange(10), np.arange(10)))).tocsr()
    model.fit(likes, show_progress=False)

    gpu = model.to_gpu()
    assert gpu is model
    back = gpu.to_cpu()
    assert back is model
    ids, _ = back.recommend(0, likes[0], N=3, filter_already_liked_items=False)
    assert ids[0] == 0
