"""Split protocols and ranking metrics.

Covers /root/reference/tests/evaluation_test.py:22-119: determinism and
conservation properties of the splits, plus a quality gate — ALS must reach
p@10 > 0.2 on a structured dataset. Since datasets can't be downloaded in this
environment the gate runs on a synthetic blocked-preference matrix instead of
MovieLens-100k; it exercises the same full recommend+metrics loop.
"""

import numpy as np
import pytest
from scipy.sparse import csr_matrix, random as sparse_random

from implicit_tpu.als import AlternatingLeastSquares
from implicit_tpu.evaluation import (
    leave_k_out_split,
    precision_at_k,
    ranking_metrics_at_k,
    train_test_split,
)


def _random_ratings(users=120, items=80, seed=1):
    rng = np.random.RandomState(seed)
    mat = sparse_random(users, items, density=0.2, random_state=rng, format="csr")
    mat.data = np.ceil(mat.data * 5)
    return mat


def test_train_test_split_conserves():
    ratings = _random_ratings()
    train, test = train_test_split(ratings, train_percentage=0.8, random_state=98765)
    assert train.nnz + test.nnz == ratings.nnz
    assert (train.multiply(test)).nnz == 0  # disjoint
    np.testing.assert_allclose((train + test).toarray(), ratings.toarray())


def test_train_test_split_deterministic():
    ratings = _random_ratings()
    train1, test1 = train_test_split(ratings, random_state=123)
    train2, test2 = train_test_split(ratings, random_state=123)
    assert (train1 != train2).nnz == 0
    assert (test1 != test2).nnz == 0


def test_leave_k_out_split():
    ratings = _random_ratings()
    train, test = leave_k_out_split(ratings, K=1, random_state=42)

    assert train.nnz + test.nnz == ratings.nnz
    # each test user contributes exactly K entries
    test_counts = np.diff(test.tocsr().indptr)
    assert set(np.unique(test_counts)) <= {0, 1}

    # users in test had more than K+1 ratings
    user_counts = np.diff(ratings.tocsr().indptr)
    for u in np.flatnonzero(test_counts):
        assert user_counts[u] > 2


def test_leave_k_out_raises():
    ratings = _random_ratings()
    with pytest.raises(ValueError):
        leave_k_out_split(ratings, K=0)
    with pytest.raises(ValueError):
        leave_k_out_split(ratings, K=1, train_only_size=1.5)


class _PerfectModel:
    """Recommends each user's test items first — all metrics should be 1."""

    def __init__(self, test):
        self.test = test.tocsr()

    def recommend(self, userids, user_items, N=10):
        ids = np.full((len(userids), N), -1, dtype=np.int32)
        for i, u in enumerate(userids):
            liked = self.test[int(u)].indices[:N]
            ids[i, : len(liked)] = liked
            # fill remaining slots with guaranteed misses
            ids[i, len(liked):] = np.arange(len(liked), N) + self.test.shape[1]
        return ids, np.zeros_like(ids, dtype=np.float32)


def test_metrics_perfect_model():
    # every user has exactly 3 test likes (< K) so a perfect ranking scores
    # 1.0 on every metric, including the trapezoid AUC
    users, items = 40, 30
    rng = np.random.RandomState(3)
    rows = np.repeat(np.arange(users), 3)
    cols = np.concatenate([rng.choice(items, 3, replace=False) for _ in range(users)])
    test = csr_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(users, items))
    train = csr_matrix(test.shape)
    model = _PerfectModel(test)
    metrics = ranking_metrics_at_k(model, train, test, K=10, show_progress=False)
    assert metrics["precision"] == pytest.approx(1.0)
    assert metrics["map"] == pytest.approx(1.0)
    assert metrics["ndcg"] == pytest.approx(1.0)
    assert metrics["auc"] == pytest.approx(1.0)


def test_metrics_hand_computed():
    # 1 user, 4 items; test likes = {0, 2}; model recommends [0, 1, 2]
    test = csr_matrix(np.array([[1, 0, 1, 0]], dtype=np.float32))
    train = csr_matrix(test.shape)

    class _Fixed:
        def recommend(self, userids, user_items, N=10):
            return np.array([[0, 1, 2]], dtype=np.int32), np.zeros((1, 3), dtype=np.float32)

    metrics = ranking_metrics_at_k(_Fixed(), train, test, K=3, show_progress=False)
    # precision: 2 hits / min(3, 2 likes) = 1.0
    assert metrics["precision"] == pytest.approx(1.0)
    # ap = (1/1 + 2/3) / 2
    assert metrics["map"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    # ndcg: (cg[0] + cg[2]) / (cg[0] + cg[1])
    cg = 1.0 / np.log2(np.arange(2, 5))
    assert metrics["ndcg"] == pytest.approx((cg[0] + cg[2]) / (cg[0] + cg[1]))
    # auc: 1 miss with 1 hit before it, then (2 + 2)/2 * (2 - 1) = 2 -> 3/(2*2)
    assert metrics["auc"] == pytest.approx(3.0 / 4.0)


def _blocked_dataset(users=300, items=120, seed=7):
    """Synthetic clustered preferences: users in group g like items in group g."""
    rng = np.random.RandomState(seed)
    groups = 6
    rows, cols = [], []
    for u in range(users):
        g = u % groups
        group_items = np.arange(g, items, groups)
        liked = rng.choice(group_items, size=12, replace=False)
        rows.extend([u] * len(liked))
        cols.extend(liked)
    return csr_matrix(
        (np.ones(len(rows), dtype=np.float32), (rows, cols)), shape=(users, items)
    )


def test_als_quality_gate_movielens100k_real():
    """The reference's exact real-data gate (tests/evaluation_test.py:103-119):
    ALS p@10 > 0.2 on MovieLens-100k. Runs automatically when the HDF5 is
    cached locally (IMPLICIT_DATASETS_PATH / ~/implicit_datasets); skipped in
    zero-egress environments — the synthetic gate below covers those."""
    from implicit_tpu.datasets.movielens import get_movielens, probe_movielens

    if probe_movielens("100k") is None:
        pytest.skip("movielens_100k.hdf5 not cached (zero-egress environment)")

    _, ratings = get_movielens(variant="100k")
    ratings.data[ratings.data < 3.0] = 0
    ratings.eliminate_zeros()
    ratings.data = np.ones(len(ratings.data))
    user_ratings = ratings.T.tocsr()
    train, test = train_test_split(user_ratings)
    model = AlternatingLeastSquares()
    model.fit(train, show_progress=False)
    assert precision_at_k(model, train, test, show_progress=False) > 0.2


def test_als_quality_gate_stdlib_corpus_real():
    """The reference's real-data gate protocol run on REAL data that ships
    with the package (datasets/stdlib_corpus.py — module x token counts from
    the CPython stdlib, ML-100k scale): ALS p@10 must beat the reference's
    0.2 threshold (/root/reference/tests/evaluation_test.py:103-119). Unlike
    the movielens test above this one always runs — no download needed."""
    from implicit_tpu.datasets.stdlib_corpus import get_stdlib_corpus

    _, _, counts = get_stdlib_corpus()
    assert counts.shape[0] > 500 and counts.nnz > 40_000
    train, test = train_test_split(counts, train_percentage=0.8, random_state=42)
    model = AlternatingLeastSquares(factors=64, regularization=0.05, random_state=3)
    model.fit(train, show_progress=False)
    assert precision_at_k(model, train, test, K=10, show_progress=False) > 0.2


def test_als_quality_gate():
    # end-to-end quality gate: the reference requires p@10 > 0.2 on ML-100k
    # (tests/evaluation_test.py:103-119); this synthetic set plays that role
    # in zero-egress runs (the real gate above engages when data is present)
    ratings = _blocked_dataset()
    train, test = train_test_split(ratings, train_percentage=0.8, random_state=42)

    model = AlternatingLeastSquares(factors=32, regularization=0.01, random_state=23)
    model.fit(train, show_progress=False)

    p = precision_at_k(model, train, test, K=10, show_progress=False)
    assert p > 0.2


def test_leave_k_out_reconstructs_input():
    """train + test recompose exactly to the input (reference
    evaluation_test.py's 'outputs produce input' property)."""
    ratings = _random_ratings()
    train, test = leave_k_out_split(ratings, K=1, random_state=3)
    recombined = (train + test).tocsr()
    original = ratings.tocsr()
    assert (recombined != original).nnz == 0


def test_leave_k_out_train_only_size():
    """train_only users never contribute test entries and stay in train."""
    ratings = _random_ratings()
    train, test = leave_k_out_split(ratings, K=1, train_only_size=0.5,
                                    random_state=4)
    assert train.shape == ratings.shape
    assert test.shape == ratings.shape
    assert train.nnz + test.nnz == ratings.nnz
    # with half the users held train-only, test users are at most half
    test_users = np.count_nonzero(np.diff(test.tocsr().indptr))
    all_users = np.count_nonzero(np.diff(ratings.tocsr().indptr))
    assert test_users <= all_users * 0.5 + 1
