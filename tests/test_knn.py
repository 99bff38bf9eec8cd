"""Item-item KNN kernel and weighting tests.

Covers /root/reference/tests/knn_test.py:26-55: all_pairs_knn exactness
against a dense oracle, plus unit checks of the weighting transforms.
"""

import numpy as np
from scipy.sparse import csr_matrix

from implicit_tpu.nearest_neighbours import (
    all_pairs_knn,
    bm25_weight,
    normalize,
    tfidf_weight,
)


def _counts():
    return csr_matrix(
        np.array(
            [
                [5, 1, 0, 9, 0, 0],
                [0, 2, 1, 1, 0, 0],
                [7, 0, 3, 0, 0, 0],
                [1, 8, 0, 0, 0, 0],
                [0, 0, 4, 4, 0, 0],
                [0, 3, 0, 0, 0, 2],
                [0, 0, 0, 0, 6, 0],
            ],
            dtype=np.float64,
        )
    )


def test_all_pairs_knn_exact():
    counts = tfidf_weight(_counts()).tocsr()
    dense = counts.T.dot(counts).tocsr()
    K = 3
    knn = all_pairs_knn(counts, K, show_progress=False).tocsr()

    for rowid in range(counts.shape[1]):
        # values must match the dense product
        for colid, data in zip(knn[rowid].indices, knn[rowid].data):
            assert abs(dense[rowid, colid] - data) < 1e-9

        # and the K largest entries must be selected
        row = dense[rowid]
        expected = set(
            colid for colid, _ in sorted(zip(row.indices, row.data), key=lambda x: -x[1])[:K]
        )
        assert set(knn[rowid].indices) == expected


def test_all_pairs_knn_blocking():
    # results must be identical regardless of internal block boundaries
    counts = _counts()
    full = all_pairs_knn(counts, 4, show_progress=False).tocsr()
    assert full.shape == (6, 6)
    # every row has at most K entries
    assert np.diff(full.indptr).max() <= 4


def test_normalize():
    X = normalize(_counts()).tocsr()
    norms = np.sqrt(np.asarray(X.multiply(X).sum(axis=1)).ravel())
    nonzero = norms > 0
    np.testing.assert_allclose(norms[nonzero], 1.0)


def test_tfidf_weight():
    X = tfidf_weight(_counts()).tocsr()
    counts = _counts()
    N = counts.shape[0]
    item_counts = np.bincount(counts.tocoo().col)
    # spot check: entry (0, 0)
    expected = np.sqrt(counts[0, 0]) * (np.log(N) - np.log1p(item_counts[0]))
    assert X[0, 0] == expected


def test_bm25_weight():
    X = bm25_weight(_counts(), K1=100, B=0.8).tocsr()
    assert X.shape == _counts().shape
    assert X.nnz == _counts().nnz
    # weights are finite and preserve sparsity pattern
    assert np.isfinite(X.data).all()


def test_empty_matrix():
    empty = csr_matrix((4, 4), dtype=np.float64)
    sim = all_pairs_knn(empty, 2, show_progress=False)
    assert sim.nnz == 0
