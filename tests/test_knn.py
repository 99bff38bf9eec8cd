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


def test_all_pairs_knn_device_matches_host():
    # the MXU gramian path must agree with the host spgemm path
    rng = np.random.RandomState(3)
    from scipy.sparse import random as sparse_random

    counts = sparse_random(300, 80, density=0.15, random_state=rng, format="csr")
    counts.data = np.ceil(counts.data * 5)

    host = all_pairs_knn(counts, 5, method="host").tocsr()
    device = all_pairs_knn(counts, 5, method="device").tocsr()

    assert host.shape == device.shape
    for row in range(host.shape[0]):
        h = dict(zip(host[row].indices, host[row].data))
        d = dict(zip(device[row].indices, device[row].data))
        # identical neighbour sets modulo exact ties at the K-th score
        h_scores = sorted(h.values(), reverse=True)
        d_scores = sorted(d.values(), reverse=True)
        np.testing.assert_allclose(h_scores, d_scores, rtol=1e-5)
        common = set(h) & set(d)
        for c in common:
            np.testing.assert_allclose(h[c], d[c], rtol=1e-5)


def test_knn_batch_recommend_matches_scalar_with_filters():
    from implicit_tpu.nearest_neighbours import CosineRecommender
    from scipy.sparse import random as sparse_random

    rng = np.random.RandomState(7)
    likes = sparse_random(60, 40, density=0.2, random_state=rng, format="csr")
    likes.data[:] = 1.0
    model = CosineRecommender(K=10)
    model.fit(likes, show_progress=False)

    userids = np.arange(60)
    ids_b, sc_b = model.recommend(userids, likes[userids], N=5, filter_items=[1, 3])
    for u in userids:
        ids_s, sc_s = model.recommend(int(u), likes[int(u)], N=5, filter_items=[1, 3])
        got = ids_b[u][ids_b[u] >= 0]
        np.testing.assert_array_equal(ids_s[: len(got)], got)
        assert 1 not in got and 3 not in got


def test_device_method_rejects_oversized_catalogs():
    import pytest
    from scipy.sparse import random as sparse_random

    import implicit_tpu.nearest_neighbours as nn

    wide = sparse_random(10, nn._DEVICE_KNN_MAX_ITEMS + 1, density=0.01,
                         random_state=np.random.RandomState(0), format="csr")
    wide.data[:] = 1.0
    with pytest.raises(ValueError, match="method='host'"):
        all_pairs_knn(wide, 5, method="device")


def test_all_pairs_knn_device_multichunk(monkeypatch):
    """Slice-overrun/padding handling when users span many densified chunks."""
    import implicit_tpu.nearest_neighbours as nn

    rng = np.random.RandomState(9)
    from scipy.sparse import random as sparse_random

    counts = sparse_random(200, 50, density=0.2, random_state=rng, format="csr")
    counts.data = np.ceil(counts.data * 5)

    host = all_pairs_knn(counts, 5, method="host").tocsr()
    # tiny chunk budget: 200 users / ~10-row chunks -> ~20 chunks with
    # slice overruns at every boundary and tail padding in the last
    monkeypatch.setattr(nn, "_DEVICE_KNN_DENSE_BYTES", 512)
    device = all_pairs_knn(counts, 5, method="device").tocsr()

    for row in range(host.shape[0]):
        h_scores = sorted(host[row].data, reverse=True)
        d_scores = sorted(device[row].data, reverse=True)
        np.testing.assert_allclose(h_scores, d_scores, rtol=1e-5)


def test_native_knn_all_pairs_matches_scipy_oracle():
    """The fused SMMP kernel (native/packer.cpp:knn_all_pairs) must agree
    with the blocked-scipy formulation on random signed data at every K."""
    from implicit_tpu import native

    rng = np.random.default_rng(5)
    U, I, N = 200, 90, 1800
    m = csr_matrix(
        (rng.standard_normal(N), (rng.integers(0, U, N), rng.integers(0, I, N))),
        shape=(U, I),
    )
    m.sum_duplicates()
    iu = m.T.tocsr()
    iu.sort_indices()
    sim = (iu @ m).tocsr()

    for K in (1, 4, 50, 500):
        got = native.knn_all_pairs(iu, m, K)
        if got is None:  # toolchain without g++: the scipy path covers it
            break
        got = csr_matrix((got[2], (got[0], got[1])), shape=(I, I))
        for i in range(I):
            vals = sim[i].data
            k = min(K, len(vals))
            grow = got[i]
            assert grow.nnz == k
            if k == 0:
                continue
            top = np.sort(vals)[::-1][:k]
            # same K values selected (ties may differ in column identity)
            assert np.allclose(np.sort(grow.data)[::-1], top, atol=1e-12)


def test_gramian_coo_flats_rejects_int32_overflow_nnz():
    """Both device gramian paths (KNN device fit AND EASE) must refuse
    matrices whose COO flats can't be sliced with int32 offsets, instead of
    silently corrupting dynamic_slice starts."""
    import types

    import pytest

    from implicit_tpu.nearest_neighbours import _gramian_coo_flats

    fake = types.SimpleNamespace(shape=(1 << 24, 1000), nnz=1 << 31)
    with pytest.raises(ValueError, match="int32"):
        _gramian_coo_flats(fake)


def test_meshed_program_cache_is_bounded():
    """Data-dependent keys (cap/chunk) must not grow the compiled-program
    cache without bound across refits; the most recent program survives."""
    from implicit_tpu import nearest_neighbours as nn

    saved = dict(nn._MESHED_PROGRAMS)
    nn._MESHED_PROGRAMS.clear()
    try:
        for i in range(nn._MESHED_PROGRAMS_CAP + 10):
            nn._meshed_program(("t", i), lambda i=i: i)
        assert len(nn._MESHED_PROGRAMS) <= nn._MESHED_PROGRAMS_CAP
        last = ("t", nn._MESHED_PROGRAMS_CAP + 9)
        assert nn._meshed_program(last, lambda: "rebuilt") != "rebuilt"
    finally:
        nn._MESHED_PROGRAMS.clear()
        nn._MESHED_PROGRAMS.update(saved)


def test_native_knn_all_pairs_nan_weight_no_corruption():
    """A NaN interaction weight must stay a value, not become the kernel's
    'untouched' sentinel: rows whose accumulations never meet the NaN must
    match the scipy product exactly, and no row may emit duplicate columns
    or more than K entries (the old NaN-sentinel design re-first-touched
    NaN accumulators, duplicating and dropping entries)."""
    from implicit_tpu import native

    if native.get_lib() is None:
        return

    rng = np.random.default_rng(11)
    U, I, N = 120, 60, 1200
    m = csr_matrix(
        (rng.random(N) + 0.1, (rng.integers(0, U, N), rng.integers(0, I, N))),
        shape=(U, I),
    )
    m.sum_duplicates()
    m.data[0] = np.nan  # one poisoned interaction
    iu = m.T.tocsr()
    iu.sort_indices()
    sim = (iu @ m).tocsr()

    K = 8
    rows, cols, vals = native.knn_all_pairs(iu, m, K)
    got = {}
    for r, c, v in zip(rows, cols, vals):
        assert (r, c) not in got, f"duplicate entry ({r},{c})"
        got[(r, c)] = v
    counts = np.bincount(rows, minlength=I)
    assert counts.max() <= K

    # rows of the true product that contain no NaN must agree exactly
    for i in range(I):
        srow = sim[i]
        if srow.nnz == 0 or np.isnan(srow.data).any():
            continue
        k = min(K, srow.nnz)
        top = np.sort(srow.data)[::-1][:k]
        mine = np.sort([v for (r, _), v in got.items() if r == i])[::-1]
        assert len(mine) == k
        np.testing.assert_allclose(mine, top, atol=1e-12)


def test_host_knn_empty_and_dense_rows():
    """Items with no users and items co-occurring with everything."""
    from implicit_tpu.nearest_neighbours import _all_pairs_knn_host

    m = csr_matrix(
        np.array([[1.0, 0, 1, 0], [1, 0, 1, 0], [1, 0, 1, 0]])
    )
    sim = _all_pairs_knn_host(m, 2).tocsr()
    assert sim[1].nnz == 0 and sim[3].nnz == 0  # empty items: no neighbours
    assert set(sim[0].indices) == {0, 2}
    assert np.allclose(sim[0].data, 3.0)


def test_native_knn_all_pairs_row_chunking_is_invisible(monkeypatch):
    """A tiny output-scratch budget forces the fused kernel through many
    row-range calls (native/__init__.py bounds the (rows, K) scratch by
    IMPLICIT_KNN_OUT_BUDGET); the assembled COO must be identical to the
    single-call result."""
    from implicit_tpu import native

    if native.get_lib() is None:
        return  # toolchain without g++: nothing to chunk

    rng = np.random.default_rng(9)
    U, I, N = 150, 70, 1500
    m = csr_matrix(
        (rng.random(N), (rng.integers(0, U, N), rng.integers(0, I, N))),
        shape=(U, I),
    )
    m.sum_duplicates()
    iu = m.T.tocsr()
    iu.sort_indices()

    one = native.knn_all_pairs(iu, m, 10)
    monkeypatch.setenv("IMPLICIT_KNN_OUT_BUDGET", str(10 * 12 * 7))  # 7-row blocks
    many = native.knn_all_pairs(iu, m, 10)
    for a, b in zip(one, many):
        np.testing.assert_array_equal(a, b)
