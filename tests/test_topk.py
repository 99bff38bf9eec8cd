"""Top-k engine tests against a numpy oracle.

Replaces the reference's CUDA-vs-numpy kernel tests
(/root/reference/tests/gpu_test.py:10-51) with XLA-vs-numpy checks over the
same parameter sweep: k in {4..1000}, batch sizes {1, 10, 100}, plus norm
division and both filter kinds.
"""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from implicit_tpu.ops.topk import topk


def _oracle(items, queries, k, item_norms=None):
    scores = queries @ items.T
    if item_norms is not None:
        scores = scores / item_norms
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return ids, np.take_along_axis(scores, ids, axis=1)


@pytest.mark.parametrize("k", [4, 10, 50, 250, 1000])
@pytest.mark.parametrize("batch", [1, 10, 100])
def test_topk_random(k, batch):
    rng = np.random.RandomState(k + batch)
    items = rng.rand(1500, 8).astype(np.float32)
    queries = rng.rand(batch, 8).astype(np.float32)

    ids, scores = topk(items, queries, k)
    oracle_ids, oracle_scores = _oracle(items, queries, k)

    # scores must match; ids may differ only on exact ties
    assert np.allclose(scores, oracle_scores, atol=1e-5)
    assert (ids == oracle_ids).mean() > 0.99


def test_topk_ascending_scores():
    # worst case for selection: scores increase left to right
    items = np.arange(2000, dtype=np.float32).reshape(2000, 1)
    queries = np.ones((3, 1), dtype=np.float32)
    ids, scores = topk(items, queries, 10)
    expected = np.arange(1999, 1989, -1)
    for row in range(3):
        np.testing.assert_array_equal(ids[row], expected)
        np.testing.assert_allclose(scores[row], expected.astype(np.float32))


def test_topk_norms():
    rng = np.random.RandomState(0)
    items = rng.rand(500, 16).astype(np.float32)
    queries = rng.rand(4, 16).astype(np.float32)
    norms = np.linalg.norm(items, axis=1).astype(np.float32)

    ids, scores = topk(items, queries, 7, item_norms=norms)
    oracle_ids, oracle_scores = _oracle(items, queries, 7, item_norms=norms)
    assert np.allclose(scores, oracle_scores, atol=1e-5)
    assert (ids == oracle_ids).mean() > 0.99


def test_topk_filter_items():
    rng = np.random.RandomState(1)
    items = rng.rand(100, 8).astype(np.float32)
    queries = rng.rand(5, 8).astype(np.float32)
    banned = np.array([1, 7, 42])

    ids, _ = topk(items, queries, 10, filter_items=banned)
    assert not np.isin(ids, banned).any()


def test_topk_filter_query_items():
    rng = np.random.RandomState(2)
    items = rng.rand(60, 8).astype(np.float32)
    queries = rng.rand(3, 8).astype(np.float32)
    # per-query bans: query 0 bans items 0..9, query 1 bans 10..19, ...
    rows = np.repeat(np.arange(3), 10)
    cols = np.arange(30)
    qf = csr_matrix((np.ones(30), (rows, cols)), shape=(3, 60))

    ids, _ = topk(items, queries, 10, filter_query_items=qf)
    for q in range(3):
        assert not np.isin(ids[q], np.arange(q * 10, (q + 1) * 10)).any()


def test_topk_overask_pads():
    rng = np.random.RandomState(3)
    items = rng.rand(20, 4).astype(np.float32)
    queries = rng.rand(2, 4).astype(np.float32)

    ids, scores = topk(items, queries, 50)
    assert ids.shape == (2, 50)
    # the first 20 are real results, the tail is padded
    assert (ids[:, 20:] == -1).all()
    assert (scores[:, 20:] == -np.finfo(np.float32).max).all()


def test_topk_1d_query():
    rng = np.random.RandomState(4)
    items = rng.rand(50, 8).astype(np.float32)
    query = rng.rand(8).astype(np.float32)

    ids, scores = topk(items, query, 5)
    assert ids.shape == (1, 5)
    ids2, scores2 = topk(items, query.reshape(1, -1), 5)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(scores, scores2)


def test_topk_async_matches_topk():
    from implicit_tpu.ops.topk import topk_async

    rng = np.random.RandomState(11)
    items = rng.rand(900, 16).astype(np.float32)
    queries = rng.rand(37, 16).astype(np.float32)
    futures = [topk_async(items, queries, k) for k in (5, 2000)]
    for k, fut in zip((5, 2000), futures):
        ids, scores = topk(items, queries, k)
        a_ids, a_scores = fut.result()
        np.testing.assert_array_equal(ids, a_ids)
        np.testing.assert_array_equal(scores, a_scores)
        # result() is idempotent
        b_ids, b_scores = fut.result()
        np.testing.assert_array_equal(ids, b_ids)


def test_topk_async_k_zero():
    from implicit_tpu.ops.topk import topk_async

    rng = np.random.RandomState(3)
    items = rng.rand(50, 8).astype(np.float32)
    queries = rng.rand(4, 8).astype(np.float32)
    ids, scores = topk_async(items, queries, 0).result()
    assert ids.shape == (4, 0) and scores.shape == (4, 0)
