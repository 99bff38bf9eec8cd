"""Query-chunked top-k: results must not depend on internal chunk boundaries.

The memory-bounded chunking (including the per-chunk slicing of the
filter_query_items CSR) mirrors the reference's constrained-temp-memory GPU
tests (/root/reference/tests/gpu_test.py:36-51).
"""

import numpy as np
import pytest
from scipy.sparse import random as sparse_random

import implicit_tpu.ops.topk as topk_mod


@pytest.fixture
def tiny_chunks(monkeypatch):
    # force many small query chunks
    monkeypatch.setattr(topk_mod, "_score_budget_elements", lambda: 8 * 200)


def test_score_budget_sane():
    # whatever the backend reports, the budget is a usable positive bound
    budget = topk_mod._score_budget_elements()
    assert budget >= 1 << 22
    assert budget * 4 <= 4 << 30 or budget == topk_mod._MAX_SCORE_ELEMENTS


def test_chunked_matches_unchunked(tiny_chunks):
    rng = np.random.RandomState(0)
    items = rng.rand(200, 8).astype(np.float32)
    queries = rng.rand(57, 8).astype(np.float32)  # forces ragged final chunk

    ids, scores = topk_mod.topk(items, queries, 9)

    oracle = queries @ items.T
    oid = np.argsort(-oracle, axis=1)[:, :9]
    np.testing.assert_allclose(scores, np.take_along_axis(oracle, oid, axis=1), atol=1e-5)


def test_chunked_query_filters(tiny_chunks):
    rng = np.random.RandomState(1)
    items = rng.rand(100, 8).astype(np.float32)
    queries = rng.rand(40, 8).astype(np.float32)

    # each query filters a distinct item set spanning chunk boundaries
    qf = sparse_random(40, 100, density=0.2, random_state=rng, format="csr")
    qf.data[:] = 1

    ids, _ = topk_mod.topk(items, queries, 5, filter_query_items=qf)
    for q in range(40):
        banned = set(qf[q].indices)
        assert not banned.intersection(ids[q]), f"query {q} leaked filtered items"


def test_chunked_empty_filter_rows(tiny_chunks):
    rng = np.random.RandomState(2)
    items = rng.rand(60, 8).astype(np.float32)
    queries = rng.rand(23, 8).astype(np.float32)

    # a filter CSR where entire chunks' worth of rows are empty
    from scipy.sparse import csr_matrix

    qf = csr_matrix((23, 60), dtype=np.float32)
    ids, scores = topk_mod.topk(items, queries, 4, filter_query_items=qf)
    assert ids.shape == (23, 4)
    assert np.isfinite(scores).all()
