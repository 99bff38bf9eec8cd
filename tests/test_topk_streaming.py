"""topk_streaming: exact serving over host-resident (beyond-HBM) tables.

Results must be identical to ops.topk.topk on a device-resident table for
every filter combination and block-boundary shape.
"""

import numpy as np
import pytest
from scipy.sparse import random as sparse_random

from implicit_tpu.ops.topk import topk, topk_streaming


def _data(n_items=700, factors=24, q=33, seed=0):
    rng = np.random.default_rng(seed)
    items = rng.standard_normal((n_items, factors)).astype(np.float32)
    queries = rng.standard_normal((q, factors)).astype(np.float32)
    return items, queries


@pytest.mark.parametrize("block_rows", [128, 256, 1024])
def test_matches_resident(block_rows):
    items, queries = _data()
    ids_r, vals_r = topk(items, queries, 10)
    ids_s, vals_s = topk_streaming(items, queries, 10, block_rows=block_rows)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_matches_with_filters():
    items, queries = _data(seed=1)
    rng = np.random.default_rng(2)
    qf = sparse_random(queries.shape[0], items.shape[0], density=0.05,
                       random_state=rng, format="csr")
    qf.data[:] = 1.0
    fi = rng.choice(items.shape[0], size=40, replace=False)
    norms = np.linalg.norm(items, axis=1)

    kw = dict(item_norms=norms, filter_query_items=qf, filter_items=fi)
    ids_r, vals_r = topk(items, queries, 10, **kw)
    ids_s, vals_s = topk_streaming(items, queries, 10, block_rows=256, **kw)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_k_exceeds_items():
    items, queries = _data(n_items=7, q=3, seed=3)
    ids_r, vals_r = topk(items, queries, 12)
    ids_s, vals_s = topk_streaming(items, queries, 12, block_rows=128)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)
    assert (ids_s[:, 7:] == -1).all()


def test_block_not_dividing_items():
    items, queries = _data(n_items=777, seed=4)
    ids_r, _ = topk(items, queries, 5)
    ids_s, _ = topk_streaming(items, queries, 5, block_rows=256)
    np.testing.assert_array_equal(ids_r, ids_s)


def test_scalar_query_and_k0():
    items, queries = _data(seed=5)
    ids_s, vals_s = topk_streaming(items, queries[0], 4, block_rows=256)
    ids_r, vals_r = topk(items, queries[0].reshape(1, -1), 4)
    np.testing.assert_array_equal(ids_r, ids_s)
    ids0, vals0 = topk_streaming(items, queries, 0)
    assert ids0.shape == (queries.shape[0], 0)


def test_bf16_table_streams_bf16():
    import ml_dtypes

    items, queries = _data(seed=6)
    items16 = items.astype(ml_dtypes.bfloat16)
    ids_r, vals_r = topk(items16, queries, 10)
    ids_s, vals_s = topk_streaming(items16, queries, 10, block_rows=256)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_memmap_table(tmp_path):
    # the intended >HBM shape: the table never fully materializes in RAM
    items, queries = _data(seed=7)
    path = str(tmp_path / "table.npy")
    np.save(path, items)
    mm = np.load(path, mmap_mode="r")
    ids_r, _ = topk(items, queries, 10)
    ids_s, _ = topk_streaming(mm, queries, 10, block_rows=256)
    np.testing.assert_array_equal(ids_r, ids_s)
