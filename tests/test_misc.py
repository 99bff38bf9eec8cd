"""Coverage for periphery: synthetic datasets, native fallbacks, utilities."""

import numpy as np
import pytest

import implicit_tpu.native as native
from implicit_tpu.datasets.synthetic import generate_synthetic, get_synthetic_clustered
from implicit_tpu.utils import augment_inner_product_matrix, check_blas_config


def test_generate_synthetic_shape_stats():
    mat = generate_synthetic(users=2000, items=500, nnz=30_000, seed=1)
    assert mat.shape == (2000, 500)
    # dedup keeps nnz near the request
    assert 0.8 * 30_000 < mat.nnz <= 1.05 * 30_000
    assert (mat.data > 0).all()
    # power-law: the most popular item has far more interactions than median
    per_item = np.bincount(mat.tocoo().col, minlength=500)
    assert per_item.max() > 5 * np.median(per_item[per_item > 0])


def test_clustered_dataset_structure():
    mat = get_synthetic_clustered(users=60, items=30, groups=6, likes_per_user=4)
    coo = mat.tocoo()
    # users only like items of their own group
    assert ((coo.col % 6) == (coo.row % 6)).all()


def test_native_fallbacks_match(monkeypatch):
    import scipy.sparse as sp

    rng = np.random.RandomState(0)
    m = sp.random(40, 25, density=0.2, random_state=rng, format="csr")
    m.data = m.data.astype(np.float32)
    sel = np.array([1, 5, 9], dtype=np.int32)

    native_idx, native_dat = native.pack_ragged(m.indptr, m.indices, m.data, sel, 16)
    r1, c1, v1 = native.topk_rows(m.indptr, m.indices, m.data.astype(np.float64), 3)

    # force the numpy fallback path and compare
    monkeypatch.setattr(native, "get_lib", lambda: None)
    fb_idx, fb_dat = native.pack_ragged(m.indptr, m.indices, m.data, sel, 16)
    r2, c2, v2 = native.topk_rows(m.indptr, m.indices, m.data.astype(np.float64), 3)

    np.testing.assert_array_equal(native_idx, fb_idx)
    np.testing.assert_allclose(native_dat, fb_dat)
    # top-k sets per row must agree (order within a row may differ)
    for r in np.unique(r1):
        assert set(c1[r1 == r]) == set(c2[r2 == r])
        np.testing.assert_allclose(sorted(v1[r1 == r]), sorted(v2[r2 == r]))


def test_augment_inner_product_matrix():
    rng = np.random.RandomState(2)
    factors = rng.rand(20, 8).astype(np.float32)
    max_norm, extra = augment_inner_product_matrix(factors)
    # every augmented row has the same norm (max_norm)
    norms = np.linalg.norm(extra, axis=1)
    np.testing.assert_allclose(norms, max_norm, rtol=1e-5)


def test_check_blas_config_runs():
    # idempotent and must not raise regardless of the BLAS environment
    check_blas_config()
    check_blas_config()


def test_tpu_module():
    from implicit_tpu import tpu

    assert isinstance(tpu.HAS_TPU, bool)
    assert tpu.device_count() >= 0
