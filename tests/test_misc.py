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


def test_similar_items_small_subset_pads_with_sentinel():
    # items= subsets smaller than N must pad with id -1, never duplicate a
    # real id through the sentinel wrapping into the subset array
    from scipy.sparse import csr_matrix

    from implicit_tpu.als import AlternatingLeastSquares
    from tests.conftest import get_checkerboard

    likes = csr_matrix(get_checkerboard(10))
    model = AlternatingLeastSquares(factors=4, iterations=5, random_state=3)
    model.fit(likes, show_progress=False)

    subset = [1, 2, 4]
    ids, scores = model.similar_items(1, N=10, items=subset)
    valid = ids[ids >= 0]
    assert set(valid) <= set(subset)
    assert len(valid) == len(set(valid))  # no duplicates
    assert (ids[len(subset):] == -1).all()

    # batch form keeps the same semantics
    ids_b, _ = model.similar_items(np.array([1, 3]), N=10, items=subset)
    for row in ids_b:
        v = row[row >= 0]
        assert set(v) <= set(subset)
        assert len(v) == len(set(v))


def test_long_row_solve_finite_without_regularization():
    # rows longer than the tile-resident CG limit route to the gramian-CG
    # path; with regularization=0 the normal matrix can be (nearly)
    # rank-deficient, which CG must tolerate (a Cholesky would produce NaNs)
    import jax.numpy as jnp
    import scipy.sparse as sp

    from implicit_tpu.ops import als as als_ops
    from implicit_tpu.sparse import BucketedCSR

    rng = np.random.default_rng(0)
    users, items, factors = 4, 600, 8
    dense = np.zeros((users, items), dtype=np.float32)
    dense[:, :550] = rng.random((users, 550)) + 1.0  # L > 512 per row
    Cui = sp.csr_matrix(dense)

    buckets = BucketedCSR(Cui)
    assert max(c.L for c in buckets.classes) > als_ops._full_cg_max_l(jnp.float32)

    X = jnp.asarray(rng.random((users, factors), dtype=np.float32))
    # nearly rank-deficient: Cholesky of A breaks down in f32, LU stays finite
    Yh = rng.random((items, factors), dtype=np.float32)
    Yh[:, factors // 2:] = Yh[:, : factors // 2] + 1e-5 * rng.standard_normal(
        (items, factors // 2)
    ).astype(np.float32)
    Y = jnp.asarray(Yh)
    X = als_ops.solve_side(X, Y, buckets, reg=0.0, use_pallas=True)
    assert np.isfinite(np.asarray(X)).all()


def test_recommend_pipelined_respects_recommend_override():
    """A subclass with its own recommend must not be bypassed by the
    pipelined MF dispatch (e.g. ANN-style rescoring overrides)."""
    import numpy as np

    from implicit_tpu.models.mf_base import MatrixFactorizationBase

    class Custom(MatrixFactorizationBase):
        def fit(self, user_items, show_progress=True, callback=None):
            pass

        def save(self, fileobj_or_path):
            pass

        def recommend(self, userid, user_items, N=10, **kwargs):
            n = 1 if np.isscalar(userid) else len(userid)
            ids = np.full((n, N), 7, dtype=np.int32)
            return ids, np.zeros((n, N), dtype=np.float32)

    model = Custom()
    model.user_factors = np.ones((4, 2), dtype=np.float32)
    model.item_factors = np.ones((9, 2), dtype=np.float32)
    out = list(model.recommend_pipelined([np.arange(2), np.arange(2, 4)],
                                         N=3, filter_already_liked_items=False))
    assert len(out) == 2
    for ids, _ in out:
        assert (ids == 7).all()


def test_pipelined_validates_eagerly():
    """Bad argument combinations raise at call time (like the sync methods),
    not on first next() — and are never swallowed by an empty stream."""
    import numpy as np
    import pytest

    from implicit_tpu.als import AlternatingLeastSquares

    model = AlternatingLeastSquares(factors=4)
    rng = np.random.default_rng(0)
    model.user_factors = rng.standard_normal((6, 4), dtype=np.float32)
    model.item_factors = rng.standard_normal((9, 4), dtype=np.float32)

    with pytest.raises(ValueError, match="items and filter_items"):
        model.recommend_pipelined([], items=[1, 2], filter_items=[3])
    with pytest.raises(IndexError):
        model.recommend_pipelined([], items=[99])
    with pytest.raises(ValueError, match="items and filter_items"):
        model.similar_items_pipelined([], items=[1], filter_items=[2])
    with pytest.raises(ValueError, match="users and filter_users"):
        model.similar_users_pipelined([], users=[1], filter_users=[2])


def test_dataset_probe_honors_env_path(tmp_path, monkeypatch):
    """probe_cached / probe_movielens find files via IMPLICIT_DATASETS_PATH
    without touching the network — the real-data quality-gate hook."""
    from implicit_tpu.datasets import _download
    from implicit_tpu.datasets.movielens import probe_movielens

    monkeypatch.setenv("IMPLICIT_DATASETS_PATH", str(tmp_path))
    assert probe_movielens("100k") is None
    target = tmp_path / "movielens_100k.hdf5"
    target.write_bytes(b"\x89HDF")
    assert probe_movielens("100k") == str(target)
    assert _download.probe_cached("movielens_100k.hdf5") == str(target)
    # fetch_cached returns the cached file without any network call
    assert _download.fetch_cached("http://invalid.invalid/x",
                                  "movielens_100k.hdf5") == str(target)


def test_kernel_oracle_quick_interpret_mode():
    """The on-hardware kernel oracle's reduced matrix, run off-hardware
    through the Pallas interpreter (ORACLE_QUICK=1 ORACLE_INTERPRET=1) —
    kernel-math regressions get caught on every push, not only when a TPU
    is attached (the full Mosaic run remains benchmarks/tpu_kernel_oracle.py
    on real hardware, which caught a live bf16 lowering bug in round 4)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, ORACLE_QUICK="1", ORACLE_INTERPRET="1",
               JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = root + ":" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "benchmarks", "tpu_kernel_oracle.py")],
        env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "FAIL" not in out.stdout
