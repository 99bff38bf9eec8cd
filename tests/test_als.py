"""ALS-specific numeric and regression tests.

Covers the reference's model-specific coverage
(/root/reference/tests/als_test.py:74-365): factorization reconstruction
accuracy, CG vs Cholesky parity, explain() semantics, loss values,
incremental retraining and serialization round-trips.
"""

import warnings

import numpy as np
import pytest
from conftest import get_checkerboard
from scipy.sparse import csr_matrix, random as sparse_random

from implicit_tpu.als import AlternatingLeastSquares
from implicit_tpu.models.als import calculate_loss


def _toy_counts(dtype=np.float64):
    return csr_matrix(
        np.array(
            [
                [1, 1, 0, 1, 0, 0],
                [0, 1, 1, 1, 0, 0],
                [1, 0, 1, 0, 0, 0],
                [1, 1, 0, 0, 0, 0],
                [0, 0, 1, 1, 0, 1],
                [0, 1, 0, 0, 0, 1],
                [0, 0, 0, 0, 1, 1],
            ],
            dtype=dtype,
        )
    )


@pytest.mark.parametrize("use_cg", [True, False])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_factorize(use_cg, dtype):
    counts = _toy_counts()
    user_items = counts * 2

    model = AlternatingLeastSquares(
        factors=6, regularization=0, dtype=dtype, use_cg=use_cg, random_state=42
    )
    model.fit(user_items, show_progress=False)

    assert model.user_factors.dtype == np.dtype(dtype)
    rows, cols = counts.shape
    reconstructed = model.user_factors @ model.item_factors.T
    for i in range(rows):
        for j in range(cols):
            assert counts[i, j] == pytest.approx(reconstructed[i, j], abs=1e-3)


@pytest.mark.parametrize("use_cg", [True, False])
def test_cg_matches_cholesky(use_cg):
    # both solvers must converge to essentially the same factorization quality
    counts = _toy_counts()
    model = AlternatingLeastSquares(
        factors=6, regularization=1e-8, use_cg=use_cg, iterations=20, random_state=1
    )
    model.fit(counts * 2, show_progress=False)
    reconstructed = model.user_factors @ model.item_factors.T
    assert np.abs(reconstructed - counts.toarray()).max() < 1e-2


def test_cg_nan_regression():
    # matrices with many zero rows / extreme confidences must not produce NaNs
    # (reference issues #19/#106/#377)
    raw = [
        [0.0, 2.0, 1.5, 1.33, 1.25, 1.2, 1.17, 0.0],
        [0.0, 0.0, 2.0, 1.5, 1.33, 1.25, 1.2, 1.17],
        [1.17, 0.0, 0.0, 2.0, 1.5, 1.33, 1.25, 1.2],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    ]
    counts = csr_matrix(np.array(raw))
    for use_cg in (True, False):
        model = AlternatingLeastSquares(
            factors=3, regularization=0.01, use_cg=use_cg, random_state=0
        )
        model.fit(counts, show_progress=False)
        assert np.isfinite(model.user_factors).all()
        assert np.isfinite(model.item_factors).all()


def test_tiny_matrix():
    # regression for 1x1-ish degenerate inputs (reference issue #377)
    counts = csr_matrix(np.ones((2, 2), dtype=np.float32))
    model = AlternatingLeastSquares(factors=2, regularization=0.01, random_state=0, iterations=5)
    model.fit(counts, show_progress=False)
    assert np.isfinite(model.user_factors).all()


def test_explain():
    counts = _toy_counts()
    user_items = counts * 2
    item_users = user_items.T.tocsr()

    model = AlternatingLeastSquares(
        factors=4, regularization=20, use_cg=False, iterations=100, random_state=23
    )
    model.fit(user_items, show_progress=False)

    userid = 0
    ids, scores = model.recommend(
        userid, user_items[userid], N=6, filter_already_liked_items=False
    )

    for itemid, expected_score in zip(ids, scores):
        total_score, top_contributions, _ = model.explain(userid, user_items, itemid=itemid)
        # contributions should approximately sum to the score
        assert total_score == pytest.approx(expected_score, abs=1e-3)
        # and be ordered decreasing
        contribs = [c for _, c in top_contributions]
        assert contribs == sorted(contribs, reverse=True)


def test_calculate_loss_simple():
    # perfect reconstruction of a fully-dense binary matrix gives loss == 0
    counts = csr_matrix(np.ones((2, 2), dtype=np.float32))
    X = np.array([[1.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    Y = np.array([[1.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    assert calculate_loss(counts, X, Y, 0.0) == pytest.approx(0.0, abs=1e-5)

    # all-zero factors: every confidence-1 observation contributes (1-0)^2
    X = np.zeros((2, 2), dtype=np.float32)
    Y = np.zeros((2, 2), dtype=np.float32)
    assert calculate_loss(counts, X, Y, 0.0) == pytest.approx(1.0, abs=1e-5)


def test_calculate_loss_matches_definition():
    # compare against the direct dense-sum definition of the objective
    rng = np.random.RandomState(3)
    counts = csr_matrix(sparse_random(20, 16, density=0.3, random_state=rng) * 5)
    X = rng.rand(20, 4).astype(np.float32)
    Y = rng.rand(16, 4).astype(np.float32)
    reg = 0.3

    C = counts.toarray()
    P = (C > 0).astype(np.float64)
    Conf = np.where(C != 0, np.abs(C), 1.0)
    R = X.astype(np.float64) @ Y.astype(np.float64).T
    direct = (Conf * (P - R) ** 2).sum() + reg * ((X**2).sum() + (Y**2).sum())
    direct /= Conf.sum()  # Conf already counts 1.0 for every unobserved pair

    assert calculate_loss(counts, X, Y, reg) == pytest.approx(direct, rel=1e-4)


def test_fit_with_loss():
    model = AlternatingLeastSquares(
        factors=8, iterations=3, calculate_training_loss=True, random_state=7
    )
    model.fit(get_checkerboard(30), show_progress=False)


def test_incremental_retrain():
    likes = get_checkerboard(50)
    model = AlternatingLeastSquares(factors=32, regularization=0.01, random_state=23)
    model.fit(likes, show_progress=False)

    ids, _ = model.recommend(0, likes[0], N=1)
    assert ids[0] == 0

    # flip user 1 to like only item 0: partial_fit should move their factor
    new_row = csr_matrix((np.ones(1), ([0], [0])), shape=(1, 50))
    model.partial_fit_users([1], new_row)
    ids, _ = model.recommend(1, new_row, N=1, filter_already_liked_items=False)
    assert ids[0] == 0

    # growing the model with an unseen user works too
    model.partial_fit_users([100], new_row)
    assert model.user_factors.shape[0] == 101

    new_col = csr_matrix((np.ones(1), ([0], [1])), shape=(1, 50))
    model.partial_fit_items([75], new_col)
    assert model.item_factors.shape[0] == 76


def test_recalculate_matches_stored():
    likes = get_checkerboard(50)
    model = AlternatingLeastSquares(
        factors=32, regularization=0.01, use_cg=False, random_state=23
    )
    model.fit(likes, show_progress=False)

    stored = model.user_factors[3]
    recalced = model.recalculate_user(3, likes[3])
    # a Cholesky re-solve against (near-)converged item factors points the
    # same way as the stored factor (stored X was solved one half-iteration
    # before the final Y, so exact equality isn't expected)
    cos = stored @ recalced / (np.linalg.norm(stored) * np.linalg.norm(recalced))
    assert cos > 0.98


def test_save_load_roundtrip(tmp_path):
    likes = get_checkerboard(50)
    model = AlternatingLeastSquares(factors=16, random_state=23, alpha=2.0)
    model.fit(likes, show_progress=False)

    path = str(tmp_path / "als_model.npz")
    model.save(path)
    reloaded = model.load(path)

    assert reloaded.factors == model.factors
    assert reloaded.alpha == model.alpha
    assert reloaded.dtype == model.dtype
    np.testing.assert_array_equal(reloaded.user_factors, model.user_factors)
    np.testing.assert_array_equal(reloaded.item_factors, model.item_factors)


@pytest.mark.parametrize("use_cg", [True, False])
def test_factorize_float64_x64(use_cg):
    # the reference solves in f32 OR f64 via Cython fused types
    # (/root/reference/implicit/cpu/_als.pyx:19-57); under jax x64 the device
    # pipeline must genuinely solve in double precision
    from jax import enable_x64

    counts = _toy_counts()
    with enable_x64():
        model = AlternatingLeastSquares(
            factors=6, regularization=0, dtype=np.float64, use_cg=use_cg, random_state=42
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # must NOT warn about f32 fallback
            model.fit(counts * 2, show_progress=False)

    assert model.user_factors.dtype == np.float64
    reconstructed = model.user_factors @ model.item_factors.T
    np.testing.assert_allclose(counts.toarray(), reconstructed, atol=1e-3)


def test_factorize_float64_without_x64_warns():
    counts = _toy_counts()
    model = AlternatingLeastSquares(factors=6, dtype=np.float64, random_state=42)
    with pytest.warns(Warning, match="x64"):
        model.fit(counts * 2, show_progress=False)
    assert model.user_factors.dtype == np.float64


def test_zero_iterations_with_loss():
    """iterations=0 with loss tracking must not crash (reference
    als_test.py:38-42) and must leave usable initialized factors."""
    from scipy.sparse import csr_matrix as _csr

    model = AlternatingLeastSquares(factors=16, iterations=0,
                                    calculate_training_loss=True, random_state=0)
    model.fit(_csr(np.ones((10, 10), dtype=np.float32)), show_progress=False)
    assert model.user_factors.shape == (10, 16)
    assert np.isfinite(model.user_factors).all()


def test_grid_pow2_matches_fine():
    """The bucketing grid is a compile-time/padding trade only: padding
    entries carry confidence 0 and are masked, so per-row solves are
    identical math under either grid."""
    from scipy.sparse import random as sparse_random

    rng = np.random.default_rng(4)
    likes = sparse_random(300, 120, density=0.05, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 8, n).astype(np.float64))
    likes = likes.tocsr()

    fine = AlternatingLeastSquares(factors=16, iterations=6, random_state=5,
                                   grid="fine")
    pow2 = AlternatingLeastSquares(factors=16, iterations=6, random_state=5,
                                   grid="pow2")
    fine.fit(likes, show_progress=False)
    pow2.fit(likes, show_progress=False)

    np.testing.assert_allclose(pow2.user_factors, fine.user_factors,
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(pow2.item_factors, fine.item_factors,
                               rtol=2e-4, atol=1e-6)


def test_grid_invalid_rejected():
    with pytest.raises(ValueError, match="grid"):
        AlternatingLeastSquares(grid="coarse")


def test_concurrent_aot_compile_path_active(caplog):
    """The concurrent side-program compile must not silently fall back to
    the plain jit path (a thread-local-config regression did exactly that
    once — caught only because the fallback logged a warning)."""
    import logging

    likes = csr_matrix(np.ones((20, 12), dtype=np.float32))
    with caplog.at_level(logging.WARNING, logger="implicit_tpu"):
        model = AlternatingLeastSquares(factors=8, iterations=2, random_state=0)
        model.fit(likes, show_progress=False)
    bad = [r for r in caplog.records if "AOT compile failed" in r.getMessage()]
    assert not bad, bad


def test_stored_zeros_treated_as_unobserved():
    # explicitly stored zeros must not be read as packing padding mid-row:
    # ingestion drops them, giving the same factors as an eliminated matrix
    import scipy.sparse as sp

    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(0)
    dense = (rng.random((40, 25)) < 0.2) * rng.integers(1, 9, (40, 25))
    with_zeros = sp.csr_matrix(dense.astype(np.float32))
    # insert explicit zeros into half the rows' first stored entry
    wz = with_zeros.copy()
    for r in range(0, 40, 2):
        lo, hi = wz.indptr[r], wz.indptr[r + 1]
        if hi > lo:
            wz.data[lo] = 0.0
    clean = wz.copy()
    clean.eliminate_zeros()

    a = AlternatingLeastSquares(factors=8, iterations=5, random_state=3)
    a.fit(wz, show_progress=False)
    b = AlternatingLeastSquares(factors=8, iterations=5, random_state=3)
    b.fit(clean, show_progress=False)
    np.testing.assert_allclose(a.user_factors, b.user_factors, atol=1e-6)
    # the caller's matrix is untouched
    assert (wz.data == 0).any()


def test_gather_quant_model_knob():
    # knob validation + "auto" per-side resolution + an end-to-end quantized
    # fit that still ranks (the speed case is TPU-only: VMEM promotion,
    # see ops/als.py VMEM_PROMO_BYTES)
    import pytest

    from implicit_tpu.models.als import AlternatingLeastSquares as ALS
    from implicit_tpu.ops import als as als_ops

    with pytest.raises(ValueError):
        ALS(gather_quant="yes")

    m = ALS(factors=32, dtype=np.float16, gather_quant="auto")
    lim_rows = als_ops.VMEM_PROMO_BYTES // (32 * 2)
    assert m._gather_quant_sides(10, 10) == (False, False)
    # item side gathers from the USER table -> huge user count quantizes
    # only the item side
    assert m._gather_quant_sides(lim_rows + 1, 10) == (False, True)
    assert m._gather_quant_sides(10, lim_rows + 1) == (True, False)
    # f32 compute is never silently requantized
    m32 = ALS(factors=32, gather_quant="auto")
    assert m32._gather_quant_sides(lim_rows * 4, lim_rows * 4) == (False, False)

    likes = get_checkerboard(50)
    model = ALS(factors=16, iterations=5, random_state=3, gather_quant=True)
    model.fit(likes, show_progress=False)
    ids, _ = model.recommend(0, likes[0], N=5)
    base = ALS(factors=16, iterations=5, random_state=3)
    base.fit(likes, show_progress=False)
    base_ids, _ = base.recommend(0, likes[0], N=5)
    # same checkerboard structure recovered through the quantized gathers
    assert set(ids) & set(base_ids)
