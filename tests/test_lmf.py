"""LMF-specific tests."""

import numpy as np
from scipy.sparse import csr_matrix

from conftest import get_checkerboard
from implicit_tpu.lmf import LogisticMatrixFactorization


def test_factor_layout():
    # factors+2 columns; user[:, -2] and item[:, -1] pinned to 1.0
    likes = csr_matrix(np.ones((6, 5), dtype=np.float32))
    model = LogisticMatrixFactorization(factors=4, iterations=3, random_state=1)
    model.fit(likes, show_progress=False)
    assert model.user_factors.shape == (6, 6)
    assert model.item_factors.shape == (5, 6)
    np.testing.assert_allclose(model.user_factors[:, -2], 1.0)
    np.testing.assert_allclose(model.item_factors[:, -1], 1.0)


def test_empty_matrix():
    model = LogisticMatrixFactorization(factors=2, iterations=2, random_state=0)
    model.fit(csr_matrix(np.zeros((3, 3), dtype=np.float32)), show_progress=False)


def test_finite_factors():
    rng = np.random.RandomState(3)
    mat = (rng.rand(40, 30) < 0.2).astype(np.float32)
    model = LogisticMatrixFactorization(factors=8, iterations=10, random_state=3)
    model.fit(csr_matrix(mat), show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert np.isfinite(model.item_factors).all()


def test_window_pool_marginal_is_popularity_weighted():
    """Window pools must draw negatives with the same marginal distribution
    as the reference's RNGVector (uniform over the nnz index array =
    popularity-weighted over items, lmf.pyx:275-284). A window of the
    shuffled multiset at a uniform offset gives every array slot equal
    probability, so the marginal is exactly the popularity distribution."""
    import jax
    import jax.numpy as jnp

    # item popularity 4:2:1
    cols = np.array([0] * 4000 + [1] * 2000 + [2] * 1000, dtype=np.int32)
    rng = np.random.default_rng(5)
    P = 512
    arr = cols.copy()
    rng.shuffle(arr)
    arr = np.concatenate([arr, arr[:P]])  # wrap pad, as fit() does
    span = len(cols)

    counts = np.zeros(3)
    for seed in range(40):
        off = jax.random.randint(jax.random.PRNGKey(seed), (16,), 0, span)
        win = np.asarray(jax.vmap(
            lambda o: jax.lax.dynamic_slice(jnp.asarray(arr), (o,), (P,))
        )(off))
        counts += np.bincount(win.ravel(), minlength=3)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [4 / 7, 2 / 7, 1 / 7], atol=0.01)


def _row_update_args(rng, C, L, F, items, span_len):
    import jax.numpy as jnp

    from implicit_tpu.models.lmf import _build_pool

    X = jnp.asarray(rng.rand(C, F).astype(np.float32))
    dss = jnp.zeros((C, F), dtype=jnp.float32)
    Y = jnp.asarray(rng.rand(items, F).astype(np.float32))
    arr = rng.randint(0, items, size=span_len + 64).astype(np.int32)
    Ypop = _build_pool(Y, jnp.asarray(arr), True)
    crows = jnp.arange(C, dtype=jnp.int32)
    cidx = jnp.asarray(rng.randint(0, items, size=(C, L)).astype(np.int32))
    cdat = jnp.asarray(rng.rand(C, L).astype(np.float32) + 1)
    clen = jnp.full((C,), L, dtype=jnp.int32)
    return X, dss, Y, Ypop, crows, cidx, cdat, clen


def test_grouped_pools_decorrelate_rows():
    """Rows in different 8-row groups of a chunk see different pools."""
    import jax
    import jax.numpy as jnp

    from implicit_tpu.models.lmf import _row_update

    rng = np.random.RandomState(0)
    C, L, F, items = 16, 4, 8, 50
    X, dss, Y, Ypop, crows, cidx, cdat, clen = _row_update_args(
        rng, C, L, F, items, span_len=400
    )

    x, d = _row_update(X, dss, Y, Ypop, 400, crows, cidx, cdat, clen,
                       jax.random.PRNGKey(7), jnp.float32(1.0),
                       jnp.float32(0.0), jnp.int32(30), 64)
    assert np.isfinite(np.asarray(x)).all()

    # identical inputs in rows 0 and 8 (different groups) should still get
    # different negative pools, hence different updates
    X2 = jnp.asarray(np.tile(np.asarray(X)[:1], (C, 1)))
    cidx2 = jnp.tile(cidx[:1], (C, 1))
    cdat2 = jnp.tile(cdat[:1], (C, 1))
    # warm AdaGrad accumulator: with dss=0 the update saturates to
    # lr*sign(deriv) elementwise and pool differences vanish to ~1e-6;
    # a warm accumulator keeps the step proportional to the gradient so
    # pool noise stays visible. Few draws (neg_prop=1 -> 4 per row).
    dss2 = jnp.full((C, F), 10.0, dtype=jnp.float32)
    x2, _ = _row_update(X2, dss2, Y, Ypop, 400, crows, cidx2, cdat2, clen,
                        jax.random.PRNGKey(7), jnp.float32(1.0),
                        jnp.float32(0.0), jnp.int32(1), 8)
    x2 = np.asarray(x2)
    np.testing.assert_allclose(x2[0], x2[7])    # same group -> same pool
    assert np.abs(x2[0] - x2[8]).max() > 1e-3   # different group -> different


def test_legacy_gather_fallback(monkeypatch):
    """Pools too large for HBM fall back to per-entry gathers and still train."""
    from implicit_tpu.models import lmf as lmf_mod

    monkeypatch.setattr(lmf_mod, "_POOL_BYTE_BUDGET", 0)
    rng = np.random.RandomState(5)
    mat = (rng.rand(50, 40) < 0.2).astype(np.float32)
    model = LogisticMatrixFactorization(factors=6, iterations=8, random_state=5)
    model.fit(csr_matrix(mat), show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert np.isfinite(model.item_factors).all()


def test_split_pool_scores_are_full_dot_products():
    """The split pool's f-dot + tail cross terms must equal the full-width
    dot product for arbitrary tail values (the tails' roles mirror between
    the user and item sides, so no pinning is assumed)."""
    import jax
    import jax.numpy as jnp

    from implicit_tpu.models.lmf import _build_pool

    rng = np.random.RandomState(4)
    S, F = 200, 10  # full width 10 = 8 factors + 2 tails
    Y = jnp.asarray(rng.rand(50, F).astype(np.float32))
    arr = jnp.asarray(rng.randint(0, 50, size=S).astype(np.int32))
    pf, t0, t1 = _build_pool(Y, arr, True)

    x = rng.rand(3, F).astype(np.float32)
    # split evaluation at a window
    off = 17
    P = 20
    block = np.asarray(pf[off:off + P]).astype(np.float32)
    tails0 = np.asarray(t0[off:off + P]).astype(np.float32)
    tails1 = np.asarray(t1[off:off + P]).astype(np.float32)
    split = (
        x[:, :F - 2] @ block.T
        + x[:, F - 2:F - 1] * tails0[None, :]
        + x[:, F - 1:F] * tails1[None, :]
    )
    full = x @ np.asarray(Y)[np.asarray(arr)[off:off + P]].T
    np.testing.assert_allclose(split, full, rtol=2e-2, atol=1e-2)  # bf16 pool


def test_reshuffle_arrangement_preserves_multiset():
    """The periodic pool re-shuffle permutes the popularity multiset and
    wrap-pads exactly like the per-fit arrangement."""
    import jax

    from implicit_tpu.models.lmf import _reshuffle_arrangement

    core = np.repeat(np.arange(50, dtype=np.int32), np.arange(1, 51))
    out = np.asarray(_reshuffle_arrangement(jax.random.PRNGKey(0), core, 70))
    assert out.shape == (len(core) + 70,)
    # body is a permutation of the multiset
    np.testing.assert_array_equal(np.sort(out[: len(core)]), np.sort(core))
    # pad wraps the permuted body
    np.testing.assert_array_equal(out[len(core):], out[:70])
    # and it actually permutes
    out2 = np.asarray(_reshuffle_arrangement(jax.random.PRNGKey(1), core, 70))
    assert not np.array_equal(out, out2)


def test_lmf_long_fit_with_reshuffle_converges():
    """A fit spanning several re-shuffle boundaries stays healthy."""
    likes = get_checkerboard(40)
    model = LogisticMatrixFactorization(factors=8, iterations=12, random_state=3)
    model.fit(likes * 3, show_progress=False)
    ids, scores = model.recommend(2, likes[2], N=1)
    assert ids[0] == 2
