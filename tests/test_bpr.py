"""BPR-specific tests (see /root/reference/tests/bpr_test.py:31-39)."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from implicit_tpu.bpr import BayesianPersonalizedRanking
from conftest import get_checkerboard


def test_empty_matrix():
    # fitting an empty matrix must not crash (reference issue #264)
    raw = [[0.0, 2.0, 1.5], [0.0, 0.0, 0.0]]
    model = BayesianPersonalizedRanking(factors=2, iterations=2, random_state=0)
    model.fit(csr_matrix(np.zeros((3, 3), dtype=np.float32)), show_progress=False)

    model = BayesianPersonalizedRanking(factors=2, iterations=2, random_state=0)
    model.fit(csr_matrix(np.array(raw, dtype=np.float32)), show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert np.isfinite(model.item_factors).all()


def test_factor_layout():
    # factors+1 columns; user bias column pinned to 1.0
    likes = csr_matrix(np.ones((6, 5), dtype=np.float32))
    model = BayesianPersonalizedRanking(factors=4, iterations=3, random_state=1)
    model.fit(likes, show_progress=False)
    assert model.user_factors.shape == (6, 5)
    assert model.item_factors.shape == (5, 5)
    np.testing.assert_allclose(model.user_factors[:, -1], 1.0)


def test_unliked_users_items_zeroed():
    mat = np.zeros((5, 5), dtype=np.float32)
    mat[0, 0] = mat[1, 1] = mat[2, 2] = 1.0
    model = BayesianPersonalizedRanking(factors=3, iterations=2, random_state=2)
    model.fit(csr_matrix(mat), show_progress=False)
    # users/items with no interactions start at all-zero factors and are
    # never sampled, so they stay zero (up to the pinned user bias column)
    np.testing.assert_allclose(model.user_factors[4, :-1], 0.0)
    np.testing.assert_allclose(model.user_factors[4, -1], 1.0)
    np.testing.assert_allclose(model.item_factors[4], 0.0)


def test_packed_sample_flats_match_split():
    """The packed (user, item) sample-pair layout (one row gather for
    u+liked per step — the round-4 measured 7% epoch cut) draws the same
    samples as the split flats and must produce BIT-IDENTICAL factors."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from implicit_tpu.models.bpr import _bpr_epoch
    from implicit_tpu.ops import membership

    rng = np.random.default_rng(0)
    likes = sp.random(60, 40, density=0.2,
                      random_state=np.random.RandomState(3), format="csr")
    likes.data[:] = 1.0
    likes.sort_indices()
    counts = np.ediff1d(likes.indptr)
    userids = np.repeat(np.arange(60, dtype=np.int32), counts)
    pt = membership.build_pair_table(likes, row_ids=userids)
    mh = (pt.a_bits, pt.b_bits, pt.bucket_bits)
    table = jnp.asarray(pt.table)

    X0 = rng.random((60, 8), dtype=np.float32)
    Y0 = rng.random((40, 8), dtype=np.float32)
    yb0 = rng.random(40, dtype=np.float32)
    import jax

    key = jax.random.PRNGKey(7)
    lr = jnp.float32(0.05)
    reg = jnp.float32(0.01)
    iids = jnp.asarray(likes.indices, dtype=jnp.int32)
    indptr = jnp.asarray(likes.indptr, dtype=jnp.int32)
    dummy = jnp.zeros((1,), dtype=jnp.int32)
    pairs = jnp.asarray(
        np.stack([userids, likes.indices.astype(np.int32)], axis=1))

    out_split = _bpr_epoch(
        jnp.asarray(X0), jnp.asarray(Y0), jnp.asarray(yb0),
        jnp.asarray(userids), iids, indptr, table, key, lr, reg,
        4, 64, True, 8, mh, 0, packed=False)
    out_packed = _bpr_epoch(
        jnp.asarray(X0), jnp.asarray(Y0), jnp.asarray(yb0),
        pairs, dummy, dummy, table, key, lr, reg,
        4, 64, True, 8, mh, 0, packed=True)

    np.testing.assert_array_equal(np.asarray(out_split[0]), np.asarray(out_packed[0]))
    np.testing.assert_array_equal(np.asarray(out_split[1]), np.asarray(out_packed[1]))
    np.testing.assert_array_equal(np.asarray(out_split[2]), np.asarray(out_packed[2]))
    assert int(out_split[3]) == int(out_packed[3])
    assert int(out_split[4]) == int(out_packed[4])


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_grouped_epoch_checkerboard_and_stats(mode, monkeypatch):
    """The user-grouped epoch (BPR_GROUPED=1: per-entry negative gathers;
    =2: window-pool negatives; =3: pooled ids/bias + live factor gathers) must keep the checkerboard exactness gate
    and produce sane training statistics (skipped > 0 with verification on,
    train accuracy high by the end)."""
    import implicit_tpu.models.bpr as bprmod
    from implicit_tpu.bpr import BayesianPersonalizedRanking

    monkeypatch.setattr(bprmod, "BPR_GROUPED", mode)
    cb = get_checkerboard(40)
    stats = []
    m = BayesianPersonalizedRanking(factors=31, learning_rate=0.01,
                                    regularization=0, random_state=42)
    m.fit(cb, show_progress=False,
          callback=lambda e, t, c, s: stats.append((c, s)))
    ids, _ = m.recommend(np.arange(40), cb, N=1)
    assert (ids[:, 0] == np.arange(40)).all()
    correct, skipped = stats[-1]
    total = cb.nnz
    assert skipped > 0  # verification actually rejects liked negatives
    assert correct / (total - skipped) > 0.85
    assert np.isfinite(m.user_factors).all()
    assert np.isfinite(m.item_factors).all()
    # the pinned user bias column survives the grouped path
    np.testing.assert_array_equal(m.user_factors[:, -1], 1.0)


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_grouped_epoch_explicit_zeros_and_empty_rows(mode, monkeypatch):
    """Stored explicit zeros count as positives (reference semantics: any
    stored entry is 'liked', bpr.pyx samples indices not values) and empty
    rows/cols keep zero factors."""
    import implicit_tpu.models.bpr as bprmod
    from implicit_tpu.bpr import BayesianPersonalizedRanking

    monkeypatch.setattr(bprmod, "BPR_GROUPED", mode)
    m = csr_matrix(np.array([
        [1.0, 0.0, 2.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [3.0, 1.0, 0.0, 0.0],
        [0.0, 1.0, 1.0, 1.0],
    ]))
    m[0, 2] = 0.0  # explicit stored zero
    model = BayesianPersonalizedRanking(factors=7, iterations=10,
                                        random_state=3)
    model.fit(m, show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert (model.user_factors[1, :-1] == 0).all()  # empty row stays zero


def test_epoch_mode_ctor_knob(monkeypatch):
    """epoch_mode overrides the module default; 'sampled' reproduces the
    classic engine bit-for-bit (same seed), and bad values raise."""
    import implicit_tpu.models.bpr as bprmod
    from implicit_tpu.bpr import BayesianPersonalizedRanking

    cb = get_checkerboard(12)

    # grouped is the module default
    assert bprmod.BPR_GROUPED == 1
    m_default = BayesianPersonalizedRanking(factors=7, iterations=3,
                                            random_state=5)
    assert m_default._resolve_epoch_mode() == 1

    # the ctor knob wins over the module flag
    monkeypatch.setattr(bprmod, "BPR_GROUPED", 0)
    m_grp = BayesianPersonalizedRanking(factors=7, iterations=3,
                                        random_state=5, epoch_mode="grouped")
    assert m_grp._resolve_epoch_mode() == 1

    # 'sampled' == classic engine, bit-identical to BPR_GROUPED=0
    m_cls = BayesianPersonalizedRanking(factors=7, iterations=3,
                                        random_state=5)
    m_cls.fit(cb, show_progress=False)
    m_s = BayesianPersonalizedRanking(factors=7, iterations=3,
                                      random_state=5, epoch_mode="sampled")
    m_s.fit(cb, show_progress=False)
    np.testing.assert_array_equal(m_cls.user_factors, m_s.user_factors)
    np.testing.assert_array_equal(m_cls.item_factors, m_s.item_factors)

    with pytest.raises(ValueError, match="epoch_mode"):
        BayesianPersonalizedRanking(epoch_mode="hogwild").fit(
            cb, show_progress=False)


def test_grouped_long_row_regularization_stable(monkeypatch):
    """A user row longer than 1/(lr*reg) must shrink via the exact
    (1-lr*reg)^n factor, not the first-order 1-n*lr*reg (which goes
    negative and explodes factors)."""
    import implicit_tpu.models.bpr as bprmod
    from implicit_tpu.bpr import BayesianPersonalizedRanking

    monkeypatch.setattr(bprmod, "BPR_GROUPED", 1)
    rng = np.random.default_rng(0)
    users, items = 8, 300
    dense = np.zeros((users, items), dtype=np.float32)
    dense[0, :250] = 1.0  # 250 > 1/(lr*reg) = 200 at lr=0.2, reg=0.025
    for u in range(1, users):
        dense[u, rng.choice(items, 20, replace=False)] = 1.0
    model = BayesianPersonalizedRanking(
        factors=15, learning_rate=0.2, regularization=0.025, iterations=5,
        random_state=1)
    model.fit(csr_matrix(dense), show_progress=False)
    assert np.isfinite(model.user_factors).all()
    assert np.abs(model.user_factors[0, :-1]).max() < 10.0
