"""Update-equation parity oracles transcribed from the reference Cython.

The reference's BPR and LMF trainers exist only as compiled Cython
(/root/reference/implicit/cpu/bpr.pyx:249-303, lmf.pyx:231-292) with no
pure-Python fallback, so — unlike ALS, which test_reference_parity.py runs
head-to-head from the reference's own tree — their parity previously rested
on behavior tests. These tests close that gap at the update-equation level:
each reference kernel's inner loop is transcribed line-for-line into numpy
(sequential, one sample / one row at a time, exactly the pyx order), fed the
SAME sample draws as the device step, and the device epoch must reproduce
its factors.

Divergences that remain by design (and are *excluded* here by construction):
sample-draw RNG (we replicate the draws), Hogwild scheduling (batch=1 makes
the device step sequential too), and the LMF negative-pool bf16 scoring
(asserted at bf16 tolerance, with the quantization-free pieces asserted
tight).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse


def _f32(x):
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# BPR: transcription of bpr_update (/root/reference/implicit/cpu/bpr.pyx:249-303)
# ---------------------------------------------------------------------------

def bpr_update_oracle(samples, userids, itemids, indptr, X, Y, lr, reg,
                      verify_neg=True):
    """Sequential numpy transcription of the reference ``bpr_update``.

    ``samples`` is the list of (liked_index, disliked_index) draws (the
    reference draws them from per-thread mt19937 streams, bpr.pyx:268-272;
    here they are injected so the device epoch can be fed the same ones).
    ``X``/``Y`` use the reference's glued factors+1 layout and are updated
    in place. Returns (correct, skipped).
    """
    lr = np.float32(lr)
    reg = np.float32(reg)
    factors = X.shape[1] - 1
    correct = skipped = 0
    for liked_index, disliked_index in samples:
        liked_id = itemids[liked_index]
        disliked_id = itemids[disliked_index]
        u = userids[liked_index]
        # has_non_zero (bpr.pyx:63-67): binary search of the user's row
        if verify_neg and disliked_id in itemids[indptr[u]:indptr[u + 1]]:
            skipped += 1
            continue
        user, liked, disliked = X[u], Y[liked_id], Y[disliked_id]
        # score loop runs factors+1 terms: the glued bias column contributes
        # user[factors] (pinned 1.0) * (liked[factors] - disliked[factors])
        score = np.float32(0)
        for j in range(factors + 1):
            score += user[j] * (liked[j] - disliked[j])
        z = np.float32(1.0) / (np.float32(1.0) + np.exp(score))
        if z < 0.5:
            correct += 1
        # bpr.pyx:293-297 — temp snapshots the pre-update user value so the
        # liked/disliked updates see OLD user factors
        for j in range(factors):
            temp = user[j]
            user[j] += lr * (z * (liked[j] - disliked[j]) - reg * user[j])
            liked[j] += lr * (z * temp - reg * liked[j])
            disliked[j] += lr * (-z * temp - reg * disliked[j])
        # bpr.pyx:299-301 — item bias terms (last column)
        liked[factors] += lr * (z - reg * liked[factors])
        disliked[factors] += lr * (-z - reg * disliked[factors])
    return correct, skipped


def _replicate_bpr_draws(key, steps, batch, n_samples):
    """The exact jax.random calls _bpr_epoch makes, executed host-side."""
    out = []
    for sk in jax.random.split(key, steps):
        k1, k2 = jax.random.split(sk)
        liked = np.asarray(jax.random.randint(k1, (batch,), 0, n_samples))
        disliked = np.asarray(jax.random.randint(k2, (batch,), 0, n_samples))
        out.extend(zip(liked.tolist(), disliked.tolist()))
    return out


@pytest.mark.parametrize("verify_neg", [True, False])
def test_bpr_epoch_matches_pyx_transcription(verify_neg):
    from implicit_tpu.models.bpr import _bpr_epoch

    rng = np.random.default_rng(5)
    users, items, factors = 40, 30, 8
    likes = sparse.random(users, items, density=0.3, random_state=7,
                          format="csr", dtype=np.float32)
    likes.data[:] = 1.0
    likes.sort_indices()
    userids = np.repeat(np.arange(users, dtype=np.int32),
                        np.ediff1d(likes.indptr))
    itemids = likes.indices.astype(np.int32)
    n_samples = len(itemids)

    X0 = _f32(rng.standard_normal((users, factors + 1)) * 0.1)
    X0[:, factors] = 1.0
    Y0 = _f32(rng.standard_normal((items, factors + 1)) * 0.1)
    lr, reg = 0.05, 0.01
    steps, batch = 48, 1  # batch=1: the device step is sequential like the pyx

    key = jax.random.PRNGKey(11)
    samples = _replicate_bpr_draws(key, steps, batch, n_samples)

    Xo, Yo = X0.copy(), Y0.copy()
    correct_o, skipped_o = bpr_update_oracle(
        samples, userids, itemids, likes.indptr, Xo, Yo, lr, reg, verify_neg)
    assert skipped_o > 0 if verify_neg else skipped_o == 0  # both paths real

    max_row = int(np.ediff1d(likes.indptr).max())
    bisect_iters = int(np.ceil(np.log2(max(max_row, 2)))) + 1
    Xd, Yd, yb, correct_d, skipped_d = _bpr_epoch(
        jnp.asarray(X0[:, :factors]), jnp.asarray(Y0[:, :factors]),
        jnp.asarray(Y0[:, factors]),
        jnp.asarray(userids), jnp.asarray(itemids),
        jnp.asarray(likes.indptr.astype(np.int32)),
        jnp.zeros((1, 1), dtype=jnp.uint16),
        key, jnp.float32(lr), jnp.float32(reg),
        steps=steps, batch=batch, verify_neg=verify_neg,
        bisect_iters=bisect_iters, mh=None,
    )
    assert int(correct_d) == correct_o
    assert int(skipped_d) == skipped_o
    np.testing.assert_allclose(np.asarray(Xd), Xo[:, :factors],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Yd), Yo[:, :factors],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yb), Yo[:, factors],
                               rtol=1e-4, atol=2e-5)


def test_bpr_cuckoo_verifier_matches_bisection_epoch():
    """The packed/cuckoo production path must produce the same epoch as the
    bisection path the transcription test exercises (same RNG draws)."""
    from implicit_tpu.models.bpr import _bpr_epoch
    from implicit_tpu.ops import membership

    rng = np.random.default_rng(6)
    users, items, factors = 40, 30, 8
    likes = sparse.random(users, items, density=0.3, random_state=8,
                          format="csr", dtype=np.float32)
    likes.data[:] = 1.0
    likes.sort_indices()
    userids = np.repeat(np.arange(users, dtype=np.int32),
                        np.ediff1d(likes.indptr))
    itemids = likes.indices.astype(np.int32)

    X0 = _f32(rng.standard_normal((users, factors)) * 0.1)
    Y0 = _f32(rng.standard_normal((items, factors)) * 0.1)
    yb0 = _f32(rng.standard_normal(items) * 0.1)
    key = jax.random.PRNGKey(3)
    max_row = int(np.ediff1d(likes.indptr).max())
    bisect_iters = int(np.ceil(np.log2(max(max_row, 2)))) + 1
    common = dict(steps=16, batch=8, verify_neg=True)

    outs = []
    for use_cuckoo in (False, True):
        mh = None
        table = np.zeros((1, 1), dtype=np.uint16)
        uids = jnp.asarray(userids)
        iids = jnp.asarray(itemids)
        indptr = jnp.asarray(likes.indptr.astype(np.int32))
        packed = False
        if use_cuckoo:
            pt = membership.build_pair_table(likes, row_ids=userids)
            assert pt is not None
            mh = (pt.a_bits, pt.b_bits, pt.bucket_bits)
            table = pt.table
            uids = jnp.asarray(np.stack([userids, itemids], axis=1))
            iids = indptr = jnp.zeros((1,), dtype=jnp.int32)
            packed = True
        outs.append(_bpr_epoch(
            jnp.asarray(X0), jnp.asarray(Y0), jnp.asarray(yb0),
            uids, iids, indptr, jnp.asarray(table), key,
            jnp.float32(0.05), jnp.float32(0.01),
            bisect_iters=bisect_iters, mh=mh, packed=packed, **common))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# LMF: transcription of lmf_update (/root/reference/implicit/cpu/lmf.pyx:231-292)
# ---------------------------------------------------------------------------

def lmf_update_row_oracle(x, dss_row, Y, pos_idx, pos_data, neg_idx, lr, reg):
    """Numpy transcription of one user's ``lmf_update`` body (full width F —
    the pyx updates the pinned columns too and re-pins them each epoch,
    lmf.pyx:188-194). ``neg_idx`` is the realized negative draw (the pyx
    draws them as ``indices[rng.generate()]``, the popularity multiset;
    injected here so the device step can be fed the same ones)."""
    lr, reg = np.float32(lr), np.float32(reg)
    x, dss_row = x.copy(), dss_row.copy()
    deriv = np.zeros_like(x)
    # positives: c_ui * y_i  (lmf.pyx:252-256)
    for i, c in zip(pos_idx, pos_data):
        deriv += c * Y[i]
    # positives: -sigmoid(x.y_i) * c_ui * y_i  (lmf.pyx:258-265)
    for i, c in zip(pos_idx, pos_data):
        z = _sigmoid32(np.float32(x @ Y[i])) * c
        deriv -= z * Y[i]
    # sampled negatives: -sigmoid(x.y_i) * y_i  (lmf.pyx:267-283)
    for i in neg_idx:
        z = _sigmoid32(np.float32(x @ Y[i]))
        deriv -= z * Y[i]
    # regularizer + AdaGrad (lmf.pyx:285-290)
    deriv -= reg * x
    dss_row += deriv * deriv
    x += (lr / np.sqrt(np.float32(1e-6) + dss_row)) * deriv
    return x, dss_row


def _sigmoid32(v):
    # lmf.pyx:221-226 stable sigmoid
    if v >= 0:
        return np.float32(1.0) / (np.float32(1.0) + np.exp(-v))
    z = np.exp(v)
    return z / (np.float32(1.0) + z)


def _lmf_device_row(x0, d0, Y, cols, cdat, neg_src, neg_prop, lr, reg, key):
    """Run _row_update (legacy per-entry negative gathers) for one row and
    also return the realized negative index draw it made."""
    from implicit_tpu.models.lmf import _row_update

    L = len(cols)
    span = len(neg_src)
    neg_count = int(min(Y.shape[0], L * neg_prop))
    x, d = _row_update(
        jnp.asarray(x0)[None], jnp.asarray(d0)[None], jnp.asarray(Y),
        jnp.asarray(neg_src), span,
        jnp.asarray([0], dtype=jnp.int32),
        jnp.asarray(cols, dtype=jnp.int32)[None],
        jnp.asarray(cdat)[None],
        jnp.asarray([L], dtype=jnp.int32),
        key, jnp.float32(lr), jnp.float32(reg), neg_prop, neg_count,
        window=False,
    )
    # replicate the draw _row_update makes on the legacy path (G=1 group)
    nidx = np.asarray(jax.random.randint(key, (1, neg_count), 0, span))
    ncount = int(min(Y.shape[0], L * neg_prop))
    neg_idx = neg_src[nidx[0, :ncount]]
    return np.asarray(x[0]), np.asarray(d[0]), neg_idx


def test_lmf_row_update_positives_and_adagrad_match_pyx_exactly():
    """neg_prop=0 removes the (bf16-scored) negative term: the positive
    contributions, regularizer and AdaGrad update must match the pyx
    transcription tightly."""
    rng = np.random.default_rng(9)
    items, F = 20, 10  # full width = factors+2 in the model's layout
    Y = _f32(rng.standard_normal((items, F)) * 0.3)
    x0 = _f32(rng.standard_normal(F) * 0.3)
    d0 = _f32(rng.random(F) * 0.1)
    cols = np.array([2, 5, 11, 17], dtype=np.int32)
    cdat = _f32([3.0, 1.0, 2.0, 5.0])
    neg_src = np.repeat(np.arange(items, dtype=np.int32), 3)

    x_dev, d_dev, neg_idx = _lmf_device_row(
        x0, d0, Y, cols, cdat, neg_src, 0, 1.0, 0.6, jax.random.PRNGKey(2))
    assert len(neg_idx) == 0
    x_o, d_o = lmf_update_row_oracle(x0, d0, Y, cols, cdat, [], 1.0, 0.6)
    np.testing.assert_allclose(x_dev, x_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_dev, d_o, rtol=1e-5, atol=1e-6)


def test_lmf_row_update_with_negatives_matches_pyx_at_bf16_tolerance():
    """Full update including the negative term, same realized draws. The
    device scores negatives through bf16 inputs with f32 accumulation
    (models/lmf.py:_row_update), so parity is asserted at bf16 tolerance
    (~2^-9 relative on the negative term)."""
    rng = np.random.default_rng(12)
    items, F = 24, 10
    Y = _f32(rng.standard_normal((items, F)) * 0.3)
    x0 = _f32(rng.standard_normal(F) * 0.3)
    # AdaGrad divides the step by sqrt(dss): a near-zero accumulator would
    # amplify the bf16 scoring noise ~10x and the assertion would measure
    # that amplification, not the equations — start it away from zero
    d0 = _f32(0.5 + rng.random(F))
    cols = np.array([1, 4, 9], dtype=np.int32)
    cdat = _f32([2.0, 4.0, 1.0])
    # popularity multiset: item i appears i//4+1 times
    neg_src = np.concatenate(
        [np.full(i // 4 + 1, i, dtype=np.int32) for i in range(items)])

    x_dev, d_dev, neg_idx = _lmf_device_row(
        x0, d0, Y, cols, cdat, neg_src, 5, 1.0, 0.6, jax.random.PRNGKey(4))
    assert len(neg_idx) == min(items, len(cols) * 5)
    x_o, d_o = lmf_update_row_oracle(x0, d0, Y, cols, cdat, neg_idx, 1.0, 0.6)
    np.testing.assert_allclose(x_dev, x_o, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(d_dev, d_o, rtol=5e-2, atol=5e-3)
