"""Bayesian Personalized Ranking, TPU-native.

Same objective and factor layout as the reference
(/root/reference/implicit/cpu/bpr.pyx:70-303, implicit/gpu/bpr.cu:17-137):
pairwise sigmoid ranking SGD over (user, liked, disliked) triples, with an
extra trailing column on the factors holding the item bias (the matching user
column is pinned to 1.0).

The reference trains Hogwild-style — racing unsynchronized updates across
OpenMP threads / CUDA blocks. On TPU we replace that with *deterministic
synchronous minibatch SGD*: each epoch draws nnz random (liked, disliked)
index pairs with ``jax.random``, processes them in fixed-size minibatches via
``lax.scan``, verifies negatives with a vectorized per-row binary search over
the CSR indices, and applies gradients with scatter-add (colliding updates
within a minibatch sum). Same objective, deterministic schedule.
"""

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from tqdm.auto import tqdm

from ..ops import membership
from ..utils import check_csr, check_random_state
from .mf_base import MatrixFactorizationBase

log = logging.getLogger("implicit_tpu")

# minibatch cap: every scan step pays factor-buffer update traffic, so
# fewer/bigger steps train faster, while batches past this size measurably
# slow convergence per-sample (more intra-batch collisions on hot rows)
_MAX_BATCH = 65536


def _segment_member(indptr, indices, u, col, n_iters):
    """Vectorized binary search: is ``col`` present in CSR row ``u``?

    Replaces the reference's std::binary_search negative-sample verification
    (/root/reference/implicit/cpu/bpr.pyx:63-67). ``n_iters`` must be >=
    ceil(log2(max_row_length)) + 1.
    """
    n = indices.shape[0]
    lo = indptr[u]
    hi = indptr[u + 1]

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = indices[jnp.clip(mid, 0, n - 1)]
        go_right = v < col
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return (lo < indptr[u + 1]) & (indices[jnp.clip(lo, 0, n - 1)] == col)


def _verify_skip(indptr, itemids, table, u, cols, verify_neg, bisect_iters, mh):
    """Which sampled negatives are actually liked (and must be skipped).

    Two exact implementations: the O(1) cuckoo pair table (two independent
    bucket gathers per sample — see ops/membership.py) when one was built,
    else the vectorized per-row bisection over the CSR indices (the direct
    analogue of the reference's std::binary_search, bpr.pyx:63-67).
    """
    if not verify_neg:
        return jnp.zeros(u.shape, dtype=bool)
    if mh is not None:
        return membership._member(table, u, cols, *mh, jnp)
    return _segment_member(indptr, itemids, u, cols, bisect_iters)


# sort each minibatch's samples by user id before the X gather/scatter and
# (when 2) additionally sort the item scatters by item id: coalesced ids can
# lower TPU gather/scatter issue cost (adjacent rows share DMA descriptors).
# 0 = off, 1 = sort by user, 2 = sort by user + per-scatter item sorts.
# Default chosen by measurement on the real TPU (see STATUS.md).
BPR_SORT_SAMPLES = 0

# unified factor buffer: stack X and Y into one (users+items, F) table so a
# step issues ONE 3B-row gather and ONE 3B-row scatter-add (plus a combined
# 2B bias gather/scatter) instead of 3 gathers + 5 scatters. Row traffic is
# identical; the target is per-op issue/scheduling overhead, which the
# round-2/3 measurements put at ~2x the raw gather/scatter floor.
# Measured dead end (round 3: +11%); kept as a documented measurement point.
BPR_FUSED_BUFFER = 0

# user-grouped epoch (round 5): instead of drawing nnz random positives,
# visit every positive once per epoch through the bucketed CSR chunks the
# ALS/LMF engines already use. The TPU gather/scatter engine is PER-INDEX
# bound (round-4 decomposition: 43% of the classic epoch is scatters and a
# 4B indexed op costs ~2x a 512B row op), and grouping turns every
# user-side indexed op into a chunk-contiguous one: X gathers/scatters drop
# from ~2*nnz to ~2*n_users per epoch and the per-sample index gathers
# vanish entirely (positives stream out of the resident chunk tensors).
# 0 = classic sampled epoch, 1 = grouped with per-entry negative gathers
# (exact reference popularity draw), 2 = grouped with window-pool negatives
# (the LMF pool trick: negatives slice a pre-shuffled popularity snapshot,
# removing the per-entry negative row/bias/id gathers too), 3 = grouped
# with pooled negative ids/biases but LIVE per-entry factor gathers (the
# 4-byte indexed ops vanish, the factor-window HBM blowup of mode 2
# doesn't appear).
# Measured on v5e (last.fm shape, f=128, round 5, two sessions): classic
# 2.43-2.45 s/epoch, grouped 1.89-1.91 (1.27-1.30x, p@10 parity on the
# clustered gate 0.8703 vs 0.8708), grouped+pool 3.03-3.04 (the (C,L,F)
# window slices cost more HBM traffic than the negative gathers they
# remove — a measured dead end), grouped+poolids 2.69 (0.90x — also a
# dead end: the (C,L) id/bias window slices still materialize per-chunk
# tensors costing more than the 4B gathers they replace, and the
# negative FACTOR gathers, the actual wall, are untouched).
# Mode 1 is the default; the ctor's epoch_mode overrides per model.
BPR_GROUPED = 1


@functools.partial(
    jax.jit,
    static_argnames=("steps", "batch", "verify_neg", "bisect_iters", "mh",
                     "n_users"),
    donate_argnums=(0, 1),
)
def _bpr_epoch_fused(
    W, yb, userids, itemids, indptr, table, key, lr, reg,
    steps, batch, verify_neg, bisect_iters, mh, n_users,
):
    """One BPR epoch over the unified (users+items, factors) buffer ``W``.

    Same samples, objective and update math as ``_bpr_epoch`` (the RNG draws
    are identical), but user rows live at W[:n_users] and item rows at
    W[n_users:], so the three per-step row gathers collapse into one and the
    three row scatter-adds into one (scatter-add is order-insensitive up to
    float rounding). See ``BPR_FUSED_BUFFER`` above.
    """
    n_samples = userids.shape[0]

    def step(carry, subkey):
        W, yb, correct, skipped = carry
        k1, k2 = jax.random.split(subkey)
        liked_idx = jax.random.randint(k1, (batch,), 0, n_samples)
        disliked_idx = jax.random.randint(k2, (batch,), 0, n_samples)

        u = userids[liked_idx]
        liked = itemids[liked_idx]
        disliked = itemids[disliked_idx]

        skip = _verify_skip(indptr, itemids, table, u, disliked,
                            verify_neg, bisect_iters, mh)

        idx = jnp.concatenate([u, liked + n_users, disliked + n_users])
        rows = W[idx]
        xu = rows[:batch]
        yl = rows[batch : 2 * batch]
        yd = rows[2 * batch :]
        bidx = jnp.concatenate([liked, disliked])
        b = yb[bidx]
        bl = b[:batch]
        bd = b[batch:]

        score = jnp.sum(xu * (yl - yd), axis=1) + bl - bd
        z = 1.0 / (1.0 + jnp.exp(score))

        keep = ~skip
        correct = correct + jnp.sum((z < 0.5) & keep)
        skipped = skipped + jnp.sum(skip)

        scale = jnp.where(keep, lr, 0.0)[:, None]
        upd = jnp.concatenate([
            scale * (z[:, None] * (yl - yd) - reg * xu),
            scale * (z[:, None] * xu - reg * yl),
            scale * (-z[:, None] * xu - reg * yd),
        ])
        W = W.at[idx].add(upd)
        bupd = jnp.concatenate([
            scale[:, 0] * (z - reg * bl), scale[:, 0] * (-z - reg * bd)
        ])
        yb = yb.at[bidx].add(bupd)
        return (W, yb, correct, skipped), None

    subkeys = jax.random.split(key, steps)
    (W, yb, correct, skipped), _ = jax.lax.scan(
        step, (W, yb, jnp.int32(0), jnp.int32(0)), subkeys
    )
    return W, yb, correct, skipped


@functools.partial(
    jax.jit,
    static_argnames=("steps", "batch", "verify_neg", "bisect_iters", "mh",
                     "sort_samples", "packed"),
    donate_argnums=(0, 1, 2),
)
def _bpr_epoch(
    X, Y, yb, userids, itemids, indptr, table, key, lr, reg,
    steps, batch, verify_neg, bisect_iters, mh, sort_samples=0,
    packed=False,
):
    """One BPR training epoch: steps x batch sampled pairwise SGD updates.

    The item bias lives in its own (items,) vector ``yb`` rather than as a
    glued factors+1 column (the reference layout, bpr.pyx:299-301). Both
    layouts were measured on the chip (round 4,
    benchmarks/round4_bpr_glued.py): the gather/scatter engine is
    PER-INDEX bound, so the glued layout's 256-lane rows at pow2 factor
    counts cost 32% more epoch wall than the split layout's 4 extra small
    bias ops — split stays. The public numpy layout is reassembled at the
    fit boundary. The user bias column is pinned to 1.0 and carries no
    state at all.

    ``packed=True`` (the default path when the cuckoo verifier is active):
    ``userids`` is the (nnz, 2) int32 array of interleaved (user, item)
    pairs, so each step's u+liked arrive in ONE 8B-row gather and disliked
    in a second — 3 small 4B index gathers become 2 row gathers, a
    measured 7% epoch cut (2.619 -> 2.448 s at last.fm f=128). Identical
    samples (same RNG draws), bit-identical training statistics.
    """
    n_samples = userids.shape[0]

    def step(carry, subkey):
        X, Y, yb, correct, skipped = carry
        k1, k2 = jax.random.split(subkey)
        liked_idx = jax.random.randint(k1, (batch,), 0, n_samples)
        disliked_idx = jax.random.randint(k2, (batch,), 0, n_samples)

        if packed:
            pair = userids[liked_idx]
            u, liked = pair[:, 0], pair[:, 1]
            disliked = userids[disliked_idx][:, 1]
        else:
            u = userids[liked_idx]
            liked = itemids[liked_idx]
            disliked = itemids[disliked_idx]
        if sort_samples:
            order = jnp.argsort(u)
            u = u[order]
            liked = liked[order]
            disliked = disliked[order]

        skip = _verify_skip(indptr, itemids, table, u, disliked,
                            verify_neg, bisect_iters, mh)

        u_sorted = bool(sort_samples)
        xu = X[u] if not u_sorted else X.at[u].get(indices_are_sorted=True)
        yl = Y[liked]
        yd = Y[disliked]
        bl = yb[liked]
        bd = yb[disliked]

        # user bias column is 1.0, so it contributes (bl - bd) to the score
        score = jnp.sum(xu * (yl - yd), axis=1) + bl - bd
        z = 1.0 / (1.0 + jnp.exp(score))

        keep = ~skip
        correct = correct + jnp.sum((z < 0.5) & keep)
        skipped = skipped + jnp.sum(skip)

        scale = jnp.where(keep, lr, 0.0)
        dx = z[:, None] * (yl - yd) - reg * xu
        dyl = z[:, None] * xu - reg * yl
        dyd = -z[:, None] * xu - reg * yd

        X = X.at[u].add(scale[:, None] * dx, indices_are_sorted=u_sorted)
        if sort_samples == 2:
            # per-scatter item-id sorts: the permutation fuses into the
            # scatter's operand gather
            ol = jnp.argsort(liked)
            od = jnp.argsort(disliked)
            liked_s, disliked_s = liked[ol], disliked[od]
            Y = Y.at[liked_s].add((scale[:, None] * dyl)[ol],
                                  indices_are_sorted=True)
            Y = Y.at[disliked_s].add((scale[:, None] * dyd)[od],
                                     indices_are_sorted=True)
            yb = yb.at[liked_s].add((scale * (z - reg * bl))[ol],
                                    indices_are_sorted=True)
            yb = yb.at[disliked_s].add((scale * (-z - reg * bd))[od],
                                       indices_are_sorted=True)
        else:
            Y = Y.at[liked].add(scale[:, None] * dyl)
            Y = Y.at[disliked].add(scale[:, None] * dyd)
            yb = yb.at[liked].add(scale * (z - reg * bl))
            yb = yb.at[disliked].add(scale * (-z - reg * bd))
        return (X, Y, yb, correct, skipped), None

    subkeys = jax.random.split(key, steps)
    (X, Y, yb, correct, skipped), _ = jax.lax.scan(
        step, (X, Y, yb, jnp.int32(0), jnp.int32(0)), subkeys
    )
    return X, Y, yb, correct, skipped


@functools.partial(
    jax.jit,
    static_argnames=("verify_neg", "bisect_iters", "mh", "pool_mode"),
    donate_argnums=(0, 1, 2),
)
def _bpr_epoch_grouped(X, Y, yb, classes, iflat, indptr, table, arrangement,
                       key, lr, reg, verify_neg, bisect_iters, mh,
                       pool_mode=False):
    """One user-grouped BPR epoch over bucketed CSR chunks (BPR_GROUPED).

    Visits every positive exactly once per epoch (the multiset the classic
    epoch samples uniformly WITH replacement — same expected visit counts),
    streaming them out of the same padded chunk tensors the ALS engine
    solves over. Per chunk of C user rows x L entries:

    - the C user factors arrive in one C-row gather and leave in one C-row
      set — per epoch that is ~2*n_users user-side indexed ops instead of
      the classic epoch's ~2*nnz, and the per-sample index gathers
      (liked/disliked flats) disappear entirely;
    - each entry draws one negative: ``pool_mode=0`` gathers it from
      the interaction multiset per entry (the reference's exact popularity
      draw, bpr.pyx:268-272); ``pool_mode=2`` slices each row's
      negatives AND their factors/biases from a pre-shuffled popularity
      snapshot (the measured LMF window trick) — ids and factors arrive as
      contiguous DMAs and the per-entry negative row/bias/id gathers
      vanish too, but the (C, L, F) factor windows re-read more HBM than
      the gathers they replace (measured dead end, STATUS.md round 5);
      ``pool_mode=1`` pools only the ids and biases (tiny contiguous
      slices) while the negative FACTORS stay live per-entry gathers —
      removing the per-entry id and bias gathers (the 4-byte indexed ops
      the engine pays ~2x a row op for) without the factor-window
      traffic. Pool bias values are epoch-start values (the update itself
      always lands on live Y/yb);
    - updates use the same equations as the classic epoch (gradients at
      chunk-start values, scatter-adds sum collisions), with one
      stability fix the grouping makes necessary: a user row's
      regularization applies as the exact sequential shrinkage
      ``(1-lr*reg)^n_kept`` — the first-order ``1 - n*lr*reg`` of summed
      per-sample terms goes *negative* for rows longer than 1/(lr*reg)
      (last.fm's hottest users exceed it 4x).

    Item-side updates keep the classic first-order form: chunks are sized
    (~64k entries, the classic batch size) so per-chunk duplicate counts of
    hot items match the classic epoch's per-batch counts.
    """
    n_users = X.shape[0]
    n_samples = iflat.shape[0]
    F = X.shape[1]
    correct = jnp.int32(0)
    skipped = jnp.int32(0)
    if pool_mode:
        # epoch-start popularity snapshot (functional: reads the input Y)
        ybpop = yb[arrangement]
        if pool_mode == 2:
            Ypop = Y[arrangement]
    gamma = jnp.maximum(1.0 - lr * reg, 0.0)

    for ci, (rows, idx, dat) in enumerate(classes):
        n_chunks = rows.shape[0]
        L = idx.shape[2]
        keys = jax.random.split(jax.random.fold_in(key, ci), n_chunks)

        def chunk_step(carry, chunk, L=L):
            X, Y, yb, correct, skipped = carry
            crows, cidx, cdat, ck = chunk
            C = crows.shape[0]
            x = X[jnp.clip(crows, 0, n_users - 1)]
            Yu = Y[cidx]
            bl = yb[cidx]
            if pool_mode:
                span = arrangement.shape[0] - L  # wrap-padded by max L
                off = jax.random.randint(ck, (C,), 0, span)
                negids = jax.vmap(
                    lambda o: jax.lax.dynamic_slice(arrangement, (o,), (L,))
                )(off)
                bn = jax.vmap(
                    lambda o: jax.lax.dynamic_slice(ybpop, (o,), (L,))
                )(off)
                if pool_mode == 2:
                    Yn = jax.vmap(
                        lambda o: jax.lax.dynamic_slice(Ypop, (o, 0), (L, F))
                    )(off)
                else:
                    Yn = Y[negids]
            else:
                r = jax.random.randint(ck, (C, L), 0, n_samples)
                negids = iflat[r]
                Yn = Y[negids]
                bn = yb[negids]
            u2 = jnp.broadcast_to(crows[:, None], (C, L))
            skip = _verify_skip(indptr, iflat, table, u2, negids,
                                verify_neg, bisect_iters, mh)
            diff = Yu - Yn
            score = jnp.einsum("clf,cf->cl", diff, x) + bl - bn
            z = 1.0 / (1.0 + jnp.exp(score))
            valid = cdat != 0
            keep = valid & ~skip
            correct = correct + jnp.sum((z < 0.5) & keep)
            skipped = skipped + jnp.sum(valid & skip)
            scale = jnp.where(keep, lr, 0.0)
            sz = scale * z
            n_keep = jnp.sum(keep, axis=1).astype(jnp.float32)
            x_new = (gamma ** n_keep)[:, None] * x + jnp.einsum(
                "cl,clf->cf", sz, diff)
            X = X.at[crows].set(x_new, mode="drop")
            dyl = sz[:, :, None] * x[:, None, :] - (scale * reg)[:, :, None] * Yu
            dyd = -sz[:, :, None] * x[:, None, :] - (scale * reg)[:, :, None] * Yn
            Y = Y.at[cidx].add(dyl)
            Y = Y.at[negids].add(dyd)
            yb = yb.at[cidx].add(scale * (z - reg * bl))
            yb = yb.at[negids].add(scale * (-z - reg * bn))
            return (X, Y, yb, correct, skipped), None

        (X, Y, yb, correct, skipped), _ = jax.lax.scan(
            chunk_step, (X, Y, yb, correct, skipped), (rows, idx, dat, keys)
        )
    return X, Y, yb, correct, skipped


@functools.lru_cache(maxsize=None)
def _build_sharded_epoch(mesh, axis_name, steps, local_batch, verify_neg,
                         bisect_iters, mh, packed=False):
    """Compiled multi-chip BPR epoch (cached per mesh/config).

    Each chip draws and verifies its slice of the minibatch (the per-sample
    work: RNG, negative-membership binary search, score/logit math), then the
    verified sample indices and logits ride one all-gather over ICI —
    O(batch) scalars, not factor rows — and every chip applies the identical
    full-batch update to its factor replica. Replicas stay bit-identical, so
    training is deterministic across any mesh size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def epoch(X, Y, yb, userids, itemids, indptr, table, key, lr, reg):
        dev = jax.lax.axis_index(axis_name)
        n_samples = userids.shape[0]

        def step(carry, subkey):
            X, Y, yb, correct, skipped = carry
            k1, k2 = jax.random.split(jax.random.fold_in(subkey, dev))
            liked_idx = jax.random.randint(k1, (local_batch,), 0, n_samples)
            disliked_idx = jax.random.randint(k2, (local_batch,), 0, n_samples)

            if packed:
                pair = userids[liked_idx]
                u_l, liked_l = pair[:, 0], pair[:, 1]
                disliked_l = userids[disliked_idx][:, 1]
            else:
                u_l = userids[liked_idx]
                liked_l = itemids[liked_idx]
                disliked_l = itemids[disliked_idx]

            skip_l = _verify_skip(indptr, itemids, table, u_l, disliked_l,
                                  verify_neg, bisect_iters, mh)

            score_l = (
                jnp.sum(X[u_l] * (Y[liked_l] - Y[disliked_l]), axis=1)
                + yb[liked_l] - yb[disliked_l]
            )
            z_l = 1.0 / (1.0 + jnp.exp(score_l))

            # one all-gather of indices + logits: every chip sees the full batch
            u = jax.lax.all_gather(u_l, axis_name, tiled=True)
            liked = jax.lax.all_gather(liked_l, axis_name, tiled=True)
            disliked = jax.lax.all_gather(disliked_l, axis_name, tiled=True)
            z = jax.lax.all_gather(z_l, axis_name, tiled=True)
            keep = ~jax.lax.all_gather(skip_l, axis_name, tiled=True)

            correct = correct + jnp.sum((z < 0.5) & keep)
            skipped = skipped + jnp.sum(~keep)

            xu = X[u]
            yl = Y[liked]
            yd = Y[disliked]
            bl = yb[liked]
            bd = yb[disliked]
            scale = jnp.where(keep, lr, 0.0)
            dx = z[:, None] * (yl - yd) - reg * xu
            dyl = z[:, None] * xu - reg * yl
            dyd = -z[:, None] * xu - reg * yd

            X = X.at[u].add(scale[:, None] * dx)
            Y = Y.at[liked].add(scale[:, None] * dyl)
            Y = Y.at[disliked].add(scale[:, None] * dyd)
            yb = yb.at[liked].add(scale * (z - reg * bl))
            yb = yb.at[disliked].add(scale * (-z - reg * bd))
            return (X, Y, yb, correct, skipped), None

        subkeys = jax.random.split(key, steps)
        (X, Y, yb, correct, skipped), _ = jax.lax.scan(
            step, (X, Y, yb, jnp.int32(0), jnp.int32(0)), subkeys
        )
        return X, Y, yb, correct, skipped

    return epoch


def _bpr_epoch_sharded(
    X, Y, yb, userids, itemids, indptr, table, key, lr, reg,
    steps, batch, verify_neg, bisect_iters, mh, mesh, axis_name="d",
    packed=False,
):
    """Runs one multi-chip BPR epoch (see _build_sharded_epoch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_devices = mesh.shape[axis_name]
    local_batch = -(-batch // n_devices)
    rep = NamedSharding(mesh, P())

    args = [
        jax.device_put(a, rep)
        for a in (X, Y, yb, userids, itemids, indptr, table)
    ]
    epoch = _build_sharded_epoch(
        mesh, axis_name, steps, local_batch, verify_neg, bisect_iters, mh,
        packed,
    )
    return epoch(*args, jax.device_put(key, rep), lr, reg)


class BayesianPersonalizedRanking(MatrixFactorizationBase):
    """Bayesian Personalized Ranking.

    Learns a matrix factorization by minimizing the pairwise ranking loss of
    'BPR: Bayesian Personalized Ranking from Implicit Feedback' (Rendle et
    al.). Nonzero entries are treated as binary positive signals.

    Parameters
    ----------
    factors : int, optional
        The number of latent factors (one extra bias column is stored)
    learning_rate : float, optional
    regularization : float, optional
    dtype : data-type, optional
    iterations : int, optional
        The number of training epochs
    verify_negative_samples : bool, optional
        Check that sampled negatives aren't actually liked by the user
    num_threads : int, optional
        API parity; ignored
    random_state : int, RandomState, Generator or None, optional
    mesh : jax.sharding.Mesh or int, optional
        Train across a device mesh: each chip samples and verifies its slice
        of every minibatch, sample indices/logits ride one all-gather, and
        factor replicas apply identical updates (deterministic). An int
        builds a 1-D mesh over that many local devices.
    epoch_mode : str, optional
        How an epoch visits the training pairs. ``"grouped"`` (default)
        streams every positive exactly once per epoch out of bucketed CSR
        chunks — measured 1.30x the classic epoch's throughput at last.fm
        scale with identical ranking quality, because the TPU gather/scatter
        engine is per-index bound and grouping collapses the user-side
        indexed ops from ~2*nnz to ~2*n_users. ``"sampled"`` draws nnz
        uniform positives with replacement per epoch (the reference's
        schedule, ``bpr.pyx:265-272``). Both draw negatives from the exact
        popularity distribution. ``"grouped_pool_ids"`` replaces the
        per-entry negative id/bias gathers with contiguous window slices
        of a pre-shuffled epoch-start popularity snapshot (negative
        FACTORS stay live gathers); ``"grouped_pool"`` additionally pools
        the factors. Both pool modes measured SLOWER than ``"grouped"``
        on v5e (0.90x / 0.80x) — the window slices re-read more HBM than
        the gathers they remove; they remain as documented measurement
        points. The mesh path always trains
        ``"sampled"`` (its all-gather update is batch-structured).
        ``None`` follows the module default (``BPR_GROUPED``).
    """

    def __init__(
        self,
        factors=100,
        learning_rate=0.01,
        regularization=0.01,
        dtype=np.float32,
        iterations=100,
        num_threads=0,
        verify_negative_samples=True,
        random_state=None,
        mesh=None,
        epoch_mode=None,
    ):
        super().__init__(num_threads=num_threads)
        self.factors = factors
        self.learning_rate = learning_rate
        self.iterations = iterations
        self.regularization = regularization
        self.dtype = np.dtype(dtype)
        self.verify_negative_samples = verify_negative_samples
        self.random_state = random_state
        self.mesh = mesh
        self.epoch_mode = epoch_mode

    def _resolve_epoch_mode(self):
        if self.epoch_mode is None:
            return BPR_GROUPED
        modes = {"sampled": 0, "grouped": 1, "grouped_pool": 2,
                 "grouped_pool_ids": 3, 0: 0, 1: 1, 2: 2, 3: 3}
        try:
            return modes[self.epoch_mode]
        except KeyError:
            raise ValueError(
                f"epoch_mode must be 'sampled', 'grouped', 'grouped_pool' or"
                f" 'grouped_pool_ids', got {self.epoch_mode!r}"
            ) from None

    def fit(self, user_items, show_progress=True, callback=None):
        """Factorizes the user_items matrix (values treated as binary likes)."""
        rs = check_random_state(self.random_state)

        if user_items.dtype != np.float32:
            user_items = user_items.astype(np.float32)
        user_items = check_csr(user_items)
        users, items = user_items.shape

        if self.verify_negative_samples and not user_items.has_sorted_indices:
            user_items.sort_indices()

        user_counts = np.ediff1d(user_items.indptr)
        userids = np.repeat(np.arange(users, dtype=np.int32), user_counts)

        # factors+1 layout: last column is the item bias, user column pinned 1
        if self.item_factors is None:
            self.item_factors = (
                rs.random((items, self.factors + 1), dtype=np.float32) - 0.5
            ) / self.factors
            item_counts = np.bincount(user_items.indices, minlength=items)
            self.item_factors[item_counts == 0] = np.zeros(self.factors + 1)

        if self.user_factors is None:
            self.user_factors = (
                rs.random((users, self.factors + 1), dtype=np.float32) - 0.5
            ) / self.factors
            self.user_factors[user_counts == 0] = np.zeros(self.factors + 1)
            self.user_factors[:, self.factors] = 1.0
        elif not np.allclose(self.user_factors[:, self.factors], 1.0):
            # the split-bias device layout scores with the user bias column
            # fixed at its pinned value; make that explicit for externally
            # supplied factors instead of silently diverging
            log.warning(
                "BPR pins the user bias column (user_factors[:, factors]) "
                "to 1.0 during training; overwriting supplied values"
            )
            self.user_factors[:, self.factors] = 1.0

        self._user_norms = self._item_norms = None

        samples = len(user_items.data)
        if samples == 0:
            self._check_fit_errors()
            return

        # large minibatches: every scan step pays buffer-update traffic over
        # the full factor matrices, so fewer/bigger steps train much faster;
        # small datasets keep small batches for closer-to-Hogwild dynamics
        batch = int(min(_MAX_BATCH, max(64, 1 << int(np.ceil(np.log2(max(samples // 64, 1)))))))
        steps = max(1, -(-samples // batch))
        max_row = int(user_counts.max()) if len(user_counts) else 1
        bisect_iters = int(np.ceil(np.log2(max(max_row, 2)))) + 1

        # exact O(1) negative verification via the cuckoo pair table; the
        # bisection handles shapes the table can't (see ops/membership.py)
        mh = None
        table = np.zeros((1, 1), dtype=np.uint16)
        if self.verify_negative_samples:
            pt = membership.build_pair_table(user_items, row_ids=userids)
            if pt is not None:
                mh = (pt.a_bits, pt.b_bits, pt.bucket_bits)
                table = pt.table

        mesh = None
        if self.mesh is not None:
            from ..parallel import create_mesh

            mesh = create_mesh(self.mesh) if isinstance(self.mesh, int) else self.mesh

        # device layout: (.., factors) blocks + separate item-bias vector —
        # keeps rows lane-aligned at pow2 factor counts (see _bpr_epoch).
        # Single-device default stacks both sides into one table (see
        # BPR_FUSED_BUFFER); the sharded path keeps the split layout.
        fused = BPR_FUSED_BUFFER and mesh is None
        epoch_mode = self._resolve_epoch_mode()
        grouped = epoch_mode and mesh is None and not fused
        if fused:
            W = jnp.asarray(
                np.concatenate(
                    [self.user_factors[:, : self.factors],
                     self.item_factors[:, : self.factors]], axis=0
                ),
                dtype=jnp.float32,
            )
        else:
            X = jnp.asarray(self.user_factors[:, : self.factors], dtype=jnp.float32)
            Y = jnp.asarray(self.item_factors[:, : self.factors], dtype=jnp.float32)
        yb = jnp.asarray(self.item_factors[:, self.factors], dtype=jnp.float32)
        # packed (user, item) sample flats when the kernel never needs the
        # raw flats (cuckoo verifier or verification off): u+liked ride ONE
        # row gather per step — measured 7% epoch cut (see _bpr_epoch).
        # The bisection fallback and the measurement variants keep the
        # split flats (they index them independently).
        packed = ((mh is not None or not self.verify_negative_samples)
                  and not fused and not grouped
                  and (mesh is not None or not BPR_SORT_SAMPLES))
        dummy = jnp.zeros((1,), dtype=jnp.int32)
        if grouped:
            # the grouped epoch streams positives out of the chunk tensors;
            # only the item flat (negative draws + bisection) and indptr
            # (bisection) upload
            uids = dummy
            iids = jnp.asarray(user_items.indices, dtype=jnp.int32)
            indptr = jnp.asarray(user_items.indptr, dtype=jnp.int32)
        elif packed:
            uids = jnp.asarray(
                np.stack([userids, user_items.indices.astype(np.int32)], axis=1))
            iids = dummy
            indptr = dummy
        else:
            uids = jnp.asarray(userids)
            iids = jnp.asarray(user_items.indices, dtype=jnp.int32)
            indptr = jnp.asarray(user_items.indptr, dtype=jnp.int32)
        table_d = jnp.asarray(table)

        grouped_classes = None
        arrangement = jnp.zeros((1,), dtype=jnp.int32)
        if grouped:
            from ..sparse import BucketedCSR

            # chunks sized like the classic epoch's minibatch (~64k entries)
            # so hot items collide per chunk no more than they collide per
            # classic batch; values binarized so padding (0) is the only
            # invalid marker even when callers store explicit zeros
            bin_ui = user_items.copy()
            bin_ui.data = np.ones(len(bin_ui.data), dtype=np.float32)
            gb = BucketedCSR(bin_ui, target_entries=1 << 16,
                             max_chunk_rows=8192).to_device()
            grouped_classes = tuple(
                (c.rows, c.indices, c.data) for c in gb.classes)
            if epoch_mode in (2, 3):
                # pre-shuffled popularity snapshot ids, wrap-padded by the
                # largest chunk width so windows can start anywhere
                max_l = max(c.indices.shape[2] for c in gb.classes)
                pool = user_items.indices.astype(np.int32)
                cap = int(min(len(pool), 1 << 21))
                pool = rs.permutation(pool)[:cap]
                arrangement = jnp.asarray(
                    np.concatenate([pool, pool[:max_l]]))

        key = jax.random.PRNGKey(int(rs.integers(0, 2**31)))

        log.debug("Running %i BPR training epochs", self.iterations)
        with tqdm(total=self.iterations, disable=not show_progress) as progress:
            for epoch in range(self.iterations):
                s = time.time()
                key, subkey = jax.random.split(key)
                # named step for `jax.profiler.trace` timelines
                with jax.profiler.StepTraceAnnotation("bpr_epoch",
                                                      step_num=epoch):
                    if grouped:
                        X, Y, yb, correct, skipped = _bpr_epoch_grouped(
                            X, Y, yb, grouped_classes, iids, indptr, table_d,
                            arrangement, subkey,
                            jnp.float32(self.learning_rate),
                            jnp.float32(self.regularization),
                            verify_neg=self.verify_negative_samples,
                            bisect_iters=bisect_iters, mh=mh,
                            pool_mode={1: 0, 2: 2, 3: 1}[epoch_mode],
                        )
                    elif mesh is not None:
                        X, Y, yb, correct, skipped = _bpr_epoch_sharded(
                            X, Y, yb, uids, iids, indptr, table_d, subkey,
                            jnp.float32(self.learning_rate), jnp.float32(self.regularization),
                            steps, batch, self.verify_negative_samples, bisect_iters, mh, mesh,
                            packed=packed,
                        )
                    elif fused:
                        W, yb, correct, skipped = _bpr_epoch_fused(
                            W, yb, uids, iids, indptr, table_d, subkey,
                            jnp.float32(self.learning_rate), jnp.float32(self.regularization),
                            steps, batch, self.verify_negative_samples, bisect_iters, mh,
                            users,
                        )
                    else:
                        X, Y, yb, correct, skipped = _bpr_epoch(
                            X, Y, yb, uids, iids, indptr, table_d, subkey,
                            jnp.float32(self.learning_rate), jnp.float32(self.regularization),
                            steps, batch, self.verify_negative_samples, bisect_iters, mh,
                            sort_samples=BPR_SORT_SAMPLES, packed=packed,
                        )
                    correct = int(correct)
                    skipped = int(skipped)
                progress.update(1)
                if grouped:
                    total = samples  # every positive visited exactly once
                elif mesh is not None:
                    # each chip draws ceil(batch/n) samples per step
                    n_dev = mesh.shape["d"]
                    total = steps * (-(-batch // n_dev)) * n_dev
                else:
                    total = steps * batch
                if total != 0 and total != skipped:
                    progress.set_postfix(
                        {
                            "train_auc": f"{100.0 * correct / (total - skipped):0.2f}%",
                            "skipped": f"{100.0 * skipped / total:0.2f}%",
                        }
                    )
                if callback:
                    callback(epoch, time.time() - s, correct, skipped)

        if fused:
            X = W[:users]
            Y = W[users:]

        # reassemble the public factors+1 layout (bias as trailing column,
        # user bias column pinned to 1.0 — reference bpr.pyx layout)
        users_f = np.empty((users, self.factors + 1), dtype=self.dtype)
        users_f[:, : self.factors] = np.array(X)
        users_f[:, self.factors] = self.user_factors[:, self.factors]
        items_f = np.empty((items, self.factors + 1), dtype=self.dtype)
        items_f[:, : self.factors] = np.array(Y)
        items_f[:, self.factors] = np.array(yb)
        self.user_factors = users_f
        self.item_factors = items_f
        self._check_fit_errors()

    def save(self, fileobj_or_path):
        args = {
            "user_factors": self.user_factors,
            "item_factors": self.item_factors,
            "regularization": self.regularization,
            "factors": self.factors,
            "learning_rate": self.learning_rate,
            "verify_negative_samples": self.verify_negative_samples,
            "num_threads": self.num_threads,
            "iterations": self.iterations,
            "dtype": self.dtype.name,
            "random_state": self.random_state,
        }
        args = {k: v for k, v in args.items() if v is not None}
        np.savez(fileobj_or_path, **args)
