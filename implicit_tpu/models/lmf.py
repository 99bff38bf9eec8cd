"""Logistic Matrix Factorization, TPU-native.

Same model as the reference (/root/reference/implicit/cpu/lmf.pyx:59-292):
Johnson's 'Logistic Matrix Factorization for Implicit Feedback Data', trained
with per-row AdaGrad, alternating user and item updates each epoch. The factor
layout matches the reference exactly — two extra columns, with
``user[:, -2] == 1`` (so ``item[:, -2]`` acts as the item bias) and
``item[:, -1] == 1`` (so ``user[:, -1]`` acts as the user bias).

The reference's per-thread scalar loops with racing reads become batched
bucketed updates: for each chunk of C users, positives are gathered as a
(C, L, F) block; negatives are drawn popularity-weighted (uniform over the
nnz index array, as the reference's RNGVector does) as one shared pool per
8-row group of P = L * neg_prop rows, of which each user consumes its own
first ``len * neg_prop`` entries. Sharing the pool within a group keeps
every user's marginal sampling distribution exactly the paper's popularity
draw while turning the negative term from C*P random row gathers into two
MXU matmuls — scoring ``sigmoid(x @ pool.T)`` and the weighted combine
``scores @ pool``.

Pools are *windows into a pre-shuffled factor snapshot*: the interaction
column array (whose multiset IS the popularity distribution) is shuffled
once per fit on the host, and each half-epoch gathers the fixed factors
through it once (``Ypop = Y[arrangement]``, bfloat16). A group's pool is
then one contiguous ``dynamic_slice`` at a random offset — bulk DMA at
full HBM bandwidth — instead of P random row gathers. This cuts the
per-epoch gather-offset count from ~nnz*neg_prop to ~nnz/8 (measured
3.4x faster epochs at last.fm scale, neg_prop=30: 3.29 -> 0.97 s/epoch):
TPU gathers are issue-rate-bound, so the offset count, not the byte
count, is the cost.
Each window is a contiguous run of the shuffled multiset — an exact
popularity-weighted draw without replacement within the pool. Gradients
and the AdaGrad state update are fully vectorized. Each side's update
within an epoch reads the other side's factors at epoch-start values —
the deterministic analogue of the reference's Hogwild-ish schedule.
"""

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from tqdm.auto import tqdm

from ..sparse import BucketedCSR, pack_pair_on_device
from ..utils import check_csr, check_random_state
from .mf_base import MatrixFactorizationBase

log = logging.getLogger("implicit_tpu")


def _row_update(X, dss, Y, neg_src, span, crows, cidx, cdat, clen, ckey,
                lr, reg, neg_prop, neg_count, window=True):
    """AdaGrad-updated (x, d) for one chunk's rows (shared by both paths).

    X, dss : (U, F) factors and AdaGrad squared-gradient accumulators
    Y : (I, F) fixed factors of the other side
    neg_src : with ``window`` (the fast path), the split pool from
        :func:`_build_pool` — the other side's factors gathered through
        the per-fit popularity shuffle; a window of it is a popularity-
        weighted draw. Otherwise (pools too large for HBM) the raw
        (span,) int32 interaction column array, sampled per entry.
    span : static int — number of valid window start offsets / columns
    crows/cidx/cdat/clen : (C,) / (C, L) chunk tensors
    neg_count : static shared negative-pool size (min(I, L * neg_prop));
        user c consumes the pool's first min(I, clen[c] * neg_prop) rows
    """
    n_rows = X.shape[0]
    safe_rows = jnp.clip(crows, 0, n_rows - 1)
    x = X[safe_rows]
    d = dss[safe_rows]
    Yu = Y[cidx]  # (C, L, F)

    # positive contributions: sum_i c_i y_i - sum_i sigmoid(x.y_i) c_i y_i
    # (padding entries carry c == 0 and vanish from both terms)
    s_pos = jax.nn.sigmoid(jnp.einsum("clf,cf->cl", Yu, x)) * cdat
    pos = jnp.einsum("cl,clf->cf", cdat - s_pos, Yu)

    # negatives: a shared popularity-weighted pool per 8-row group — one
    # contiguous window of the pre-shuffled snapshot per group; each
    # user's prefix of its group's pool is its own unbiased draw, and the
    # scoring/combine runs as batched MXU matmuls. Groups of 8 keep the
    # sampling noise decorrelated across the chunk (one pool for the
    # whole chunk makes every row's noise common-mode, which measurably
    # hurts small problems). bf16 pool entries with f32 accumulation:
    # quantization noise is far below the Monte-Carlo sampling noise;
    # the AdaGrad state and the applied update stay f32.
    C, F = x.shape
    G = -(-C // 8)  # pad to whole 8-row groups (static per class)
    xg = jnp.pad(x, ((0, G * 8 - C), (0, 0))).reshape(G, 8, F)
    ncount = jnp.minimum(Y.shape[0], clen * neg_prop)
    nmask = jnp.arange(neg_count, dtype=jnp.int32)[None, :] < ncount[:, None]
    if window and isinstance(neg_src, tuple):
        # split pool: lane-aligned factor block + the two tail columns.
        # score = f-dot + u0*t0 + u1*t1 covers both sides symmetrically
        # (user rows end [1, b_u], item rows [b_i, 1] — either way the
        # cross terms reduce to b_i + b_u)
        pf, pt0, pt1 = neg_src
        off = jax.random.randint(ckey, (G,), 0, span)
        Yn = jax.vmap(
            lambda o: jax.lax.dynamic_slice(pf, (o, 0), (neg_count, F - 2))
        )(off)  # (G, P, F-2) bf16 — G slice-DMAs, not G*P row gathers
        tn0 = jax.vmap(lambda o: jax.lax.dynamic_slice(pt0, (o,), (neg_count,)))(off)
        tn1 = jax.vmap(lambda o: jax.lax.dynamic_slice(pt1, (o,), (neg_count,)))(off)
        xf = xg[:, :, : F - 2]
        logits = (
            jnp.einsum("gcf,gpf->gcp", xf.astype(jnp.bfloat16), Yn,
                       preferred_element_type=jnp.float32)
            + xg[:, :, F - 2, None] * tn0[:, None, :].astype(jnp.float32)
            + xg[:, :, F - 1, None] * tn1[:, None, :].astype(jnp.float32)
        )
        s_neg = jax.nn.sigmoid(logits).reshape(G * 8, -1)[:C] * nmask
        s_pad = jnp.pad(s_neg, ((0, G * 8 - C), (0, 0))).reshape(G, 8, -1)
        s16 = s_pad.astype(jnp.bfloat16)
        neg_f = jnp.einsum("gcp,gpf->gcf", s16, Yn,
                           preferred_element_type=jnp.float32)
        neg0 = jnp.einsum("gcp,gp->gc", s16, tn0,
                          preferred_element_type=jnp.float32)
        neg1 = jnp.einsum("gcp,gp->gc", s16, tn1,
                          preferred_element_type=jnp.float32)
        neg = jnp.concatenate(
            [neg_f, neg0[..., None], neg1[..., None]], axis=-1
        ).reshape(G * 8, F)[:C]
    else:
        if window:  # glued full-width pool: one window slice
            off = jax.random.randint(ckey, (G,), 0, span)
            Yn = jax.vmap(
                lambda o: jax.lax.dynamic_slice(neg_src, (o, 0), (neg_count, F))
            )(off)  # (G, P, F) bf16 — G slice-DMAs, not G*P row gathers
        else:  # legacy per-entry gathers (pools too large for HBM)
            nidx = jax.random.randint(ckey, (G, neg_count), 0, span)
            Yn = Y[neg_src[nidx]].astype(jnp.bfloat16)
        s_neg = jax.nn.sigmoid(
            jnp.einsum("gcf,gpf->gcp", xg.astype(jnp.bfloat16), Yn,
                       preferred_element_type=jnp.float32)
        ).reshape(G * 8, -1)[:C] * nmask  # (C, P)
        s_pad = jnp.pad(s_neg, ((0, G * 8 - C), (0, 0))).reshape(G, 8, -1)
        neg = jnp.einsum("gcp,gpf->gcf", s_pad.astype(jnp.bfloat16), Yn,
                         preferred_element_type=jnp.float32).reshape(G * 8, F)[:C]

    deriv = pos - neg - reg * x
    d = d + deriv * deriv
    x = x + (lr / jnp.sqrt(1e-6 + d)) * deriv
    return x, d


# epochs between window-pool permutation refreshes: a fixed arrangement
# over a long fit would make every epoch draw windows of the same
# permutation (a potential fixed-permutation artifact); re-permuting on
# device every few epochs costs one O(nnz) sort, no host upload
_POOL_RESHUFFLE_EPOCHS = 4


@functools.partial(jax.jit, static_argnames=("pmax",))
def _reshuffle_arrangement(key, core, pmax):
    """Fresh device-side permutation of the popularity multiset, wrap-padded
    by the largest pool width (the same layout `_arrangement` builds)."""
    p = jax.random.permutation(key, core)
    segments = [p]
    pad = pmax
    while pad > 0:
        take = min(pad, core.shape[0])
        segments.append(p[:take])
        pad -= take
    return jnp.concatenate(segments) if len(segments) > 1 else p


@functools.partial(jax.jit, static_argnames=("split",), donate_argnums=())
def _build_pool(Y, arrangement, split):
    """The other side's factors gathered through the popularity shuffle.

    Two layouts, chosen by :func:`_pool_split`: glued full-width rows when
    the two tail columns ride inside the factor block's lane padding for
    free, else a split layout — the F factor columns as one lane-aligned
    bf16 block plus the tails (bias / pinned one — their roles mirror
    between the user and item sides, so both are carried symmetrically) as
    1-D arrays. A glued factors+2-wide pool would lane-pad 130 -> 256
    columns at f=128 (~9GB at last.fm scale, an HBM OOM) and the split
    block pads to exactly F there; at narrow widths the glued layout is
    both free and faster (the split's tail cross terms cost extra passes
    over the negative score matrix).
    """
    rows = Y[arrangement]
    if not split:
        return rows.astype(jnp.bfloat16)
    return (
        rows[:, :-2].astype(jnp.bfloat16),
        rows[:, -2].astype(jnp.bfloat16),
        rows[:, -1].astype(jnp.bfloat16),
    )


def _pool_split(width):
    """Split the tails out only when they would force an extra lane tile."""
    return -(-width // 128) > -(-(width - 2) // 128)


def _pool_bytes(nnz, pmax, width):
    """HBM footprint of a window pool (width = factors + 2)."""
    if _pool_split(width):
        f_pad = -(-(width - 2) // 128) * 128
        return (nnz + pmax) * (f_pad * 2 + 4)
    return (nnz + pmax) * (-(-width // 128) * 128) * 2


# window pools beyond this fall back to the legacy per-entry gather path
# (a packed flat 1-D layout was tried and compiles pathologically)
_POOL_BYTE_BUDGET = 5 << 30


@functools.partial(
    jax.jit,
    static_argnames=("span", "neg_count", "pin_col", "window"),
    donate_argnums=(0, 1),
)
def _lmf_class_update(
    X, dss, Y, neg_src, span, rows, idx, dat, lengths, keys, lr, reg, neg_prop,
    neg_count, pin_col, window=True,
):
    """AdaGrad update of X rows for all chunks of one bucket class."""

    def chunk_step(carry, chunk):
        X, dss = carry
        crows, cidx, cdat, clen, ckey = chunk
        x, d = _row_update(X, dss, Y, neg_src, span, crows, cidx, cdat, clen,
                           ckey, lr, reg, neg_prop, neg_count, window)
        X = X.at[crows].set(x, mode="drop")
        dss = dss.at[crows].set(d, mode="drop")
        return (X, dss), None

    (X, dss), _ = jax.lax.scan(chunk_step, (X, dss), (rows, idx, dat, lengths, keys))
    X = X.at[:, pin_col].set(1.0)
    return X, dss


@functools.lru_cache(maxsize=None)
def _build_sharded_class_update(mesh, axis_name, span, neg_count, pin_col,
                                window=True, split=False):
    """Compiled multi-chip LMF class update (cached per mesh/class config).

    Explicit shard_map analogue of the single-chip update (the BPR treatment,
    models/bpr.py:_build_sharded_epoch): each chip computes the AdaGrad
    update for its slice of a chunk's rows against its own negative pools,
    then row ids and new values ride one all-gather over ICI — O(C·F) per
    chunk — and every chip applies the identical scatter to its factor
    replica, keeping replicas bit-identical across any mesh size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    S = P(None, axis_name)
    # a split window pool is a (factors, tail0, tail1) tuple, all
    # replicated; glued/legacy paths pass one replicated array
    pool_spec = (P(), P(), P()) if (window and split) else P()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), pool_spec, S, P(None, axis_name, None),
                  P(None, axis_name, None), S, P(None), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def update(X, dss, Y, neg_src, rows, idx, dat, lengths, keys, lr, reg,
               neg_prop):
        dev = jax.lax.axis_index(axis_name)

        def chunk_step(carry, chunk):
            X, dss = carry
            crows, cidx, cdat, clen, ckey = chunk  # this chip's row slice
            ckey = jax.random.fold_in(ckey, dev)  # distinct pools per shard
            x, d = _row_update(X, dss, Y, neg_src, span, crows, cidx, cdat,
                               clen, ckey, lr, reg, neg_prop, neg_count,
                               window)
            all_rows = jax.lax.all_gather(crows, axis_name, tiled=True)
            all_x = jax.lax.all_gather(x, axis_name, tiled=True)
            all_d = jax.lax.all_gather(d, axis_name, tiled=True)
            X = X.at[all_rows].set(all_x, mode="drop")
            dss = dss.at[all_rows].set(all_d, mode="drop")
            return (X, dss), None

        (X, dss), _ = jax.lax.scan(
            chunk_step, (X, dss), (rows, idx, dat, lengths, keys)
        )
        X = X.at[:, pin_col].set(1.0)
        return X, dss

    return update


class LogisticMatrixFactorization(MatrixFactorizationBase):
    """Logistic Matrix Factorization.

    Learns a probabilistic like/not-like factorization per 'Logistic Matrix
    Factorization for Implicit Feedback Data'.

    Parameters
    ----------
    factors : int, optional
        The number of latent factors (two extra bias columns are stored)
    learning_rate : float, optional
    regularization : float, optional
    dtype : data-type, optional
    iterations : int, optional
        The number of training epochs
    neg_prop : int, optional
        Negative samples drawn per observed interaction
    num_threads : int, optional
        API parity; ignored
    random_state : int, RandomState, Generator or None, optional
    mesh : jax.sharding.Mesh or int, optional
        Train across a device mesh: interaction chunks (and their sampled
        negative blocks) shard over the mesh's row axis; each row's AdaGrad
        update touches only that row, so GSPMD partitions the epoch with
        replicated factors. An int builds a 1-D mesh over that many local
        devices.
    """

    def __init__(
        self,
        factors=30,
        learning_rate=1.00,
        regularization=0.6,
        dtype=np.float32,
        iterations=30,
        neg_prop=30,
        num_threads=0,
        random_state=None,
        mesh=None,
        ingest="auto",
    ):
        super().__init__(num_threads=num_threads)
        self.factors = factors
        self.learning_rate = learning_rate
        self.iterations = iterations
        self.regularization = regularization
        self.dtype = np.dtype(dtype)
        self.neg_prop = neg_prop
        self.random_state = random_state
        self.mesh = mesh
        if ingest not in ("auto", "host", "device"):
            raise ValueError(
                f"ingest must be 'auto', 'host' or 'device', got {ingest!r}")
        self.ingest = ingest

    def fit(self, user_items, show_progress=True, callback=None):
        """Factorizes the user_items matrix (values treated as confidences)."""
        rs = check_random_state(self.random_state)

        if user_items.dtype != np.float32:
            user_items = user_items.astype(np.float32)
        user_items = check_csr(user_items)
        users, items = user_items.shape

        item_users = user_items.T.tocsr()
        if not item_users.has_sorted_indices:
            item_users.sort_indices()
        if not user_items.has_sorted_indices:
            user_items.sort_indices()

        user_counts = np.ediff1d(user_items.indptr)
        item_counts = np.bincount(user_items.indices, minlength=items)

        # factors+2 layout, see module docstring (lmf.pyx:149-165)
        if self.item_factors is None:
            self.item_factors = rs.standard_normal(
                size=(items, self.factors + 2), dtype=np.float32
            )
            self.item_factors[:, -1] = 1.0
            self.item_factors[item_counts == 0] = np.zeros(self.factors + 2)

        if self.user_factors is None:
            self.user_factors = rs.standard_normal(
                size=(users, self.factors + 2), dtype=np.float32
            )
            self.user_factors[:, -2] = 1.0
            self.user_factors[user_counts == 0] = np.zeros(self.factors + 2)

        self._user_norms = self._item_norms = None

        if user_items.nnz == 0:
            self._check_fit_errors()
            return

        # chunk sizing: the big live intermediate is the (C, L*neg_prop)
        # negative score matrix (plus its sigmoid), so bound C*L such that
        # ~3 f32 copies of it stay within a 768MB budget; bigger chunks
        # amortize the per-step factor-buffer update traffic
        # max(1, ...): neg_prop=0 trains on positives only (the negative
        # draw count min(n, L*neg_prop) is then 0), it must not divide-by-0
        target = max(1 << 14, (768 << 20) // (max(1, self.neg_prop) * 12))
        if self.mesh is not None:
            from ..parallel import create_mesh, shard_buckets
            from ..parallel.mesh import replicated

            mesh = create_mesh(self.mesh) if isinstance(self.mesh, int) else self.mesh
            user_buckets = shard_buckets(BucketedCSR(user_items, target_entries=target, grid="pow2"), mesh)
            item_buckets = shard_buckets(BucketedCSR(item_users, target_entries=target, grid="pow2"), mesh)
            X = replicated(mesh, np.asarray(self.user_factors, dtype=np.float32))
            Y = replicated(mesh, np.asarray(self.item_factors, dtype=np.float32))
        else:
            # one COO upload + on-device packing (see sparse.pack_pair_on_device)
            user_buckets, item_buckets = pack_pair_on_device(
                user_items, item_users, target_entries=target, grid="pow2",
                mode=getattr(self, "ingest", "auto"))
            X = jnp.asarray(self.user_factors, dtype=jnp.float32)
            Y = jnp.asarray(self.item_factors, dtype=jnp.float32)
        dssX = jnp.zeros_like(X)
        dssY = jnp.zeros_like(Y)

        # popularity shuffles for the window pools (see module docstring):
        # the interaction column multiset, shuffled once per fit, wrap-padded
        # by the largest pool so every offset in [0, nnz) has a full window
        span = user_items.nnz
        pmax_u = max(
            (int(min(items, cls.indices.shape[2] * self.neg_prop))
             for cls in user_buckets.classes), default=1,
        )
        pmax_i = max(
            (int(min(users, cls.indices.shape[2] * self.neg_prop))
             for cls in item_buckets.classes), default=1,
        )

        width = self.factors + 2
        split = _pool_split(width)
        window_u = _pool_bytes(span, pmax_u, width) <= _POOL_BYTE_BUDGET
        window_i = _pool_bytes(span, pmax_i, width) <= _POOL_BYTE_BUDGET

        def _wrap_pad(arr, pmax):
            reps = [arr]
            pad = pmax
            while pad > 0:  # wrap-pad (loops only for pools wider than nnz)
                reps.append(arr[:pad])
                pad -= len(reps[-1])
            return np.concatenate(reps) if len(reps) > 1 else arr

        def _arrangement(cols, pmax, window):
            if not window:  # legacy path samples the raw column array
                return cols.astype(np.int32)
            arr = cols.astype(np.int32)  # astype always returns a fresh copy
            rs.shuffle(arr)
            return _wrap_pad(arr, pmax)

        core_u = core_i = None
        arr_u_host = _arrangement(user_items.indices, pmax_u, window_u)
        arr_i_host = _arrangement(item_users.indices, pmax_i, window_i)
        if self.mesh is not None:
            # host copies of the unpadded cores for the periodic re-shuffle
            if window_u:
                core_u = arr_u_host[:span].copy()
            if window_i:
                core_i = arr_i_host[:span].copy()
            arr_u = replicated(mesh, arr_u_host)
            arr_i = replicated(mesh, arr_i_host)
        else:
            arr_u = jnp.asarray(arr_u_host)
            arr_i = jnp.asarray(arr_i_host)
        del arr_u_host, arr_i_host

        key = jax.random.PRNGKey(int(rs.integers(0, 2**31)))
        lr = jnp.float32(self.learning_rate)
        reg = jnp.float32(self.regularization)
        neg_prop = jnp.int32(self.neg_prop)

        if self.mesh is not None:
            def class_update(X, dss, Y, pool, cls, keys, neg_count, pin_col, window):
                update = _build_sharded_class_update(mesh, "d", span, neg_count,
                                                     pin_col, window, split)
                return update(X, dss, Y, pool, cls.rows, cls.indices, cls.data,
                              cls.lengths, keys, lr, reg, neg_prop)
        else:
            def class_update(X, dss, Y, pool, cls, keys, neg_count, pin_col, window):
                return _lmf_class_update(X, dss, Y, pool, span, cls.rows,
                                         cls.indices, cls.data, cls.lengths,
                                         keys, lr, reg, neg_prop, neg_count,
                                         pin_col, window)

        log.debug("Running %i LMF training epochs", self.iterations)
        with tqdm(total=self.iterations, disable=not show_progress) as progress:
            for epoch in range(self.iterations):
                s = time.time()
                # periodic pool re-shuffle: avoid a fixed-permutation
                # artifact over long fits (windows otherwise draw from the
                # same arrangement every epoch)
                if (window_u or window_i) and epoch and \
                        epoch % _POOL_RESHUFFLE_EPOCHS == 0:
                    if self.mesh is not None:
                        if window_u:
                            rs.shuffle(core_u)
                            arr_u = replicated(mesh, _wrap_pad(core_u, pmax_u))
                        if window_i:
                            rs.shuffle(core_i)
                            arr_i = replicated(mesh, _wrap_pad(core_i, pmax_i))
                    else:
                        key, key_u, key_i = jax.random.split(key, 3)
                        if window_u:
                            arr_u = _reshuffle_arrangement(key_u, arr_u[:span], pmax_u)
                        if window_i:
                            arr_i = _reshuffle_arrangement(key_i, arr_i[:span], pmax_i)
                # named step for `jax.profiler.trace` timelines
                with jax.profiler.StepTraceAnnotation("lmf_epoch",
                                                      step_num=epoch):
                    # pools snapshot the fixed side's factors per half-epoch
                    pool_u = _build_pool(Y, arr_u, split) if window_u else arr_u
                    for cls in user_buckets.classes:
                        key, subkey = jax.random.split(key)
                        keys = jax.random.split(subkey, cls.n_chunks)
                        X, dssX = class_update(
                            X, dssX, Y, pool_u, cls, keys,
                            int(min(items, cls.L * self.neg_prop)), -2, window_u,
                        )
                    del pool_u
                    pool_i = _build_pool(X, arr_i, split) if window_i else arr_i
                    for cls in item_buckets.classes:
                        key, subkey = jax.random.split(key)
                        keys = jax.random.split(subkey, cls.n_chunks)
                        Y, dssY = class_update(
                            Y, dssY, X, pool_i, cls, keys,
                            int(min(users, cls.L * self.neg_prop)), -1, window_i,
                        )
                    del pool_i
                progress.update(1)
                if callback:
                    # force completion first: dispatches are async, and the
                    # callback contract reports wall-clock epoch time (a
                    # host scalar fetch is the reliable sync over remote
                    # transports; block_until_ready alone is not)
                    float(jnp.sum(X)) + float(jnp.sum(Y))
                    callback(epoch, time.time() - s)

        self.user_factors = np.array(X, dtype=self.dtype)
        self.item_factors = np.array(Y, dtype=self.dtype)
        self._check_fit_errors()

    def save(self, fileobj_or_path):
        args = {
            "user_factors": self.user_factors,
            "item_factors": self.item_factors,
            "regularization": self.regularization,
            "factors": self.factors,
            "learning_rate": self.learning_rate,
            "neg_prop": self.neg_prop,
            "num_threads": self.num_threads,
            "iterations": self.iterations,
            "dtype": self.dtype.name,
            "random_state": self.random_state,
        }
        args = {k: v for k, v in args.items() if v is not None}
        np.savez(fileobj_or_path, **args)
