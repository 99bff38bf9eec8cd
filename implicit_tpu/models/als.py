"""Implicit-feedback Alternating Least Squares, TPU-native.

Same model and hyperparameters as the reference implementation
(/root/reference/implicit/cpu/als.py:20-577 and implicit/gpu/als.py:14-341):
the Hu/Koren/Volinsky implicit ALS objective with the Takács et al. conjugate
gradient speedup. Instead of per-user scalar solves on OpenMP threads / CUDA
blocks, each half-iteration re-solves whole chunks of users as batched MXU
matmul programs over a :class:`~implicit_tpu.sparse.BucketedCSR` (see
:mod:`implicit_tpu.ops.als`).
"""

import logging
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import scipy
import scipy.sparse
from tqdm.auto import tqdm

from ..ops import als as als_ops
from ..sparse import BucketedCSR, als_chunk_target, pack_pair_on_device
from ..utils import ParameterWarning, check_csr, check_random_state
from .mf_base import MatrixFactorizationBase

log = logging.getLogger("implicit_tpu")


def _drop_stored_zeros(csr):
    """Removes explicitly stored zero entries before bucketing.

    The packed kernels use data==0 as the padding sentinel, so a stored
    zero would silently act as padding; dropping it makes the semantics
    explicit: a zero entry is "unobserved" (P=0, background C=1). The
    reference's scalar loop instead reads a stored zero as a confidence-0
    dislike, subtracting that item's background contribution
    (_als.pyx:115-118) — a corner we intentionally diverge on (documented
    in DESIGN.md); matrices without stored zeros (the normal case, and
    anything run through scipy eliminate_zeros()) are identical.
    """
    if csr.nnz and not csr.data.all():
        csr = csr.copy()
        csr.eliminate_zeros()
    return csr


class AlternatingLeastSquares(MatrixFactorizationBase):
    """Alternating Least Squares.

    A recommendation model based on the algorithms described in
    'Collaborative Filtering for Implicit Feedback Datasets' with performance
    optimizations from 'Applications of the Conjugate Gradient Method for
    Implicit Feedback Collaborative Filtering.'

    Parameters
    ----------
    factors : int, optional
        The number of latent factors to compute
    regularization : float, optional
        The regularization factor to use
    alpha : float, optional
        The weight to give to positive examples
    dtype : data-type, optional
        Storage dtype of the returned factors (compute is float32 on device)
    use_native : bool, optional
        Accepted for API parity; device compute is always used
    use_cg : bool, optional
        Use the faster conjugate-gradient solver (3 steps) instead of batched
        dense Cholesky-style solves
    iterations : int, optional
        The number of ALS iterations to run when fitting
    calculate_training_loss : bool, optional
        Whether to compute the training loss each iteration
    num_threads : int, optional
        Accepted for API parity; parallelism comes from the device mesh
    random_state : int, RandomState, Generator or None, optional
        Seeding for the initial factor matrices
    mesh : jax.sharding.Mesh or int, optional
        Train data-parallel across a device mesh: interaction chunks shard
        over the mesh's row axis, factors stay replicated, XLA inserts the
        ICI collectives. An int builds a 1-D mesh over that many local
        devices; None (default) trains on the single default device.
    grid : {"auto", "pow2", "fine"}, optional
        Row-length bucketing grid for the interaction tensors. "pow2"
        (the "auto" default) groups rows into power-of-two nnz classes:
        ~4x fewer compiled programs, so a first fit on a fresh shape
        compiles several times faster, at ~10-20% per-iteration padding
        cost. "fine" uses the eighth-power-of-two grid (<=1.17x steps,
        under ~7% padding) for the best steady-state s/iter — the right
        choice for production refit loops, where the persistent compile
        cache makes the larger one-time compile free.
    ingest : {"auto", "host", "device"}, optional
        Interaction-upload route (sparse.pack_pair_on_device). "auto"
        host-packs unless the on-device pack programs are already
        compile-warm for this matrix structure — the fastest first fit
        (the device pack's extra compiled programs measured 192s vs 48s
        end-to-end cold fit at last.fm shape). Warmth only comes from a
        prior ingest="device" fit or an explicit
        ``sparse.warm_device_pack`` call — "auto" never compiles the pack
        programs itself. "device" forces the single-COO-upload device
        pack: 2.06x measured ingestion wall at 50M-nnz scale once
        compiled, ~2.7x fewer transport bytes — right for ingestion-bound
        refit pipelines. "host" always packs on the host.
    gather_quant : {False, True, "auto"}, optional
        Solve against an int8 per-row-scaled copy of the fixed-side factor
        table. Factor tables past the VMEM promotion boundary (~100MB:
        360k rows at factors>=192 in bf16, or >=96 in f32) gather at the
        HBM per-index rate, ~5x slower per row than promoted tables; int8
        halves the bytes back under the boundary at a per-element rounding
        cost ~2x bf16's. "auto" enables it per side, only for 16-bit
        compute and only past the boundary. Measured speed/quality:
        benchmarks/round5_int8_gather.py + the bench quality gate.
    """

    def __init__(
        self,
        factors=100,
        regularization=0.01,
        alpha=1.0,
        dtype=np.float32,
        use_native=True,
        use_cg=True,
        iterations=15,
        calculate_training_loss=False,
        num_threads=0,
        random_state=None,
        mesh=None,
        grid="auto",
        ingest="auto",
        gather_quant=False,
    ):
        super().__init__(num_threads=num_threads)

        self.factors = factors
        self.regularization = regularization
        self.alpha = alpha

        self.dtype = np.dtype(dtype)
        self.use_native = use_native
        self.use_cg = use_cg
        self.iterations = iterations
        self.calculate_training_loss = calculate_training_loss
        self.fit_callback = None
        self.cg_steps = 3
        self.random_state = random_state
        self.mesh = mesh
        if grid not in ("auto", "pow2", "fine"):
            raise ValueError(f"grid must be 'auto', 'pow2' or 'fine', got {grid!r}")
        self.grid = grid
        if ingest not in ("auto", "host", "device"):
            raise ValueError(
                f"ingest must be 'auto', 'host' or 'device', got {ingest!r}")
        # ingestion route (see sparse.pack_pair_on_device): "auto" host-packs
        # until the device-pack programs are compile-warm (fast first fit);
        # "device" forces the low-upload-byte on-device pack (2.06x measured
        # ingestion-wall win at MSD scale once compiled)
        self.ingest = ingest
        if gather_quant not in ("auto", True, False):
            raise ValueError(
                f"gather_quant must be 'auto', True or False, got {gather_quant!r}")
        self.gather_quant = gather_quant

        # cached f x f gramians
        self._YtY = None
        self._XtX = None

    def _gather_quant_sides(self, n_users, n_items):
        """Resolve gather_quant to per-side flags (user side, item side).

        The user half-iteration gathers from the ITEM factor table and vice
        versa. "auto" quantizes a side only when (a) the model already opted
        into 16-bit compute and (b) that side's gather table outgrows the
        VMEM promotion boundary — the regime where int8 wins (measured:
        benchmarks/round5_int8_gather.py); f32 models are never silently
        requantized.
        """
        from ..ops import als as als_ops

        if self.gather_quant == "auto":
            if self._compute_dtype != "bfloat16":
                return (False, False)
            lim = als_ops.VMEM_PROMO_BYTES
            return (n_items * self.factors * 2 > lim,
                    n_users * self.factors * 2 > lim)
        b = bool(self.gather_quant)
        return (b, b)

    @property
    def _compute_dtype(self):
        # 16-bit storage dtypes request bf16 solver math (the TPU analogue of
        # the reference GPU's fp16 factor support); float64 solves in double
        # precision when jax x64 is enabled (the reference's fused-type f64
        # mode, /root/reference/implicit/cpu/_als.pyx:19-57); otherwise f32
        itemsize = np.dtype(self.dtype).itemsize
        if itemsize == 2:
            return "bfloat16"
        if np.dtype(self.dtype) == np.float64:
            import jax

            if jax.config.jax_enable_x64:
                return "float64"
            warnings.warn(
                "dtype=float64 requested but jax x64 is disabled; solving in "
                "float32 (enable jax_enable_x64 for double-precision solves)",
                ParameterWarning,
            )
        return "float32"

    def fit(self, user_items, show_progress=True, callback=None):
        """Factorizes the user_items matrix.

        user_items defines both which items each user liked (P_ui) and the
        confidence (C_ui). Unset entries mean P=0, C=1; negative values mean
        "disliked" with confidence |value|.
        """
        random_state = check_random_state(self.random_state)

        solve_dtype = np.float64 if self._compute_dtype == "float64" else np.float32

        Cui = check_csr(user_items)
        if Cui.dtype != solve_dtype:
            Cui = Cui.astype(solve_dtype)
        Cui = _drop_stored_zeros(Cui)

        if self.alpha != 1.0:
            Cui = self.alpha * Cui

        s = time.time()
        Ciu = Cui.T.tocsr()
        log.debug("Calculated transpose in %.3fs", time.time() - s)

        users, items = Cui.shape

        if self.user_factors is None:
            self.user_factors = (
                random_state.random((users, self.factors), dtype=np.float32) * 0.01
            ).astype(self.dtype)
        if self.item_factors is None:
            self.item_factors = (
                random_state.random((items, self.factors), dtype=np.float32) * 0.01
            ).astype(self.dtype)

        self._item_norms = self._user_norms = None
        self._YtY = None
        self._XtX = None
        loss = None

        s = time.time()
        # chunk sizing: one shared policy with bench.py (sparse.als_chunk_target)
        target = als_chunk_target(self.factors, self._compute_dtype)
        grid = "pow2" if self.grid == "auto" else self.grid
        if self.mesh is not None:
            return self._fit_sharded(Cui, Ciu, target, grid, show_progress,
                                     callback or self.fit_callback)
        # one COO upload + on-device packing: the padded class tensors
        # never cross the transport (2-4x fewer upload bytes; the item
        # side's flat arrays are derived on device)
        user_buckets, item_buckets = pack_pair_on_device(
            Cui, Ciu, target_entries=target, max_chunk_rows=65536,
            grid=grid, data_dtype=solve_dtype,
            mode=getattr(self, "ingest", "auto"))
        X = jnp.asarray(self.user_factors, dtype=solve_dtype)
        Y = jnp.asarray(self.item_factors, dtype=solve_dtype)
        log.debug("Bucketed CSR built + uploaded in %.3fs", time.time() - s)

        if not callback:
            callback = self.fit_callback

        use_pallas = None
        compute_dtype = self._compute_dtype
        gq = self._gather_quant_sides(*user_items.shape)

        log.debug("Running %i ALS iterations", self.iterations)
        if callback is None and not self.calculate_training_loss:
            # fast path: the entire fit is one device program (one dispatch)
            with tqdm(total=self.iterations, disable=not show_progress) as progress:
                X, Y = als_ops.fit(
                    X, Y, user_buckets, item_buckets, self.regularization,
                    self.iterations, self.use_cg, self.cg_steps, compute_dtype,
                    use_pallas=use_pallas, gather_quant=gq,
                )
                jax.block_until_ready((X, Y))
                progress.update(self.iterations)
        else:
            # per-iteration dispatch so the callback / loss sees each epoch
            with tqdm(total=self.iterations, disable=not show_progress) as progress:
                for iteration in range(self.iterations):
                    s = time.time()
                    # named step for `jax.profiler.trace` timelines
                    with jax.profiler.StepTraceAnnotation("als_iteration",
                                                          step_num=iteration):
                        X = als_ops.solve_side(
                            X, Y, user_buckets, self.regularization, self.use_cg,
                            self.cg_steps, compute_dtype, use_pallas=use_pallas,
                            gather_quant=gq[0],
                        )
                        Y = als_ops.solve_side(
                            Y, X, item_buckets, self.regularization, self.use_cg,
                            self.cg_steps, compute_dtype, use_pallas=use_pallas,
                            gather_quant=gq[1],
                        )
                        X.block_until_ready()
                    progress.update(1)

                    if self.calculate_training_loss:
                        loss = als_ops.calculate_loss_bucketed(
                            user_buckets, X, Y, self.regularization
                        )
                        progress.set_postfix({"loss": loss})
                        if not show_progress:
                            log.info("loss %.4f", loss)

                    if callback:
                        callback(iteration, time.time() - s, loss)

        # np.array (not asarray): jax.Array views are read-only, but factors
        # must stay mutable for partial_fit_* updates
        self.user_factors = np.array(X, dtype=self.dtype)
        self.item_factors = np.array(Y, dtype=self.dtype)

        if self.calculate_training_loss:
            log.info("Final training loss %.4f", loss)

        self._check_fit_errors()

    def _fit_sharded(self, Cui, Ciu, target, grid, show_progress, callback):
        """Multi-chip fit over the row-sharded layout (parallel.als_sharded).

        Each chip owns a strided slice of both factor matrices; a
        half-iteration is fully local given one tiled all-gather of the
        opposite side per half-iteration, so the Pallas solver kernels run
        unchanged inside the shard_map.
        """
        from ..parallel import create_mesh
        from ..parallel import als_sharded
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = create_mesh(self.mesh) if isinstance(self.mesh, int) else self.mesh
        axis = mesh.axis_names[0]
        D = mesh.shape[axis]

        s = time.time()
        user_buckets = als_sharded.RowShardedBuckets(
            Cui, mesh, axis_name=axis, target_entries=target,
            max_chunk_rows=65536, grid=grid)
        item_buckets = als_sharded.RowShardedBuckets(
            Ciu, mesh, axis_name=axis, target_entries=target,
            max_chunk_rows=65536, grid=grid)
        shd = NamedSharding(mesh, P(axis, None))
        X = jax.device_put(als_sharded.permute_rows(
            np.asarray(self.user_factors, dtype=np.float32), D,
            user_buckets.block), shd)
        Y = jax.device_put(als_sharded.permute_rows(
            np.asarray(self.item_factors, dtype=np.float32), D,
            item_buckets.block), shd)
        log.debug("Row-sharded buckets built + uploaded in %.3fs", time.time() - s)

        # the row-sharded layout solves f32/bf16 (the Pallas kernels' dtypes)
        compute_dtype = self._compute_dtype
        if compute_dtype == "float64":
            compute_dtype = "float32"

        loss = None
        kw = dict(axis_name=axis, use_cg=self.use_cg, cg_steps=self.cg_steps,
                  compute_dtype=compute_dtype,
                  gather_quant=self._gather_quant_sides(*Cui.shape))
        with tqdm(total=self.iterations, disable=not show_progress) as progress:
            if callback is None and not self.calculate_training_loss:
                X, Y = als_sharded.fit(
                    X, Y, user_buckets, item_buckets, mesh,
                    self.regularization, self.iterations, **kw)
                jax.block_until_ready((X, Y))
                progress.update(self.iterations)
            else:
                for iteration in range(self.iterations):
                    s = time.time()
                    X, Y = als_sharded.fit(
                        X, Y, user_buckets, item_buckets, mesh,
                        self.regularization, 1, **kw)
                    jax.block_until_ready((X, Y))
                    progress.update(1)
                    if self.calculate_training_loss:
                        loss = als_sharded.calculate_loss(
                            user_buckets, X, Y, self.regularization, mesh,
                            axis_name=axis)
                        progress.set_postfix({"loss": loss})
                        if not show_progress:
                            log.info("loss %.4f", loss)
                    if callback:
                        callback(iteration, time.time() - s, loss)

        users, items = Cui.shape
        self.user_factors = als_sharded.unpermute_rows(
            X, D, user_buckets.block, users).astype(self.dtype)
        self.item_factors = als_sharded.unpermute_rows(
            Y, D, item_buckets.block, items).astype(self.dtype)

        if self.calculate_training_loss:
            log.info("Final training loss %.4f", loss)
        self._check_fit_errors()

    def _solve_rows(self, row_items, other_factors, gram):
        """Cholesky-solve factors for the rows of ``row_items`` against fixed factors."""
        buckets = BucketedCSR(_drop_stored_zeros(row_items)).to_device()
        rows = row_items.shape[0]
        X = jnp.zeros((rows, self.factors), dtype=jnp.float32)
        Y = jnp.asarray(other_factors, dtype=jnp.float32)
        YtY_reg = jnp.asarray(gram, dtype=jnp.float32) + self.regularization * jnp.eye(
            self.factors, dtype=jnp.float32
        )
        for cls in buckets.classes:
            X = als_ops.cho_solve_scan(X, Y, YtY_reg, cls.rows, cls.indices, cls.data)
        return np.array(X, dtype=self.dtype)

    def recalculate_user(self, userid, user_items):
        """Recalculates factors for a batch of users from their liked items."""
        user_items = check_csr(user_items)
        users = 1 if np.isscalar(userid) else len(userid)
        if user_items.shape[0] != users:
            raise ValueError("user_items should have one row for every item in user")
        if self.alpha != 1.0:
            user_items = self.alpha * user_items

        user_factors = self._solve_rows(user_items, self.item_factors, self.YtY)
        return user_factors[0] if np.isscalar(userid) else user_factors

    def recalculate_item(self, itemid, item_users):
        """Recalculates factors for a batch of items from their liking users."""
        item_users = check_csr(item_users)
        if self.alpha != 1.0:
            item_users = self.alpha * item_users

        item_factors = self._solve_rows(item_users, self.user_factors, self.XtX)
        return item_factors[0] if np.isscalar(itemid) else item_factors

    def partial_fit_users(self, userids, user_items):
        """Incrementally recalculates factors for the given users, growing storage."""
        if len(userids) != user_items.shape[0]:
            raise ValueError("user_items must contain 1 row for every user in userids")

        user_factors = self.recalculate_user(userids, user_items)

        users, factors = self.user_factors.shape
        max_userid = max(userids)
        if max_userid >= users:
            self.user_factors = np.concatenate(
                [self.user_factors, np.zeros((max_userid - users + 1, factors), dtype=self.dtype)]
            )

        self.user_factors[userids] = user_factors
        self._user_norms = None
        self._XtX = None
        self._user_factors_dev = None  # in-place update: refresh device copy
        self._drop_mesh_cache("user")  # ...and the mesh-sharded table

    def partial_fit_items(self, itemids, item_users):
        """Incrementally recalculates factors for the given items, growing storage."""
        if len(itemids) != item_users.shape[0]:
            raise ValueError("item_users must contain 1 row for every user in itemids")

        item_factors = self.recalculate_item(itemids, item_users)

        items, factors = self.item_factors.shape
        max_itemid = max(itemids)
        if max_itemid >= items:
            self.item_factors = np.concatenate(
                [self.item_factors, np.zeros((max_itemid - items + 1, factors), dtype=self.dtype)]
            )

        self.item_factors[itemids] = item_factors
        self._item_norms = None
        self._YtY = None
        self._item_factors_dev = None  # in-place update: refresh device copy
        self._drop_mesh_cache("item")  # ...and the mesh-sharded table

    def explain(self, userid, user_items, itemid, user_weights=None, N=10):
        """Explains why ``itemid`` is recommended to ``userid``.

        Returns (total_score, top N (itemid, contribution) pairs, user_weights)
        where user_weights is the Cholesky factorization of the user's weighted
        normal-equation matrix (section 5 of the Hu et al. paper), reusable for
        repeated calls. The per-liked-item contributions are computed as one
        vectorized gather+matvec over the user's row rather than a scalar heap
        loop.
        """
        user_items = check_csr(user_items)
        if self.alpha != 1.0:
            user_items = self.alpha * user_items

        if user_weights is None:
            A, _ = user_linear_equation(
                self.item_factors, self.YtY, user_items, userid, self.regularization, self.factors
            )
            user_weights = scipy.linalg.cho_factor(A)

        # the smoothed similarity kernel of the Hu et al. paper: each liked
        # item j contributes c_uj * (y_i^T A_u^-1 y_j) to item i's score
        kernel_row = scipy.linalg.cho_solve(user_weights, self.item_factors[itemid])

        row = user_items[userid]
        positive = row.data > 0  # disliked (negative-confidence) items explain nothing
        liked = row.indices[positive]
        contributions = (self.item_factors[liked] @ kernel_row) * row.data[positive]

        total_score = float(contributions.sum())
        best = np.argsort(contributions)[::-1][:N]
        top_contributions = [(int(liked[j]), float(contributions[j])) for j in best]
        return total_score, top_contributions, user_weights

    @property
    def solver(self):
        """Name of the active solver (informational)."""
        return "cg" if self.use_cg else "cholesky"

    @property
    def YtY(self):
        if self._YtY is None:
            # accumulate in f32 even for 16-bit factor storage: fp16-rounded
            # partial sums can break the gram's positive-definiteness and NaN
            # the recalculate/explain Cholesky (the reference GPU computes
            # its gramian fp16-in/f32-acc for the same reason, als.cu:133-142)
            Y = np.asarray(self.item_factors, dtype=np.float32)
            self._YtY = Y.T.dot(Y)
        return self._YtY

    @property
    def XtX(self):
        if self._XtX is None:
            X = np.asarray(self.user_factors, dtype=np.float32)
            self._XtX = X.T.dot(X)
        return self._XtX

    def save(self, fileobj_or_path):
        args = {
            "user_factors": self.user_factors,
            "item_factors": self.item_factors,
            "regularization": self.regularization,
            "factors": self.factors,
            "num_threads": self.num_threads,
            "iterations": self.iterations,
            "use_native": self.use_native,
            "use_cg": self.use_cg,
            "cg_steps": self.cg_steps,
            "calculate_training_loss": self.calculate_training_loss,
            "dtype": self.dtype.name,
            "random_state": self.random_state,
            "alpha": self.alpha,
        }
        args = {k: v for k, v in args.items() if v is not None}
        np.savez(fileobj_or_path, **args)


def _user_row(Cui, u):
    """One CSR row of Cui as (item indices, A-weights |c|-1, b-values c^+).

    Encodes the reference confidence convention (negative c = "disliked":
    weight |c| in A, contribute nothing to b) once, for all host oracles.
    """
    lo, hi = Cui.indptr[u], Cui.indptr[u + 1]
    conf = Cui.data[lo:hi]
    return Cui.indices[lo:hi], np.abs(conf) - 1.0, np.maximum(conf, 0.0)


def user_linear_equation(Y, YtY, Cui, u, regularization, n_factors):
    """Per-user normal equations ``A x = b``, vectorized over the row.

    A = YtY + reg*I + Yu^T diag(|c|-1) Yu, b = (c^+)^T Yu — the numerical
    spec the device solvers (ops.als) are tested against.
    """
    idx, w, bv = _user_row(Cui, u)
    Yu = Y[idx]
    A = YtY + regularization * np.eye(n_factors) + (Yu * w[:, None]).T @ Yu
    b = bv.astype(np.float64) @ Yu
    return A, b


def user_factor(Y, YtY, Cui, u, regularization, n_factors):
    """Solves a single user's factor (host-side reference path)."""
    A, b = user_linear_equation(Y, YtY, Cui, u, regularization, n_factors)
    return np.linalg.solve(A, b)


def item_factor(X, XtX, Cui, u, regularization, n_factors):
    """Solves a single item's factor against its liking users' factors —
    the mirrored solve (reference /root/reference/implicit/cpu/als.py:522)."""
    return user_factor(X, XtX, Cui, u, regularization, n_factors)


def least_squares(Cui, X, Y, regularization, num_threads=0):
    """Pure-numpy row-by-row normal-equation solver (slow oracle)."""
    users, n_factors = X.shape
    YtY = Y.T @ Y
    for u in range(users):
        X[u] = user_factor(Y, YtY, Cui, u, regularization, n_factors)


def least_squares_cg(Cui, X, Y, regularization, num_threads=0, cg_steps=3):
    """Pure-numpy per-row conjugate-gradient solver (slow oracle).

    Same math as the device kernels: warm start from the current row, A
    applied implicitly as ``YtY v + Yu^T diag(|c|-1) (Yu v)``, per-row
    rs < 1e-20 early exit, ``cg_steps`` iterations.
    """
    users, factors = X.shape
    YtY = Y.T @ Y + regularization * np.eye(factors, dtype=Y.dtype)

    for u in range(users):
        idx, w, bv = _user_row(Cui, u)
        Yu = Y[idx]

        def apply_A(v):
            return YtY @ v + ((Yu @ v) * w) @ Yu

        x = X[u].copy()
        r = bv.astype(Y.dtype) @ Yu - apply_A(x)
        p = r.copy()
        rsold = r @ r
        if rsold < 1e-20:
            continue

        for _ in range(cg_steps):
            Ap = apply_A(p)
            alpha = rsold / (p @ Ap)
            x += alpha * p
            r -= alpha * Ap
            rsnew = r @ r
            if rsnew < 1e-20:
                break
            p = r + (rsnew / rsold) * p
            rsold = rsnew

        X[u] = x


calculate_loss = als_ops.calculate_loss
