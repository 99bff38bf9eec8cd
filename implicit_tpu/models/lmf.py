"""Logistic Matrix Factorization, TPU-native.

Same model as the reference (/root/reference/implicit/cpu/lmf.pyx:59-292):
Johnson's 'Logistic Matrix Factorization for Implicit Feedback Data', trained
with per-row AdaGrad, alternating user and item updates each epoch. The factor
layout matches the reference exactly — two extra columns, with
``user[:, -2] == 1`` (so ``item[:, -2]`` acts as the item bias) and
``item[:, -1] == 1`` (so ``user[:, -1]`` acts as the user bias).

The reference's per-thread scalar loops with racing reads become batched
bucketed updates: for each chunk of C users, positives are gathered as a
(C, L, F) block and negatives are drawn popularity-weighted (uniform over the
nnz index array, as the reference's RNGVector does) as a (C, NL, F) block;
gradients and the AdaGrad state update are fully vectorized. Each side's
update within an epoch reads the other side's factors at epoch-start values —
the deterministic analogue of the reference's Hogwild-ish schedule.
"""

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from tqdm.auto import tqdm

from ..sparse import BucketedCSR
from ..utils import check_csr, check_random_state
from .mf_base import MatrixFactorizationBase

log = logging.getLogger("implicit_tpu")


@functools.partial(
    jax.jit, static_argnames=("neg_count", "pin_col"), donate_argnums=(0, 1)
)
def _lmf_class_update(
    X, dss, Y, sample_cols, rows, idx, dat, lengths, keys, lr, reg, neg_prop,
    neg_count, pin_col,
):
    """AdaGrad update of X rows for all chunks of one bucket class.

    X, dss : (U, F) factors and AdaGrad squared-gradient accumulators (donated)
    Y : (I, F) fixed factors of the other side
    sample_cols : (nnz,) int32 — column ids of every interaction; uniform
        sampling over this array draws negatives popularity-weighted
    rows/idx/dat/lengths : stacked (n, C[, L]) chunk tensors
    keys : (n, 2) per-chunk PRNG keys
    neg_count : static padded negative-sample count (min(I, L * neg_prop))
    """
    n_rows = X.shape[0]
    nnz = sample_cols.shape[0]

    def chunk_step(carry, chunk):
        X, dss = carry
        crows, cidx, cdat, clen, ckey = chunk
        safe_rows = jnp.clip(crows, 0, n_rows - 1)
        x = X[safe_rows]
        d = dss[safe_rows]
        Yu = Y[cidx]  # (C, L, F)

        # positive contributions: sum_i c_i y_i - sum_i sigmoid(x.y_i) c_i y_i
        # (padding entries carry c == 0 and vanish from both terms)
        s_pos = jax.nn.sigmoid(jnp.einsum("clf,cf->cl", Yu, x)) * cdat
        pos = jnp.einsum("cl,clf->cf", cdat - s_pos, Yu)

        # negatives: popularity-weighted draws, per-user count len*neg_prop
        nidx = jax.random.randint(ckey, (x.shape[0], neg_count), 0, nnz)
        nitems = sample_cols[nidx]
        Yn = Y[nitems]  # (C, NL, F)
        ncount = jnp.minimum(Y.shape[0], clen * neg_prop)
        nmask = jnp.arange(neg_count, dtype=jnp.int32)[None, :] < ncount[:, None]
        s_neg = jax.nn.sigmoid(jnp.einsum("cnf,cf->cn", Yn, x)) * nmask
        neg = jnp.einsum("cn,cnf->cf", s_neg, Yn)

        deriv = pos - neg - reg * x
        d = d + deriv * deriv
        x = x + (lr / jnp.sqrt(1e-6 + d)) * deriv

        X = X.at[crows].set(x, mode="drop")
        dss = dss.at[crows].set(d, mode="drop")
        return (X, dss), None

    (X, dss), _ = jax.lax.scan(chunk_step, (X, dss), (rows, idx, dat, lengths, keys))
    X = X.at[:, pin_col].set(1.0)
    return X, dss


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

        # chunk sizing: each chunk materializes a (C, L*neg_prop, F) negative
        # block, so bound C*L by a budget of ~128M gathered negative floats;
        # bigger chunks amortize the per-step factor-buffer update traffic
        factor_bytes = 4 * (self.factors + 2)
        target = max(1 << 14, (512 << 20) // (self.neg_prop * factor_bytes))
        if self.mesh is not None:
            from ..parallel import create_mesh, shard_buckets
            from ..parallel.mesh import replicated

            mesh = create_mesh(self.mesh) if isinstance(self.mesh, int) else self.mesh
            user_buckets = shard_buckets(BucketedCSR(user_items, target_entries=target), mesh)
            item_buckets = shard_buckets(BucketedCSR(item_users, target_entries=target), mesh)
            X = replicated(mesh, np.asarray(self.user_factors, dtype=np.float32))
            Y = replicated(mesh, np.asarray(self.item_factors, dtype=np.float32))
            cols_u = replicated(mesh, user_items.indices.astype(np.int32))
            cols_i = replicated(mesh, item_users.indices.astype(np.int32))
        else:
            user_buckets = BucketedCSR(user_items, target_entries=target).to_device()
            item_buckets = BucketedCSR(item_users, target_entries=target).to_device()
            X = jnp.asarray(self.user_factors, dtype=jnp.float32)
            Y = jnp.asarray(self.item_factors, dtype=jnp.float32)
            cols_u = jnp.asarray(user_items.indices, dtype=jnp.int32)
            cols_i = jnp.asarray(item_users.indices, dtype=jnp.int32)
        dssX = jnp.zeros_like(X)
        dssY = jnp.zeros_like(Y)

        key = jax.random.PRNGKey(int(rs.integers(0, 2**31)))
        lr = jnp.float32(self.learning_rate)
        reg = jnp.float32(self.regularization)
        neg_prop = jnp.int32(self.neg_prop)

        log.debug("Running %i LMF training epochs", self.iterations)
        with tqdm(total=self.iterations, disable=not show_progress) as progress:
            for epoch in range(self.iterations):
                s = time.time()
                for cls in user_buckets.classes:
                    key, subkey = jax.random.split(key)
                    keys = jax.random.split(subkey, cls.n_chunks)
                    X, dssX = _lmf_class_update(
                        X, dssX, Y, cols_u,
                        cls.rows, cls.indices, cls.data, cls.lengths, keys,
                        lr, reg, neg_prop,
                        int(min(items, cls.L * self.neg_prop)), -2,
                    )
                for cls in item_buckets.classes:
                    key, subkey = jax.random.split(key)
                    keys = jax.random.split(subkey, cls.n_chunks)
                    Y, dssY = _lmf_class_update(
                        Y, dssY, X, cols_i,
                        cls.rows, cls.indices, cls.data, cls.lengths, keys,
                        lr, reg, neg_prop,
                        int(min(users, cls.L * self.neg_prop)), -1,
                    )
                progress.update(1)
                if callback:
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
