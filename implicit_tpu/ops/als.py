"""Batched ALS solvers over bucketed CSR chunks.

TPU-native re-design of the reference solvers
(/root/reference/implicit/cpu/_als.pyx:76-248, implicit/gpu/als.cu:24-197).
Where the reference runs one scalar CG/Cholesky solve per user (one OpenMP
thread or CUDA block each), here a whole chunk of C users is solved as one
batched program:

- gather ``Yu = Y[indices]``  -> (C, L, F) block
- gramian correction ``A = YtY + reg*I + Yu^T diag(|c|-1) Yu`` is a batched
  (F,L)x(L,F) matmul -> MXU
- either 3-step conjugate gradient (never forms A; matches
  _als.pyx:_least_squares_cg including per-row early exit at rs < 1e-20) or a
  batched dense solve (the `posv` Cholesky path of _als.pyx:_least_squares).

Confidence conventions follow the reference exactly: negative confidences mean
"disliked" (P=0, C=|c|); padding entries carry c == 0 and are masked so they
contribute nothing. Chunks are consumed with ``lax.scan`` so each (C, L) shape
class compiles exactly one program.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST


@jax.jit
def gramian(Y, reg):
    """YtY + reg*I, float32, full precision."""
    YtY = jnp.dot(Y.T, Y, precision=HIGH, preferred_element_type=jnp.float32)
    return YtY + reg * jnp.eye(Y.shape[1], dtype=YtY.dtype)


def _weights(dat):
    """Split raw confidences into (A-weights, b-values), masking padding.

    w  = |c| - 1 for nonzero entries, 0 for padding  (A correction weights)
    bv = c for c > 0 else 0                          (YtCuPu contributions)
    """
    mask = dat != 0
    w = jnp.where(mask, jnp.abs(dat) - 1.0, 0.0)
    bv = jnp.where(dat > 0, dat, 0.0)
    return w, bv


def _gather_terms(Y, idx, dat):
    Yu = Y[idx]  # (C, L, F) gather
    w, bv = _weights(dat)
    b = jnp.einsum("cl,clf->cf", bv, Yu, precision=HIGH)
    return Yu, w, b


@functools.partial(jax.jit, static_argnames=("cg_steps",), donate_argnums=(0,))
def cg_solve_scan(X, Y, YtY_reg, rows, idx, dat, cg_steps=3):
    """Run batched CG solves for every chunk of one bucket class.

    X : (U, F) factors being solved (donated, updated rows scattered back)
    Y : (I, F) fixed factors of the other side
    YtY_reg : (F, F) gramian of Y plus regularization
    rows/idx/dat : (n, C) / (n, C, L) / (n, C, L) stacked chunks
    """
    n_rows = X.shape[0]

    def Ax(Yu, w, v):
        t = jnp.einsum("clf,cf->cl", Yu, v, precision=HIGH)
        return (
            jnp.dot(v, YtY_reg, precision=HIGH)
            + jnp.einsum("cl,clf->cf", w * t, Yu, precision=HIGH)
        )

    def chunk_step(X, chunk):
        crows, cidx, cdat = chunk
        Yu, w, b = _gather_terms(Y, cidx, cdat)
        x = X[jnp.clip(crows, 0, n_rows - 1)]

        r = b - Ax(Yu, w, x)
        p = r
        rsold = jnp.sum(r * r, axis=1)
        active = rsold >= 1e-20

        def body(carry, _):
            x, r, p, rsold, active = carry
            Ap = Ax(Yu, w, p)
            pAp = jnp.sum(p * Ap, axis=1)
            alpha = jnp.where(active, rsold / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha[:, None] * p
            r = r - alpha[:, None] * Ap
            rsnew = jnp.sum(r * r, axis=1)
            still = active & (rsnew >= 1e-20)
            beta = jnp.where(active, rsnew / jnp.where(active, rsold, 1.0), 0.0)
            p = jnp.where(still[:, None], r + beta[:, None] * p, p)
            rsold = jnp.where(still, rsnew, rsold)
            return (x, r, p, rsold, still), None

        (x, _, _, _, _), _ = jax.lax.scan(
            body, (x, r, p, rsold, active), None, length=cg_steps
        )
        X = X.at[crows].set(x, mode="drop")
        return X, None

    X, _ = jax.lax.scan(chunk_step, X, (rows, idx, dat))
    return X


@functools.partial(jax.jit, donate_argnums=(0,))
def cho_solve_scan(X, Y, YtY_reg, rows, idx, dat):
    """Batched dense-normal-equation solves (the Cholesky/`posv` path)."""

    def chunk_step(X, chunk):
        crows, cidx, cdat = chunk
        Yu, w, b = _gather_terms(Y, cidx, cdat)
        A = YtY_reg[None] + jnp.einsum(
            "clf,clg->cfg", Yu * w[..., None], Yu, precision=HIGH
        )
        x = jnp.linalg.solve(A, b[..., None])[..., 0]
        X = X.at[crows].set(x, mode="drop")
        return X, None

    X, _ = jax.lax.scan(chunk_step, X, (rows, idx, dat))
    return X


def solve_side(X, Y, buckets, reg, use_cg=True, cg_steps=3):
    """One ALS half-iteration: re-solve X given Y over bucketed chunks.

    ``buckets`` must be a DeviceBuckets (sparse.BucketedCSR.to_device()) so
    the interaction tensors are uploaded once per fit, not once per call.
    Mirrors the reference iteration structure (implicit/cpu/als.py:162-177):
    rows with no interactions are zeroed, every other row re-solved.
    """
    from ..sparse import BucketedCSR

    if isinstance(buckets, BucketedCSR):
        buckets = buckets.to_device()
    YtY_reg = gramian(Y, reg)
    for cls in buckets.classes:
        if use_cg:
            X = cg_solve_scan(X, Y, YtY_reg, cls.rows, cls.indices, cls.data,
                              cg_steps=cg_steps)
        else:
            X = cho_solve_scan(X, Y, YtY_reg, cls.rows, cls.indices, cls.data)
    if buckets.empty_rows is not None:
        X = _zero_rows(X, buckets.empty_rows)
    return X


@functools.partial(jax.jit, donate_argnums=(0,))
def _zero_rows(X, rows):
    return X.at[rows].set(0.0)


@jax.jit
def _loss_chunk_terms(X, Y, YtY, rows, idx, dat):
    """Accumulates sum_u r.x and sum |c| over stacked chunks.

    Follows /root/reference/implicit/cpu/_als.pyx:_calculate_loss:259-308:
    per user r = YtY x + sum_i [(-2 c_i^+) + (|c_i|-1)(y_i.x)] y_i, summed as
    r.x, plus the sum of absolute confidences.
    """
    n_rows = X.shape[0]

    def chunk_step(carry, chunk):
        loss_acc, conf_acc = carry
        crows, cidx, cdat = chunk
        valid = crows < n_rows
        x = X[jnp.clip(crows, 0, n_rows - 1)]
        x = jnp.where(valid[:, None], x, 0.0)
        Yu = Y[cidx]
        yx = jnp.einsum("clf,cf->cl", Yu, x, precision=HIGH)
        mask = cdat != 0
        conf = jnp.abs(cdat)
        temp = jnp.where(cdat > 0, -2.0 * cdat, 0.0) + jnp.where(mask, conf - 1.0, 0.0) * yx
        r = jnp.dot(x, YtY, precision=HIGH) + jnp.einsum(
            "cl,clf->cf", temp, Yu, precision=HIGH
        )
        loss_acc = loss_acc + jnp.sum(r * x)
        conf_acc = conf_acc + jnp.sum(jnp.where(mask, conf, 0.0))
        return (loss_acc, conf_acc), None

    (loss, conf), _ = jax.lax.scan(
        chunk_step, (jnp.float32(0.0), jnp.float32(0.0)), (rows, idx, dat)
    )
    return loss, conf


def calculate_loss_bucketed(buckets, X, Y, reg):
    """Confidence-weighted MSE of an ALS model over bucketed chunks of Cui."""
    from ..sparse import BucketedCSR

    if isinstance(buckets, BucketedCSR):
        buckets = buckets.to_device()
    YtY = jnp.dot(Y.T, Y, precision=HIGH, preferred_element_type=jnp.float32)
    loss = 0.0
    total_conf = 0.0
    for cls in buckets.classes:
        l, c = _loss_chunk_terms(X, Y, YtY, cls.rows, cls.indices, cls.data)
        loss += float(l)
        total_conf += float(c)
    loss += total_conf  # the sum-of-confidences term (P_ui^2 * C_ui)
    loss += float(reg) * (float(jnp.sum(X * X)) + float(jnp.sum(Y * Y)))
    users, items = buckets.shape
    return loss / (total_conf + users * items - buckets.nnz)


def calculate_loss(Cui, X, Y, regularization, num_threads=0):
    """API-parity loss entry point taking a scipy CSR + numpy factors."""
    from ..sparse import BucketedCSR

    bucketed = BucketedCSR(Cui)
    return calculate_loss_bucketed(
        bucketed, jnp.asarray(np.asarray(X), dtype=jnp.float32),
        jnp.asarray(np.asarray(Y), dtype=jnp.float32), regularization,
    )
