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
contribute nothing.

Dispatch structure: the single TPU chip here sits behind a network transport
with ~30ms per call round-trip, so :func:`fit` enqueues every half-iteration
without host synchronization — the round-trip is paid once per fit. (A fully
fused whole-fit ``lax.scan`` was measured slower: XLA's while-loop buffer
handling forces extra copies.) Per-class entry points are kept for
incremental solves and the sharded multi-chip path.

``compute_dtype`` selects the precision of the gathered factor blocks:
float32 (default, matches the reference CPU solver) or bfloat16 (halves HBM
traffic on the bandwidth-bound matvecs with float32 accumulation — the TPU
analogue of the reference GPU's fp16 factor support,
implicit/gpu/_cuda.pyx:167-177).
"""

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("implicit_tpu")

HIGH = jax.lax.Precision.HIGHEST


@jax.jit
def gramian(Y, reg):
    """YtY + reg*I in the solve precision: f32, or f64 under jax x64."""
    dt = jnp.float64 if Y.dtype == jnp.float64 else jnp.float32
    Y = Y.astype(dt)
    YtY = jnp.dot(Y.T, Y, precision=HIGH, preferred_element_type=dt)
    return YtY + reg * jnp.eye(Y.shape[1], dtype=dt)


# NOTE on gather speed (measured, v5e behind axon): row-gathers slow from
# ~2ns/row to ~10.7ns/row when the source table exceeds ~100MB (f32 user
# factors at 360k rows). ROOT CAUSE (round 5, device-trace + controlled
# probe): XLA's memory-space assignment keeps gather sources it can fit
# resident in alternate memory — the HLO shows S(1) on tables that fit and
# plain HBM placement past ~128MB (v5e VMEM) — and the promoted gather runs
# ~5x faster per row. Controlled boundary sweep at fixed nnz/L-structure
# (benchmarks/round5_vmem_promo.py, F=256 bf16 item side): 76.8MB table
# 0.163 s/half-iter, 128MB 0.312, 184MB 0.315. Splitting the table into
# sub-cliff parts plus a select-chain, half-width dual gathers, index
# clamping, and locality re-orderings were all measured SLOWER than the
# single big gather — two live parts can't both promote, so every split
# pays the HBM rate twice. The one lever that moves a too-big table back
# under the boundary is shrinking its bytes: see _quantize_table (int8
# rows + per-row scales, gather_quant=).
# Packed-gather variant (ALS_PACKED_GATHER=1, measured dead end): bitcast-
# packing bf16 factor pairs into f32 lanes gathers ~1.5x faster at F=128 in
# isolation (half the lanes, same bytes), but END-TO-END the half-iteration
# is 2.7x SLOWER (0.621 vs 0.227 s/iter at last.fm f=128; 0.780 vs 0.452 at
# f=192): the gathered block feeds the Pallas kernels, so the unpack can't
# fuse — XLA materializes the (C, L, F) bf16 block through a 64-f32-lane ->
# 128-bf16-lane relayout shuffle that costs more than the gather saves. In
# the microbench the bitcast fused straight into the consuming reduction.
def _packed_gather_enabled():
    import os

    return os.environ.get("ALS_PACKED_GATHER", "0") == "1"


def _pack_table(Y):
    """(N, F) bfloat16 -> (N, F//2) float32 with adjacent-pair packing."""
    n, f = Y.shape
    return jax.lax.bitcast_convert_type(Y.reshape(n, f // 2, 2), jnp.float32)


def _gather_rows(Yc, idx, factors=None):
    if isinstance(Yc, tuple):
        # int8-quantized gather table (see _quantize_table): one int8 row
        # gather + one scalar scale gather, dequantized in the epilogue.
        q, s = Yc
        return q[idx].astype(s.dtype) * s[idx][..., None]
    g = Yc[idx]
    if factors is not None and Yc.shape[-1] != factors:
        # packed table: reinterpret the f32 pairs as the original bf16 lanes
        g = jax.lax.bitcast_convert_type(g, jnp.bfloat16)
        g = g.reshape(*g.shape[:-2], factors)
    return g


# The measured alternate-memory (VMEM) promotion boundary for gather tables
# on v5e: an 88MB table gets S(1) placement and gathers at ~2.6 ns/row, a
# 176MB one stays in HBM at ~12.7 ns/row (trace evidence in
# benchmarks/round5_f256_trace.py / round5_vmem_promo.py; v5e VMEM is 128MiB
# and XLA needs headroom for the program's working set). Used by the model
# layer's gather_quant="auto" policy.
VMEM_PROMO_BYTES = 100 * (1 << 20)


def _quantize_table(Y, compute_dtype):
    """(N, F) factors -> (int8 rows, per-row scales) for the gather table.

    Symmetric per-row quantization: scale = max|row|/127. Halves the gather
    table vs bfloat16, which matters at exactly one boundary: XLA's
    memory-space assignment keeps gather sources it can fit resident in
    alternate memory (VMEM) — the F=256 device trace shows S(1) on the
    88MB bf16 table at F=128 and plain HBM on the 176MB one at F=256, and
    the per-gathered-row cost jumps ~2.6 -> ~12.7 ns across that line
    (benchmarks/round5_vmem_promo.py). int8 puts a 360k x 256 table back
    under the boundary. The scales table (2B/row) promotes trivially.

    The solve math sees dequantized rows everywhere the bf16 path sees
    rounded rows (same contract: the gramian stays full-precision, the
    sparse terms use the quantized block), so this is a precision knob on
    exactly the tensor the bf16 mode already rounds.
    """
    Yf = Y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(Yf), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(Yf / scale[:, None]), -127, 127).astype(jnp.int8)
    sd = jnp.bfloat16 if jnp.dtype(compute_dtype).itemsize == 2 else jnp.float32
    return q, scale.astype(sd)


def _weights(dat):
    """Split raw confidences into (A-weights, b-values), masking padding.

    w  = |c| - 1 for nonzero entries, 0 for padding  (A correction weights)
    bv = c for c > 0 else 0                          (YtCuPu contributions)
    """
    mask = dat != 0
    w = jnp.where(mask, jnp.abs(dat) - 1.0, 0.0)
    bv = jnp.where(dat > 0, dat, 0.0)
    return w, bv


def _masked_cg(x, r, Ax, cg_steps):
    """``cg_steps`` masked conjugate-gradient iterations from residual ``r``.

    Matches the reference per-user CG (implicit/cpu/_als.pyx:154-248): rows
    whose squared residual drops below 1e-20 freeze (early exit), everything
    else advances in lockstep. ``Ax`` applies the row's normal matrix.
    """
    p = r
    rsold = jnp.sum(r * r, axis=1)
    active = rsold >= 1e-20

    def body(carry, _):
        x, r, p, rsold, active = carry
        Ap = Ax(p)
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
    return x


# Class solves emit per-chunk solutions as scan OUTPUTS and scatter once per
# class (flag=1, default) instead of carrying X through a per-chunk
# .at[].set. Row sets are disjoint across chunks and classes and warm starts
# read each row's own pre-iteration value, so the math is identical — but
# the carried form makes chunk i+1's gather wait on chunk i's scatter, while
# the output form leaves every chunk's gather+solve independent for XLA to
# pipeline. 0 restores the carried form (measurement toggle; clear the jit
# cache when flipping at runtime). Measured on v5e (round5_f256_probe.py,
# last.fm shape, bf16): identical at both widths (F=128: 0.2271 vs 0.2272
# s/iter; F=256: 0.4507 vs 0.4491) — XLA already overlaps the carried
# form's chunk scatters with the next chunk's gather, so the false
# dependency costs nothing in practice. Kept off (carried) as the
# simpler/lower-peak-memory form; the toggle remains a measurement point.
ALS_END_SCATTER = 0


def _scan_class(X, chunks, solve_chunk):
    """Shared scan driver for class solves; ``chunks = (rows, idx, dat)``."""
    if ALS_END_SCATTER:
        _, xs = jax.lax.scan(lambda c, chunk: (None, solve_chunk(X, chunk)),
                             None, chunks)
        return X.at[chunks[0].reshape(-1)].set(
            xs.reshape(-1, X.shape[1]), mode="drop")

    def chunk_step(X, chunk):
        return X.at[chunk[0]].set(solve_chunk(X, chunk), mode="drop"), None

    X, _ = jax.lax.scan(chunk_step, X, chunks)
    return X


def _cg_class(X, Yparts, YtY_reg, rows, idx, dat, cg_steps, use_pallas=False):
    """Batched CG solves for every chunk of one bucket class (traceable).

    X : (U, F) float32 factors being solved; updated rows scattered back
    Yparts : (I, F) fixed factors of the other side, compute dtype
    YtY_reg : (F, F) float32 gramian of Y plus regularization
    rows/idx/dat : (n, C) / (n, C, L) / (n, C, L) stacked chunks
    use_pallas : fuse the sparse matvec passes with the Pallas kernel (TPU)
    """
    from . import pallas_ops

    n_rows = X.shape[0]
    n_fac = X.shape[1]

    if use_pallas:
        sparse_term = pallas_ops.weighted_matvec
    else:
        sparse_term = pallas_ops.weighted_matvec_reference

    def solve_chunk(X, chunk):
        crows, cidx, cdat = chunk
        if use_pallas and isinstance(Yparts, tuple):
            Yu, S = _gather_q(Yparts, cidx)
            term = lambda *a: sparse_term(*a, scales=S)  # noqa: E731
        else:
            Yu = _gather_rows(Yparts, cidx, n_fac)  # (C, L, F), compute dtype
            term = sparse_term
        w, bv = _weights(cdat)
        x = X[jnp.clip(crows, 0, n_rows - 1)]

        # r = b - A x in one fused pass over Yu (+ the dense YtY term)
        r = term(Yu, w, bv, x, 1.0, -1.0) - jnp.dot(x, YtY_reg, precision=HIGH)
        return _masked_cg(
            x,
            r,
            lambda v: term(Yu, w, bv, v, 0.0, 1.0)
            + jnp.dot(v, YtY_reg, precision=HIGH),
            cg_steps,
        )

    return _scan_class(X, (rows, idx, dat), solve_chunk)


def _cho_class(X, Yparts, YtY_reg, rows, idx, dat, spd=False):
    """Batched dense-normal-equation solves (the Cholesky/`posv` path).

    ``spd=True`` uses batched Cholesky (~2.4x faster on TPU) and is safe when
    A is guaranteed well-conditioned (long rows, nonzero regularization);
    the default LU tolerates the rank-deficient A of tiny/unregularized
    problems the way the reference's LAPACK fallback effectively does.
    """

    n_fac = X.shape[1]

    def solve_chunk(X, chunk):
        crows, cidx, cdat = chunk
        Yu = _gather_rows(Yparts, cidx, n_fac)
        w, bv = _weights(cdat)
        acc_dt = jnp.float64 if Yu.dtype == jnp.float64 else jnp.float32
        b = jnp.einsum("cl,clf->cf", bv.astype(Yu.dtype), Yu,
                       preferred_element_type=acc_dt, precision=HIGH)
        A = YtY_reg[None] + jnp.einsum(
            "clf,clg->cfg", (Yu * w[..., None].astype(Yu.dtype)), Yu,
            preferred_element_type=acc_dt, precision=HIGH,
        )
        if spd:
            return jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(A), True), b[..., None]
            )[..., 0]
        return jnp.linalg.solve(A, b[..., None])[..., 0]

    return _scan_class(X, (rows, idx, dat), solve_chunk)


def _full_cg_max_l(compute_dtype, factors=128):
    """Longest row the tile-resident CG kernel can keep VMEM-resident.

    Rows longer than this solve via the fused gramian-CG path: their gathered
    block can't stay on-chip through the whole solve. The kernel's scoped
    footprint scales with BC_min * L * F_pad (double-buffered input plus two
    f32 tile temporaries), so the limit shrinks inversely with the
    lane-padded factor width (16MB scoped VMEM per core).
    """
    f_pad = -(-int(factors) // 128) * 128
    base = 1024 if jnp.dtype(compute_dtype).itemsize == 2 else 512
    return max(8, base * 128 // f_pad)


def _gather_q(Yparts, idx):
    """Quant gathers stay epilogue-free: the int8 block and the scale block
    gather separately (both sources sit under the VMEM promotion boundary)
    and the dequant happens inside the consuming Pallas kernel — the
    composed XLA dequant materializes a 1B->2B relayout of the gathered
    block that was measured to cost more than the promotion win
    (benchmarks/round5_int8_gather.py, +0.25-0.35 s/iter at every width)."""
    q, s = Yparts
    return q[idx], s[idx]


def _cg_full_class(X, Yparts, YtY_reg, rows, idx, dat, cg_steps):
    """Tile-resident CG for one class: Yu is read from HBM exactly once."""
    from . import pallas_ops

    n_rows = X.shape[0]

    def solve_chunk(X, chunk):
        crows, cidx, cdat = chunk
        x0 = X[jnp.clip(crows, 0, n_rows - 1)]
        if isinstance(Yparts, tuple):
            Yu, S = _gather_q(Yparts, cidx)
            return pallas_ops.cg_solve_full(Yu, cdat, x0, YtY_reg, cg_steps,
                                            scales=S)
        Yu = _gather_rows(Yparts, cidx, X.shape[1])
        return pallas_ops.cg_solve_full(Yu, cdat, x0, YtY_reg, cg_steps)

    return _scan_class(X, (rows, idx, dat), solve_chunk)


def _long_row_class(X, Yparts, YtY_reg, rows, idx, dat, cg_steps):
    """Long-row class solve: fused gramian build + in-VMEM CG (one HBM pass).

    Rows past the tile-resident CG limit solve against their explicit normal
    matrix — the F x F-per-row MXU build amortizes over L >> F, and the
    masked CG runs on the VMEM-resident matrices inside the same kernel.
    (XLA's batched Cholesky was ~10^5 solves/s and the composed einsum build
    tripled HBM traffic; together they dominated the f32 half-iteration on
    power-law item catalogs.)
    """
    from . import pallas_ops

    n_rows = X.shape[0]

    def solve_chunk(X, chunk):
        crows, cidx, cdat = chunk
        x0 = X[jnp.clip(crows, 0, n_rows - 1)]
        if isinstance(Yparts, tuple):
            Yu, S = _gather_q(Yparts, cidx)
            return pallas_ops.gramian_cg_solve(Yu, cdat, x0, YtY_reg, cg_steps,
                                               scales=S)
        Yu = _gather_rows(Yparts, cidx, X.shape[1])
        return pallas_ops.gramian_cg_solve(Yu, cdat, x0, YtY_reg, cg_steps)

    return _scan_class(X, (rows, idx, dat), solve_chunk)


def _solve_side_impl(X, Y, reg, classes, empty_rows, use_cg, cg_steps, compute_dtype,
                     use_pallas, packed_gather=False, gather_quant=False):
    YtY_reg = gramian(Y, reg)
    Yparts = Y.astype(compute_dtype)
    factors = X.shape[1]
    if gather_quant:
        Yparts = _quantize_table(Y, compute_dtype)
    elif packed_gather and Yparts.dtype == jnp.bfloat16 and factors % 2 == 0:
        # half-lane packed gather table (see the gather-speed NOTE above);
        # _gather_rows reinterprets each gathered block back to bf16
        Yparts = _pack_table(Yparts)
    return _solve_side_core(X, Yparts, YtY_reg, classes, empty_rows, use_cg,
                            cg_steps, compute_dtype, use_pallas)


def _solve_side_core(X, Yparts, YtY_reg, classes, empty_rows, use_cg, cg_steps,
                     compute_dtype, use_pallas):
    """Half-iteration solve with the gather table and gramian precomputed.

    Lets multi-chip callers supply a psum-reduced gramian and a gather
    table all-gathered directly in the compute dtype (half the ICI bytes
    for 16-bit modes) instead of re-deriving both from a full-precision
    gathered copy.
    """
    from . import pallas_ops

    factors = X.shape[1]
    max_l = _full_cg_max_l(compute_dtype, factors)
    itemsize = jnp.dtype(compute_dtype).itemsize
    for crows, cidx, cdat in classes:
        L = cidx.shape[2]
        if use_cg:
            if use_pallas and L <= max_l:
                X = _cg_full_class(X, Yparts, YtY_reg, crows, cidx, cdat, cg_steps)
            elif use_pallas and pallas_ops.gramian_tile_l(L, factors, itemsize):
                X = _long_row_class(X, Yparts, YtY_reg, crows, cidx, cdat, cg_steps)
            else:
                X = _cg_class(X, Yparts, YtY_reg, crows, cidx, cdat, cg_steps, False)
        else:
            X = _cho_class(X, Yparts, YtY_reg, crows, cidx, cdat)
    if empty_rows is not None:
        # drop: the row-sharded layout pads per-chip empty-row tables with an
        # out-of-local-range sentinel
        X = X.at[empty_rows].set(0.0, mode="drop")
    return X


@functools.partial(
    jax.jit,
    static_argnames=("use_cg", "cg_steps", "compute_dtype", "use_pallas",
                     "packed_gather", "gather_quant"),
    donate_argnums=(0,),
)
def _solve_side_jit(X, Y, reg, classes, empty_rows, use_cg, cg_steps, compute_dtype,
                    use_pallas, packed_gather=False, gather_quant=False):
    return _solve_side_impl(X, Y, reg, classes, empty_rows, use_cg, cg_steps,
                            compute_dtype, use_pallas, packed_gather, gather_quant)


def _class_tuples(buckets):
    return tuple((c.rows, c.indices, c.data) for c in buckets.classes)


def _on_tpu(X):
    try:
        return next(iter(X.devices())).platform in ("tpu", "axon")
    except Exception:
        return False


# On TPU the tile-resident CG kernel + single-pass Cholesky for long rows is
# the fastest verified configuration (0.37 s/iter at last.fm-360k/f=128/bf16
# vs 0.55 for the einsum formulation); off-TPU the einsum path is used.
PALLAS_IN_FIT = True


def solve_side(X, Y, buckets, reg, use_cg=True, cg_steps=3, compute_dtype=jnp.float32,
               use_pallas=None, gather_quant=False):
    """One ALS half-iteration: re-solve X given Y over bucketed chunks.

    ``buckets`` should be a DeviceBuckets (sparse.BucketedCSR.to_device()) so
    the interaction tensors are uploaded once per fit, not once per call.
    Mirrors the reference iteration structure (implicit/cpu/als.py:162-177):
    rows with no interactions are zeroed, every other row re-solved.

    ``gather_quant=True`` gathers from an int8 per-row-scaled copy of ``Y``
    (see _quantize_table): a precision/speed knob for wide factor tables
    that outgrow the VMEM promotion boundary.

    NOTE: ``X`` is DONATED — its device buffer is consumed into the result
    (zero-copy iteration); using the passed-in array afterwards raises
    "Array has been deleted". Pass ``X + 0.0`` to keep a live copy.
    """
    from ..sparse import BucketedCSR

    if isinstance(buckets, BucketedCSR):
        buckets = buckets.to_device()
    if jnp.dtype(compute_dtype) == jnp.float64:
        use_pallas = False  # the Pallas kernels are f32/bf16-only
    elif use_pallas is None:
        use_pallas = PALLAS_IN_FIT and _on_tpu(X)
    return _solve_side_jit(
        X, Y, jnp.float32(reg), _class_tuples(buckets), buckets.empty_rows,
        use_cg, cg_steps, jnp.dtype(compute_dtype).name, use_pallas,
        _packed_gather_enabled(), gather_quant,
    )


def fit(X, Y, user_buckets, item_buckets, reg, iterations, use_cg=True, cg_steps=3,
        compute_dtype=jnp.float32, use_pallas=None, gather_quant=False):
    """Runs ``iterations`` full ALS iterations (two async dispatches each).

    Dispatches are enqueued without host synchronization, so the transport
    round-trip is paid once per fit, not per iteration.

    ``gather_quant`` may be a bool (both half-iterations) or a
    ``(user_side, item_side)`` pair: the user side gathers from the ITEM
    table, the item side from the USER table, and only a table past the
    VMEM promotion boundary benefits from int8 (see _quantize_table).

    NOTE: ``X`` and ``Y`` are DONATED into the iteration chain; the passed
    arrays are invalid afterwards (pass ``X + 0.0`` to keep a live copy).
    """
    if jnp.dtype(compute_dtype) == jnp.float64:
        use_pallas = False  # the Pallas kernels are f32/bf16-only
    elif use_pallas is None:
        use_pallas = PALLAS_IN_FIT and _on_tpu(X)
    reg = jnp.float32(reg)
    cdt = jnp.dtype(compute_dtype).name
    uc, ue = _class_tuples(user_buckets), user_buckets.empty_rows
    ic, ie = _class_tuples(item_buckets), item_buckets.empty_rows
    if not isinstance(gather_quant, (tuple, list)):
        gather_quant = (gather_quant, gather_quant)
    gq_user, gq_item = (bool(g) for g in gather_quant)

    # cold-fit wall mitigation: the user-side and item-side programs are
    # independent, and XLA compilation releases the GIL (a C++ call, or an
    # RPC to the remote compile service), so compile them concurrently via
    # the AOT API before entering the loop — halves time-to-first-iteration
    # on a fresh shape; a cache hit makes both lower+compile calls cheap
    statics = dict(use_cg=use_cg, cg_steps=cg_steps, compute_dtype=cdt,
                   use_pallas=use_pallas, packed_gather=_packed_gather_enabled())
    statics_u = dict(statics, gather_quant=gq_user)
    statics_i = dict(statics, gather_quant=gq_item)
    solve = None
    if iterations > 0:
        # no `with` block: ThreadPoolExecutor.__exit__ joins workers, so a
        # hung compile would turn an interrupt/watchdog timeout here into a
        # permanent hang; shutdown(wait=False) leaves the stuck worker behind
        import concurrent.futures
        import contextlib

        # jax config contexts (enable_x64) are thread-local: capture the
        # caller's state and re-apply it inside the compile workers
        x64 = bool(jax.config.jax_enable_x64)

        def _compile(statics_side, *args):
            ctx = jax.enable_x64() if x64 else contextlib.nullcontext()
            with ctx:
                return _solve_side_jit.lower(*args, **statics_side).compile()

        pool = concurrent.futures.ThreadPoolExecutor(2)
        try:
            fu = pool.submit(_compile, statics_u, X, Y, reg, uc, ue)
            fi = pool.submit(_compile, statics_i, Y, X, reg, ic, ie)
            solve_user, solve_item = fu.result(), fi.result()
            solve = lambda A, B, c, e, which: (  # noqa: E731
                solve_user if which == 0 else solve_item)(A, B, reg, c, e)
        except (TypeError, AttributeError, NotImplementedError):
            # pragma: no cover — AOT API regression safety net; deliberately
            # narrow so watchdog timeouts / interrupts propagate instead of
            # falling through to a second (equally hung) compile
            log.warning("concurrent AOT compile failed; falling back to jit path",
                        exc_info=True)
        finally:
            pool.shutdown(wait=False)
    if solve is None:
        solve = lambda A, B, c, e, which: _solve_side_jit(  # noqa: E731
            A, B, reg, c, e, use_cg, cg_steps, cdt, use_pallas,
            statics["packed_gather"], (gq_user, gq_item)[which])
    for _ in range(iterations):
        X = solve(X, Y, uc, ue, 0)
        Y = solve(Y, X, ic, ie, 1)
    return X, Y


# jitted per-class entry points (kept for the sharded multi-chip path and
# incremental recalculate solves)
@functools.partial(jax.jit, static_argnames=("cg_steps",), donate_argnums=(0,))
def cg_solve_scan(X, Y, YtY_reg, rows, idx, dat, cg_steps=3):
    return _cg_class(X, Y.astype(X.dtype), YtY_reg, rows, idx, dat, cg_steps)


@functools.partial(jax.jit, donate_argnums=(0,))
def cho_solve_scan(X, Y, YtY_reg, rows, idx, dat):
    return _cho_class(X, Y.astype(X.dtype), YtY_reg, rows, idx, dat)


@jax.jit
def _loss_chunk_terms(X, Y, YtY, rows, idx, dat):
    """Per-chunk partial sums of sum_u r.x and sum |c| over stacked chunks.

    Follows /root/reference/implicit/cpu/_als.pyx:_calculate_loss:259-308:
    per user r = YtY x + sum_i [(-2 c_i^+) + (|c_i|-1)(y_i.x)] y_i, summed as
    r.x, plus the sum of absolute confidences. Returns (n_chunks,) f32
    partials rather than scalars so callers can accumulate across chunks in
    f64 on the host (the reference uses double accumulators; f32
    carry-adds would make the loss metric noisy at large nnz*alpha).
    """
    n_rows = X.shape[0]

    def chunk_step(carry, chunk):
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
        return carry, (jnp.sum(r * x), jnp.sum(jnp.where(mask, conf, 0.0)))

    _, (loss, conf) = jax.lax.scan(chunk_step, None, (rows, idx, dat))
    return loss, conf


def calculate_loss_bucketed(buckets, X, Y, reg):
    """Confidence-weighted MSE of an ALS model over bucketed chunks of Cui."""
    from ..sparse import BucketedCSR

    if isinstance(buckets, BucketedCSR):
        buckets = buckets.to_device()
    YtY = jnp.dot(Y.T, Y, precision=HIGH, preferred_element_type=jnp.float32)
    # per-chunk f32 partials, accumulated in f64 on the host — the
    # reference's double accumulators (_als.pyx 'cdef double loss')
    loss = 0.0
    total_conf = 0.0
    for cls in buckets.classes:
        l, c = _loss_chunk_terms(X, Y, YtY, cls.rows, cls.indices, cls.data)
        loss += float(np.sum(np.asarray(l, dtype=np.float64)))
        total_conf += float(np.sum(np.asarray(c, dtype=np.float64)))
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
