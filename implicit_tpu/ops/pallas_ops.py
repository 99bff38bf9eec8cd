"""Pallas TPU kernels for the ALS hot loop.

The CG solver's cost is dominated by passes over the gathered factor block
``Yu (C, L, F)``. Composed from XLA einsums, each A-multiply reads the block
twice (once for ``t = Yu·v``, once for the weighted combine). The fused kernel
here computes, in ONE pass over the block,

    out[c] = sum_l (alpha * bv[c,l] + beta * w[c,l] * (Yu[c,l]·v[c])) * Yu[c,l]

which with (alpha, beta) = (1, -1) is the sparse part of the CG residual
``b - A x`` and with (0, 1) the sparse part of ``A p`` — the dense ``v @ YtY``
term is a cheap matmul added by the caller. This halves HBM traffic of the
solver versus the einsum formulation (replacing implicit/gpu/als.cu:24-111's
shared-memory per-block loop with a VMEM-tiled streaming reduction).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _dequant_tile(yu_ref, s_ref, compute_dtype):
    """int8 tile + per-row scales -> compute-dtype tile, inside VMEM.

    The XLA-epilogue dequant was a measured dead end (int8 gathers +
    composed dequant lost 0.25-0.35 s/iter at every width — the 1B->2B
    dtype change forces a materialized relayout of the gathered block,
    exactly like the packed-gather postmortem in ops/als.py). Fusing the
    dequant here means the gather stays epilogue-free int8 (layout
    preserved, table under the VMEM promotion boundary) and the convert
    happens tile-by-tile on-chip. The scale expand reshapes while still
    f32 and casts AFTER (Mosaic rejects sub-128-lane bf16 shape casts —
    same rule as the v expand in _weighted_matvec_kernel).
    """
    sv = s_ref[:][:, :, None].astype(compute_dtype)  # (BC, BL, 1)
    return yu_ref[:].astype(compute_dtype) * sv


def _weighted_matvec_kernel(w_ref, bv_ref, v_ref, yu_ref, *rest,
                            alpha, beta, nl, BL, L, compute=None):
    if compute is not None:
        s_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # products stay in the compute dtype (bf16 halves the VMEM footprint);
    # reductions accumulate in f32
    if compute is not None:
        yu = _dequant_tile(yu_ref, s_ref, compute)  # (BC, BL, F)
    else:
        yu = yu_ref[:]  # (BC, BL, F) compute dtype
    if L % BL:
        # partial final L-tile: out-of-bounds reads are undefined — zero
        # both the gathered rows and the coefficients past L (a masked
        # coeff alone can't stop NaN garbage: 0 * NaN propagates)
        lane = li * BL + jax.lax.broadcasted_iota(jnp.int32, (1, BL, 1), 1)
        yu = jnp.where(lane < L, yu, jnp.zeros((), yu.dtype))
    # expand (BC, F) -> (BC, 1, F) while still f32, cast AFTER: Mosaic
    # rejects the bf16 shape cast at sub-128 lane widths (the on-TPU
    # kernel oracle caught vector<8x64xbf16> -> vector<8x1x64xbf16>
    # failing infer-vector-layout at F=64)
    v = v_ref[:][:, None, :].astype(yu.dtype)  # (BC, 1, F)
    # t[c, l] = Yu[c, l, :] . v[c, :]
    t = jnp.sum(yu * v, axis=2, dtype=jnp.float32)
    coeff = alpha * bv_ref[:] + beta * (w_ref[:] * t)  # (BC, BL) f32
    if L % BL:
        lane2 = li * BL + jax.lax.broadcasted_iota(jnp.int32, coeff.shape, 1)
        coeff = jnp.where(lane2 < L, coeff, 0.0)
    # acc[c, f] += sum_l coeff[c, l] * Yu[c, l, f]; the broadcast stays f32
    # (Mosaic miscompiles bf16 (C,L)->(C,L,1) reshapes)
    acc_ref[:] += jnp.sum(coeff[:, :, None] * yu, axis=1, dtype=jnp.float32)

    @pl.when(li == nl - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _interpret_default():
    # run the kernel through the Pallas interpreter off-TPU (tests, CPU mesh)
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit,
                   static_argnames=("alpha", "beta", "interpret", "compute"))
def _weighted_matvec_call(Yu, w, bv, v, alpha, beta, interpret, scales=None,
                          compute=None):
    """One-pass sum_l (alpha*bv + beta*w*(Yu.v)) * Yu over the L axis.

    Yu : (C, L, F) gathered factors (float32 or bfloat16; int8 with
         ``scales``/``compute`` set — dequantized in-kernel)
    w, bv, v : (C, L), (C, L), (C, F) float32
    Returns (C, F) float32.
    """
    C, L, F = Yu.shape

    # BL: the full L axis when small, else a 128-multiple tile (Mosaic needs
    # the last block dim divisible by 128 or equal to the array dim).
    # Prefer a tile that divides L exactly; otherwise the kernel masks the
    # partial final tile (bucketed grid lengths > 512 are always 128-
    # multiples, so production shapes take the exact path)
    if L <= 512:
        BL = L
    else:
        BL = next((c for c in (512, 384, 256, 128) if L % c == 0), 256)
    # size by PHYSICAL footprint (last dim lane-padded to 128): the kernel
    # holds ~2 tile-sized f32 temporaries plus the double-buffered input
    # (quant adds the dequantized compute-dtype copy: ~2/3 the element
    # budget keeps the scoped footprint level)
    F_pad = _round_up(F, 128)
    elems = (1 << 20) if scales is None else ((1 << 20) * 2 // 3)
    BC = min(C, elems // (BL * F_pad), 1024)
    BC = max(8, (BC // 8) * 8)
    if C % BC:
        # fall back to the largest multiple-of-8 divisor-aligned tile
        while C % BC and BC > 8:
            BC -= 8
    nc = -(-C // BC)
    nl = -(-L // BL)

    kernel = functools.partial(
        _weighted_matvec_kernel, alpha=float(alpha), beta=float(beta), nl=nl,
        BL=BL, L=L, compute=compute,
    )

    tile2 = lambda ci, li: (ci, li)  # noqa: E731
    in_specs = [
        pl.BlockSpec((BC, BL), tile2, memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, BL), tile2, memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, F), lambda ci, li: (ci, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, BL, F), lambda ci, li: (ci, li, 0), memory_space=pltpu.VMEM),
    ]
    args = (w, bv, v, Yu)
    if scales is not None:
        in_specs.append(pl.BlockSpec((BC, BL), tile2, memory_space=pltpu.VMEM))
        args = args + (scales.astype(jnp.float32),)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nc, nl),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BC, F), lambda ci, li: (ci, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BC, F), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * C * L * F,
            bytes_accessed=C * L * F * Yu.dtype.itemsize + C * L * 8 + C * F * 8,
            transcendentals=0,
        ),
    )(*args)


def weighted_matvec(Yu, w, bv, v, alpha, beta, interpret=None, scales=None):
    if interpret is None:
        interpret = _interpret_default()
    if scales is None:
        return _weighted_matvec_call(Yu, w, bv, v, alpha, beta, interpret)
    return _weighted_matvec_call(Yu, w, bv, v, alpha, beta, interpret,
                                 scales=scales, compute=jnp.bfloat16)


def _cg_full_kernel(dat_ref, x0_ref, yty_ref, yu_ref, *rest, cg_steps,
                    compute=None):
    """The ENTIRE per-row CG solve on a VMEM-resident block.

    Reads the gathered factor tile once and runs residual + ``cg_steps``
    conjugate-gradient iterations without returning to HBM — versus ~8 HBM
    passes for the composed formulation. Math matches
    implicit/cpu/_als.pyx:_least_squares_cg:154-248 (warm start, per-row
    rs < 1e-20 early exit) on a whole (BC, L) block of rows at once.
    """
    if compute is not None:
        s_ref, out_ref = rest
        yu = _dequant_tile(yu_ref, s_ref, compute)  # (BC, L, F)
    else:
        (out_ref,) = rest
        yu = yu_ref[:]  # (BC, L, F) compute dtype
    dat = dat_ref[:]  # (BC, L) f32
    x = x0_ref[:]  # (BC, F) f32
    yty = yty_ref[:]  # (F, F) f32

    mask = dat != 0
    w = jnp.where(mask, jnp.abs(dat) - 1.0, 0.0)
    bv = jnp.maximum(dat, 0.0)

    def tvec(v):
        # (BC, L): per-row dots yu[c,l,:] . v[c,:]
        return jnp.sum(yu * v[:, None, :].astype(yu.dtype), axis=2, dtype=jnp.float32)

    def sp(coeff):
        # (BC, F): sum_l coeff[c,l] * yu[c,l,:]
        return jnp.sum(coeff[:, :, None] * yu, axis=1, dtype=jnp.float32)

    def dense(v):
        return jnp.dot(v, yty, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    # r = b - A x = sp(bv - w * (yu.x)) - x @ YtY_reg
    r = sp(bv - w * tvec(x)) - dense(x)
    p = r
    rsold = jnp.sum(r * r, axis=1)
    active = rsold >= 1e-20

    # unrolled (lax loops don't legalize in Mosaic here); the BC sizing in
    # _cg_full_call accounts for the live tile-sized temporaries
    for _ in range(cg_steps):
        Ap = sp(w * tvec(p)) + dense(p)
        pAp = jnp.sum(p * Ap, axis=1)
        alpha = jnp.where(active, rsold / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        rsnew = jnp.sum(r * r, axis=1)
        still = active & (rsnew >= 1e-20)
        beta = jnp.where(active, rsnew / jnp.where(active, rsold, 1.0), 0.0)
        p = jnp.where(still[:, None], r + beta[:, None] * p, p)
        rsold = jnp.where(still, rsnew, rsold)
        active = still

    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("cg_steps", "interpret", "compute"))
def _cg_full_call(Yu, dat, x0, YtY_reg, cg_steps, interpret, scales=None,
                  compute=None):
    C, L, F = Yu.shape
    # the whole L axis must fit the tile. Size BC by the PHYSICAL footprint:
    # the last dim is lane-padded to 128, and ~2 f32 tile-sized temporaries
    # are live at once, so keep BC*L*Fpad around 1M elements (VMEM is 16MB;
    # quant holds the int8 input AND its dequantized compute-dtype copy,
    # hence the 2/3 budget)
    F_pad = _round_up(F, 128)
    elems = (1 << 20) if scales is None else ((1 << 20) * 2 // 3)
    BC = min(C, elems // (L * F_pad), 512)
    BC = max(8, (BC // 8) * 8)
    while C % BC and BC > 8:
        BC -= 8
    nc = -(-C // BC)

    kernel = functools.partial(_cg_full_kernel, cg_steps=cg_steps,
                               compute=compute)
    in_specs = [
        pl.BlockSpec((BC, L), lambda ci: (ci, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, F), lambda ci: (ci, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, F), lambda ci: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, L, F), lambda ci: (ci, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = (dat, x0, YtY_reg, Yu)
    if scales is not None:
        in_specs.append(
            pl.BlockSpec((BC, L), lambda ci: (ci, 0), memory_space=pltpu.VMEM))
        args = args + (scales.astype(jnp.float32),)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BC, F), lambda ci: (ci, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * (cg_steps + 1) * C * L * F,
            bytes_accessed=C * L * F * Yu.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)


def cg_solve_full(Yu, dat, x0, YtY_reg, cg_steps=3, interpret=None, scales=None):
    """Full warm-started CG solve of one gathered block; returns (C, F) x.

    With ``scales`` (per-row quant scales, (C, L)), ``Yu`` is int8 and the
    dequant to bfloat16 happens in-kernel (see _dequant_tile).
    """
    if interpret is None:
        interpret = _interpret_default()
    if scales is None:
        return _cg_full_call(Yu, dat, x0, YtY_reg, cg_steps, interpret)
    return _cg_full_call(Yu, dat, x0, YtY_reg, cg_steps, interpret,
                         scales=scales, compute=jnp.bfloat16)


def _gramian_cg_kernel(dat_ref, x0_ref, yty_ref, yu_ref, *rest,
                       nl, cg_steps, bc, compute=None):
    """Fused long-row solver: gramian build (MXU) + in-VMEM CG, one HBM pass.

    For rows too long to keep VMEM-resident through the tile CG, the normal
    matrix A = YtY + reg I + Yu^T diag(|c|-1) Yu is explicit: the (F, F)
    per-row build amortizes over L >> F. Streaming the gathered block
    tile-by-tile into per-row MXU contractions and finishing with the masked
    CG *inside* the kernel means neither the weighted block copy nor the
    (C, F, F) normal matrices ever exist in HBM (the composed XLA
    formulation writes both, tripling traffic).
    """
    if compute is not None:
        s_ref, out_ref, A_ref, b_ref = rest
    else:
        out_ref, A_ref, b_ref = rest
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        A_ref[:] = jnp.zeros_like(A_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    if compute is not None:
        yu = _dequant_tile(yu_ref, s_ref, compute)  # (BC, BL, F)
    else:
        yu = yu_ref[:]  # (BC, BL, F) compute dtype
    dat = dat_ref[:]  # (BC, BL) f32
    mask = dat != 0
    w = jnp.where(mask, jnp.abs(dat) - 1.0, 0.0)
    bv = jnp.maximum(dat, 0.0)

    # b[c] += sum_l bv[c,l] * yu[c,l]; f32 broadcast (bf16 (C,L,1) reshapes
    # miscompile in Mosaic)
    b_ref[:] += jnp.sum(bv[:, :, None] * yu, axis=1, dtype=jnp.float32)

    # A[c] += yu[c]^T diag(w[c]) yu[c] — one (F,BL)x(BL,F) MXU contraction
    # per row of the block. Full f32 precision when the block is f32 (the
    # MXU's default multi-pass mode would round to ~bf16 mantissas).
    prec = (
        jax.lax.Precision.HIGHEST
        if yu.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for c in range(bc):
        yuc = yu[c].astype(jnp.float32)  # (BL, F)
        A_ref[c] += jax.lax.dot_general(
            yuc * w[c][:, None], yuc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    @pl.when(li == nl - 1)
    def _():
        A = A_ref[:] + yty_ref[:][None]  # (BC, F, F)
        b = b_ref[:]
        x = x0_ref[:]

        def Ax(v):
            return jnp.sum(A * v[:, None, :], axis=2)

        r = b - Ax(x)
        p = r
        rsold = jnp.sum(r * r, axis=1)
        active = rsold >= 1e-20
        for _ in range(cg_steps):
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
            active = still
        out_ref[:] = x


def gramian_tile_l(L, F, itemsize):
    """The gramian-CG kernel's L-tile for this shape, or None if none fits.

    Two constraints: (a) VMEM — the scoped footprint is the double-buffered
    input tile plus the f32 broadcast temporaries (~12 bytes per element,
    calibrated against Mosaic's reported scoped allocations: a bf16 tile of
    8x1280x128 allocates 16.2MB) plus the (8, F, F) normal-matrix scratch,
    against a ~13MB budget; (b) Mosaic — a 2-D block's last dim must be a
    multiple of 128 or equal to the full array dim, and the tile must
    divide L exactly. Returns L itself when the whole row fits (always
    legal), else the largest 128-multiple divisor within budget, else None
    (the caller should fall back to the composed XLA formulation).
    """
    del itemsize  # f32 aliases one temp, bf16 pays a cast: both ~12 B/elem
    f_pad = _round_up(F, 128)
    bpe = 12
    budget = 13 * 2**20 - 8 * f_pad * f_pad * 4
    cap = budget // (8 * f_pad * bpe)
    if cap < 128:
        return None
    if L <= cap:
        return L
    bl = (cap // 128) * 128
    while bl >= 128 and L % bl:
        bl -= 128
    return bl if bl >= 128 else None


@functools.partial(jax.jit, static_argnames=("cg_steps", "interpret", "compute"))
def _gramian_cg_call(Yu, dat, x0, YtY_reg, cg_steps, interpret, scales=None,
                     compute=None):
    C, L, F = Yu.shape
    BC = 8
    BL = gramian_tile_l(L, F, Yu.dtype.itemsize)
    if BL is None:  # callers dispatch away from unroutable shapes
        raise ValueError(f"no VMEM-viable gramian tile for L={L}, F={F}")
    # ceil: a partial final row-block solves garbage padding rows (row-
    # independent, writes clipped) instead of silently skipping the tail
    nc = -(-C // BC)
    nl = L // BL

    kernel = functools.partial(_gramian_cg_kernel, nl=nl, cg_steps=cg_steps,
                               bc=BC, compute=compute)
    tile2 = lambda ci, li: (ci, li)  # noqa: E731
    in_specs = [
        pl.BlockSpec((BC, BL), tile2, memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, F), lambda ci, li: (ci, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, F), lambda ci, li: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BC, BL, F), lambda ci, li: (ci, li, 0), memory_space=pltpu.VMEM),
    ]
    args = (dat, x0, YtY_reg, Yu)
    if scales is not None:
        in_specs.append(pl.BlockSpec((BC, BL), tile2, memory_space=pltpu.VMEM))
        args = args + (scales.astype(jnp.float32),)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nc, nl),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BC, F), lambda ci, li: (ci, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BC, F, F), jnp.float32),
            pltpu.VMEM((BC, F), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * L * F * F,
            bytes_accessed=C * L * F * Yu.dtype.itemsize + C * L * 4,
            transcendentals=0,
        ),
    )(*args)


def gramian_cg_solve(Yu, dat, x0, YtY_reg, cg_steps=3, interpret=None,
                     scales=None):
    """Long-row solve of one gathered block: explicit A + masked CG, fused.

    With ``scales``, ``Yu`` is int8 and dequantizes in-kernel (bfloat16).
    """
    if interpret is None:
        interpret = _interpret_default()
    if scales is None:
        return _gramian_cg_call(Yu, dat, x0, YtY_reg, cg_steps, interpret)
    return _gramian_cg_call(Yu, dat, x0, YtY_reg, cg_steps, interpret,
                            scales=scales, compute=jnp.bfloat16)


def weighted_matvec_reference(Yu, w, bv, v, alpha, beta):
    """jnp oracle for the fused kernel (used on CPU, f64 solves, and tests)."""
    precision = (
        jax.lax.Precision.DEFAULT if Yu.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    )
    acc_dt = jnp.float64 if Yu.dtype == jnp.float64 else jnp.float32
    t = jnp.einsum("clf,cf->cl", Yu, v.astype(Yu.dtype),
                   preferred_element_type=acc_dt, precision=precision)
    coeff = alpha * bv + beta * (w * t)
    return jnp.einsum("cl,clf->cf", coeff.astype(Yu.dtype), Yu,
                      preferred_element_type=acc_dt, precision=precision)
