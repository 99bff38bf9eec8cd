"""On-hardware Pallas kernel oracle: real Mosaic vs the jnp reference.

CI exercises the kernels through the Pallas interpreter on CPU
(tests/test_pallas.py); this script runs the SAME oracle checks with
``interpret=False`` on the attached TPU, covering real-Mosaic behaviors
the interpreter can't (lane tiling, scoped-VMEM limits, the documented
bf16-reshape class of miscompiles — ops/pallas_ops.py). Run it after any
kernel or toolchain change:

    PYTHONPATH=. python benchmarks/tpu_kernel_oracle.py

Exit code 0 = every case within tolerance. Shapes mirror the CI matrix
plus the wide-factor and long-row regression shapes. Mosaic kernel
compiles bypass the jax persistent cache on the axon transport, so a full
run pays one remote compile per case — set ORACLE_QUICK=1 for a reduced
matrix (one shape per kernel/dtype) when the compile service is slow.
"""

import os
import sys

QUICK = bool(int(os.environ.get("ORACLE_QUICK", "0")))
# ORACLE_INTERPRET=1: run the same case matrix through the Pallas
# interpreter instead of real Mosaic — the off-hardware CI mode (the
# mosaic-vs-interp checks are skipped since both sides would be the
# interpreter; the vs-reference/vs-composed formulation checks remain).
# tests/test_misc.py runs the QUICK+INTERPRET combination on every push.
INTERPRET = bool(int(os.environ.get("ORACLE_INTERPRET", "0")))

import jax
import jax.numpy as jnp
import numpy as np

if INTERPRET:
    # off-hardware mode must never touch the accelerator transport: env
    # JAX_PLATFORMS alone can't win over the accelerator sitecustomize,
    # and a down tunnel blocks backend init indefinitely (observed: the
    # CI oracle subprocess hung the whole suite during a tunnel outage)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from implicit_tpu.ops.als import _masked_cg, _weights  # noqa: E402
from implicit_tpu.ops.pallas_ops import (  # noqa: E402
    cg_solve_full, gramian_cg_solve, weighted_matvec,
    weighted_matvec_reference)

FAILURES = []


def check(name, got, want, rtol, atol):
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    err = np.max(np.abs(got - want) / (np.abs(want) * rtol + atol + 1e-30))
    ok = bool(np.isfinite(got).all()) and err <= 1.0
    print(f"{'PASS' if ok else 'FAIL'} {name:50s} relerr={err:8.3f}", flush=True)
    if not ok:
        FAILURES.append(name)


def composed_cg(Yu, dat, x0, YtY_reg, cg_steps):
    w, bv = _weights(dat)
    r = weighted_matvec_reference(Yu, w, bv, x0, 1.0, -1.0) - x0 @ YtY_reg
    return _masked_cg(
        x0, r,
        lambda v: weighted_matvec_reference(Yu, w, bv, v, 0.0, 1.0) + v @ YtY_reg,
        cg_steps)


def cg_case(C, L, F, seed, table_dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    Yu = jnp.asarray(rng.standard_normal((C, L, F), dtype=np.float32) * 0.1,
                     dtype=table_dtype)
    dat = rng.random((C, L), dtype=np.float32) * 5 + 1
    dat[:, -2:] = 0.0  # padding tail
    x0 = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32) * 0.01)
    Y = rng.standard_normal((64, F), dtype=np.float32) * 0.1
    YtY_reg = jnp.asarray(Y.T @ Y + 0.05 * np.eye(F, dtype=np.float32))
    return Yu, jnp.asarray(dat), x0, YtY_reg


def main():
    dev = jax.devices()[0]
    print("device:", dev, "interpret:", INTERPRET, flush=True)
    if dev.platform not in ("tpu", "axon") and not INTERPRET:
        print("NOT a TPU — this script validates real-Mosaic lowering; "
              "set ORACLE_INTERPRET=1 for the off-hardware mode.", flush=True)
        sys.exit(2)
    interpret = INTERPRET

    # weighted matvec: f32 and bf16 tables, both (alpha, beta) modes
    wm_cases = [(64, 8, 128), (128, 96, 128), (16, 256, 128),
                (32, 64, 256), (8, 24, 64)]
    for C, L, F in (wm_cases[:1] + wm_cases[-1:] if QUICK else wm_cases):
        rng = np.random.default_rng(C + L)
        Yu = jnp.asarray(rng.standard_normal((C, L, F), dtype=np.float32))
        w = jnp.asarray(rng.random((C, L), dtype=np.float32))
        bv = jnp.asarray(rng.random((C, L), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32))
        for alpha, beta in [(1.0, -1.0), (0.0, 1.0)]:
            got = weighted_matvec(Yu, w, bv, v, alpha, beta, interpret=interpret)
            want = weighted_matvec_reference(Yu, w, bv, v, alpha, beta)
            check(f"wmatvec f32 C{C} L{L} F{F} a{alpha} b{beta}",
                  got, want, 1e-3, 1e-3)
        got = weighted_matvec(Yu.astype(jnp.bfloat16), w, bv, v, 1.0, -1.0,
                              interpret=interpret)
        want = weighted_matvec_reference(Yu.astype(jnp.bfloat16), w, bv, v,
                                         1.0, -1.0)
        check(f"wmatvec bf16 C{C} L{L} F{F}", got, want, 5e-2, 1.0)

    # CG kernels: two oracles per case. (1) real Mosaic vs the Pallas
    # INTERPRETER on identical inputs — the exact-formulation lowering
    # check; tight for f32 (measured 5e-7), loose for bf16 tables in the
    # tile-CG kernel (Mosaic multiplies in bf16 VREGs with f32 accumulation
    # while the interpreter upcasts first — one extra rounding, measured
    # ~2e-3; the gramian kernel builds its normal matrix in f32 and stays
    # tight even with bf16 tables — measured, kept at 1e-5); (2) vs the
    # composed einsum formulation — loose, bounds CG reduction-order noise
    # (measured up to ~4e-3 f32 on ill-conditioned tiny rows).
    def interp_tol(tag):
        return (1e-5, 1e-5) if tag == "f32" else (1e-2, 1e-2)

    cg_cases = [(16, 64, 128), (16, 96, 256), (8, 24, 64)]
    for shape in (cg_cases[:1] if QUICK else cg_cases):
        for dt, tag, lo in [(jnp.float32, "f32", (5e-3, 5e-3)),
                            (jnp.bfloat16, "bf16", (5e-2, 5e-2))]:
            Yu, dat, x0, YtY = cg_case(*shape, seed=shape[1], table_dtype=dt)
            got = cg_solve_full(Yu, dat, x0, YtY, cg_steps=3,
                                interpret=interpret)
            if not INTERPRET:
                interp = cg_solve_full(Yu, dat, x0, YtY, cg_steps=3,
                                       interpret=True)
                check(f"cg_full {tag} {shape} mosaic-vs-interp", got, interp,
                      *interp_tol(tag))
            check(f"cg_full {tag} {shape} vs-composed", got,
                  composed_cg(Yu, dat, x0, YtY, 3), *lo)

    # gramian-build CG (long rows), incl. the scoped-VMEM regression shapes
    gr_cases = [(16, 1536, 128), (16, 768, 256), (8, 2048, 64)]
    for shape in (gr_cases[:1] if QUICK else gr_cases):
        for dt, tag, lo in [(jnp.float32, "f32", (5e-3, 5e-3)),
                            (jnp.bfloat16, "bf16", (5e-2, 5e-2))]:
            Yu, dat, x0, YtY = cg_case(*shape, seed=shape[2], table_dtype=dt)
            got = gramian_cg_solve(Yu, dat, x0, YtY, cg_steps=3,
                                   interpret=interpret)
            if not INTERPRET:
                interp = gramian_cg_solve(Yu, dat, x0, YtY, cg_steps=3,
                                          interpret=True)
                check(f"gramian_cg {tag} {shape} mosaic-vs-interp", got, interp,
                      1e-5, 1e-5)
            check(f"gramian_cg {tag} {shape} vs-composed", got,
                  composed_cg(Yu, dat, x0, YtY, 3), *lo)

    # int8 in-kernel dequant variants (gather_quant): real Mosaic / the
    # interpreter vs the dequantize-then-run bf16 kernel on the SAME
    # quantized values — the only delta allowed is bf16 multiply rounding
    # order in the dequant itself
    from implicit_tpu.ops.als import _quantize_table

    q_cases = [(16, 64, 128), (16, 96, 256), (8, 24, 64)]
    for shape in (q_cases[:1] if QUICK else q_cases):
        C, L, F = shape
        rng = np.random.default_rng(7 * C + L)
        Y = jnp.asarray(rng.standard_normal((96, F), dtype=np.float32) * 0.1)
        q, s = _quantize_table(Y, "bfloat16")
        idx = rng.integers(0, 96, (C, L))
        Yu_q = jnp.asarray(np.asarray(q)[idx])
        S = jnp.asarray(np.asarray(s)[idx])
        Yu_deq = jnp.asarray(
            np.asarray(q)[idx].astype(np.float32)
            * np.asarray(s, dtype=np.float32)[idx][:, :, None]
        ).astype(jnp.bfloat16)
        _, dat, x0, YtY = cg_case(C, L, F, seed=L)
        got = cg_solve_full(Yu_q, dat, x0, YtY, cg_steps=3,
                            interpret=interpret, scales=S)
        want = cg_solve_full(Yu_deq, dat, x0, YtY, cg_steps=3,
                             interpret=interpret)
        check(f"cg_full int8 {shape} vs-dequant-bf16", got, want, 5e-2, 5e-2)
        w, bv = _weights(dat)
        v = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32) * 0.1)
        got = weighted_matvec(Yu_q, w, bv, v, 1.0, -1.0,
                              interpret=interpret, scales=S)
        want = weighted_matvec(Yu_deq, w, bv, v, 1.0, -1.0,
                               interpret=interpret)
        check(f"wmatvec int8 {shape} vs-dequant-bf16", got, want, 5e-2, 5e-1)

    gq_cases = [(8, 1536, 128), (8, 768, 256)]
    for shape in (gq_cases[:1] if QUICK else gq_cases):
        C, L, F = shape
        rng = np.random.default_rng(11 * C + L)
        Y = jnp.asarray(rng.standard_normal((96, F), dtype=np.float32) * 0.1)
        q, s = _quantize_table(Y, "bfloat16")
        idx = rng.integers(0, 96, (C, L))
        Yu_q = jnp.asarray(np.asarray(q)[idx])
        S = jnp.asarray(np.asarray(s)[idx])
        Yu_deq = jnp.asarray(
            np.asarray(q)[idx].astype(np.float32)
            * np.asarray(s, dtype=np.float32)[idx][:, :, None]
        ).astype(jnp.bfloat16)
        _, dat, x0, YtY = cg_case(C, L, F, seed=F)
        got = gramian_cg_solve(Yu_q, dat, x0, YtY, cg_steps=3,
                               interpret=interpret, scales=S)
        want = gramian_cg_solve(Yu_deq, dat, x0, YtY, cg_steps=3,
                                interpret=interpret)
        check(f"gramian_cg int8 {shape} vs-dequant-bf16", got, want, 5e-2, 5e-2)

    print(f"\n{len(FAILURES)} failures", flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
