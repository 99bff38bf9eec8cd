"""Round-5 micro-probe: where does the F=256 gramian-CG path's time go?

The f256 probe decomposed the 0.45 s/iter wall: user side 0.18s (1.26x its
F=128 cost), item side 0.31s (2.45x). The item side is the only side with
long-row mass (~39% of nnz on the gramian-CG path), so this probe isolates
ONE representative long-row class (the largest by padded nnz) and times,
back-to-back in one process:

  - gather-only: materialize Yu (C, L, F) from the factor table (the Pallas
    input cannot fuse into the kernel, so this HBM write+read is a real,
    separate cost at kernel boundaries)
  - kernel-only: gramian_cg_solve on a pre-materialized block
  - kernel variant: bf16-native A build (dot_general(bf16, bf16, f32)
    without the per-row f32 cast)
  - composed XLA oracle on the same block (einsum A build + CG)

at F=128 and F=256 to see which component scales super-linearly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_gram256_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from implicit_tpu.ops import pallas_ops
from implicit_tpu.ops.pallas_ops import _gramian_cg_kernel, gramian_tile_l

# representative item-side long-row classes at last.fm shape
CASES = [(432, 1280), (80, 5120), (32, 10240)]
N_TABLE = 360_000


def sync(x):
    return float(jnp.sum(x))


def timed(fn, reps=3):
    fn()
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def _gramian_cg_kernel_bf16(dat_ref, x0_ref, yty_ref, yu_ref, out_ref, A_ref,
                            b_ref, *, nl, cg_steps, bc):
    """Variant: A build with native bf16 MXU dots (weight folded in bf16)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        A_ref[:] = jnp.zeros_like(A_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    yu = yu_ref[:]
    dat = dat_ref[:]
    mask = dat != 0
    w = jnp.where(mask, jnp.abs(dat) - 1.0, 0.0)
    bv = jnp.maximum(dat, 0.0)
    b_ref[:] += jnp.sum(bv[:, :, None] * yu, axis=1, dtype=jnp.float32)

    for c in range(bc):
        yuc = yu[c]  # stays bf16
        wyu = (w[c][:, None] * yuc.astype(jnp.float32)).astype(yuc.dtype)
        A_ref[c] += jax.lax.dot_general(
            wyu, yuc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(li == nl - 1)
    def _():
        A = A_ref[:] + yty_ref[:][None]
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


@functools.partial(jax.jit, static_argnames=("cg_steps", "variant"))
def gram_call(Yu, dat, x0, YtY_reg, cg_steps=3, variant="base"):
    C, L, F = Yu.shape
    BC = 8
    BL = gramian_tile_l(L, F, Yu.dtype.itemsize)
    nc = -(-C // BC)
    nl = L // BL
    kern = _gramian_cg_kernel if variant == "base" else _gramian_cg_kernel_bf16
    kernel = functools.partial(kern, nl=nl, cg_steps=cg_steps, bc=BC)
    return pl.pallas_call(
        kernel,
        grid=(nc, nl),
        in_specs=[
            pl.BlockSpec((BC, BL), lambda ci, li: (ci, li), memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, F), lambda ci, li: (ci, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), lambda ci, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, BL, F), lambda ci, li: (ci, li, 0), memory_space=pltpu.VMEM),
        ],
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
    )(dat, x0, YtY_reg, Yu)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for C, L in CASES:
        for F in (128, 256):
            tab = jnp.asarray(
                rng.standard_normal((N_TABLE, F)).astype(np.float32),
                dtype=jnp.bfloat16)
            idx = jnp.asarray(
                rng.integers(0, N_TABLE, (C, L), dtype=np.int32))
            dat = jnp.asarray(
                (rng.random((C, L)) * 5 + 1).astype(np.float32))
            x0 = jnp.asarray(rng.random((C, F)).astype(np.float32) * 0.01)
            yty = jnp.eye(F, dtype=jnp.float32) * 0.01
            sync(tab), sync(idx), sync(dat), sync(x0)

            gather = jax.jit(lambda t, i: t[i])
            Yu = gather(tab, idx)
            sync(Yu.astype(jnp.float32))
            t_gather = timed(lambda: sync(gather(tab, idx).astype(jnp.float32)[:, 0, :1]))

            t_base = timed(lambda: sync(gram_call(Yu, dat, x0, yty)))
            t_bf16 = timed(lambda: sync(gram_call(Yu, dat, x0, yty, variant="bf16")))
            d_base = np.asarray(gram_call(Yu, dat, x0, yty))
            d_bf16 = np.asarray(gram_call(Yu, dat, x0, yty, variant="bf16"))
            rel = np.max(np.abs(d_base - d_bf16) / (np.abs(d_base) + 1e-6))

            # gather + kernel fused in one program (what the fit runs)
            e2e = jax.jit(lambda t, i, d, x, y: gram_call(t[i], d, x, y))
            t_e2e = timed(lambda: sync(e2e(tab, idx, dat, x0, yty)))

            nnz = C * L
            print(f"C={C:4d} L={L:6d} F={F:3d}: gather={t_gather*1e3:7.2f}ms "
                  f"kernel={t_base*1e3:7.2f}ms bf16_kernel={t_bf16*1e3:7.2f}ms "
                  f"e2e={t_e2e*1e3:7.2f}ms "
                  f"(ns/entry: g={t_gather/nnz*1e9:5.2f} k={t_base/nnz*1e9:5.2f}) "
                  f"bf16_rel_dev={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
