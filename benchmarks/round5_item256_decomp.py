"""Round-5 probe: decompose the item-side F=256 half-iteration (0.313s).

The side split (round5_f256_probe) shows the F=128->256 blowup is the item
side (0.126 -> 0.313s, +149%) while the user side grows +29%. The gather
cliff was ruled out (round5_gather_cliff: 10-12 ns/row at 88-176MB tables).
Remaining suspects, isolated here per-variant with each variant a SINGLE
dispatched program over the whole side (the transport's ~25-30ms round trip
would swamp per-class calls):

  full      the production side solve (pallas kernels, cg_steps=3)
  cg1/cg0   fewer CG steps: the marginal cost of in-kernel CG iterations
            (tile-CG re-reads the VMEM block per step; gramian-CG's Ax is a
            (BC,F,F) VPU reduction that scales F^2)
  nokernel  kernels replaced by a fused gather+sum: the gather + scan
            skeleton floor (XLA may fuse the gather into the reduction, so
            this is a lower bound on the gather's standalone cost)
  einsum    use_pallas=False: the composed XLA formulation's scaling
            (if it scales better than the kernels, the gap is kernel-side)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_item256_decomp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from implicit_tpu.datasets.synthetic import generate_synthetic
from implicit_tpu.ops import als as als_ops
from implicit_tpu.ops import pallas_ops
from implicit_tpu.sparse import BucketedCSR

USERS, ITEMS, NNZ = 360_000, 160_000, 17_500_000


def sync(x):
    return float(jnp.sum(x))


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()
    dib = BucketedCSR(Ciu, target_entries=1 << 24, max_chunk_rows=65536).to_device()
    rng = np.random.default_rng(0)

    real_full = pallas_ops.cg_solve_full
    real_gram = pallas_ops.gramian_cg_solve

    def nokernel_full(Yu, dat, x0, YtY_reg, cg_steps=3, interpret=None):
        return x0 + jnp.sum(Yu, axis=1, dtype=jnp.float32) * 1e-30

    for F in (128, 256):
        Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
        X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
        sync(Y0), sync(X0)

        def run(tag, cg_steps=3, use_pallas=True, nokernel=False):
            pallas_ops.cg_solve_full = nokernel_full if nokernel else real_full
            pallas_ops.gramian_cg_solve = nokernel_full if nokernel else real_gram
            try:
                def one():
                    Y = Y0 + 0.0
                    sync(Y)
                    t0 = time.time()
                    Y = als_ops.solve_side(
                        Y, X0, dib, 0.01, cg_steps=cg_steps,
                        compute_dtype="bfloat16", use_pallas=use_pallas)
                    sync(Y)
                    return time.time() - t0

                one()
                dt = min(one() for _ in range(3))
                print(f"[decomp] F={F:3d} {tag:10s} {dt:.4f}s", flush=True)
                return dt
            finally:
                pallas_ops.cg_solve_full = real_full
                pallas_ops.gramian_cg_solve = real_gram

        run("full")
        run("cg1", cg_steps=1)
        run("cg0", cg_steps=0)
        # cg_steps=7 only busts the jit cache: _solve_side_jit's statics
        # otherwise match the "full" run and would return its program
        run("nokernel", cg_steps=7, nokernel=True)
        run("einsum", use_pallas=False)


if __name__ == "__main__":
    main()
