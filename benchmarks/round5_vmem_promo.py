"""Round-5 probe: the wide-factor ALS wall is VMEM promotion of the gather table.

The F=256 device trace (round5_f256_trace.py) shows the smoking gun in the
HLO layouts: at F=128 the gather source reads
``bf16[360000,128]{...S(1)}`` — XLA's memory-space assignment promoted the
88MB factor table into alternate memory (VMEM) — while at F=256 the 176MB
table has no ``S(1)`` and every gather runs at the HBM per-index rate.
Measured per-op: the 187 gather fusions cost 0.045s at F=128 (~2.6 ns/row)
vs 0.222s at F=256 (~12.7 ns/row, 4.9x for 2x the bytes) while the Pallas
kernels are width-independent (0.055 vs 0.060s). The same boundary explains
f32@F=128 (also 176MB, 0.356 s/iter) vs bf16@F=128 (88MB, 0.226).

This probe validates causality in the production structure: the real
``solve_side`` item-side half-iteration at fixed nnz and L-structure,
varying ONLY the gather-table row count across the promotion boundary
(table bytes = n_users * F * 2). If promotion is the mechanism, ns/row
drops ~4x once the table fits.

Usage: python benchmarks/round5_vmem_promo.py
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
from implicit_tpu.sparse import BucketedCSR, als_chunk_target

USERS, ITEMS, NNZ = 360_000, 160_000, 17_500_000


def sync(x):
    return float(jnp.sum(x))


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()
    rng = np.random.default_rng(0)

    for F in (256, 128):
        target = als_chunk_target(F, "bfloat16")
        for n_users in (150_000, 250_000, 360_000):
            # same indptr/data (identical L-structure and chunking); column
            # ids remapped into [0, n_users) — duplicate ids within a row are
            # fine for a timing probe, the gather engine sees the same index
            # stream statistics, only the TABLE SIZE changes
            C2 = Ciu.copy()
            C2.indices = (Ciu.indices % n_users).astype(np.int32)
            C2._shape = (ITEMS, n_users)
            dib = BucketedCSR(C2, target_entries=target,
                              max_chunk_rows=65536).to_device()

            Y = jnp.asarray(rng.random((n_users, F), dtype=np.float32) * 0.01)
            X0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
            sync(Y), sync(X0)
            table_mb = n_users * F * 2 / 1e6

            def one():
                X = X0 + 0.0
                sync(X)
                t0 = time.time()
                X = als_ops.solve_side(X, Y, dib, 0.01, cg_steps=3,
                                       compute_dtype="bfloat16",
                                       use_pallas=True)
                sync(X)
                return time.time() - t0

            one()  # compile
            best = min(one() for _ in range(3))
            print(f"F={F} n_users={n_users:7d} table={table_mb:6.1f}MB "
                  f"item-half-iter={best:.4f}s "
                  f"({best / NNZ * 1e9:.2f} ns/gathered-row incl. solves)",
                  flush=True)


if __name__ == "__main__":
    main()
