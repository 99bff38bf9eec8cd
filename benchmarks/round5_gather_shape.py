"""Round-5 probe: why do fit-shaped gathers lose their locality win at F=256?

round5_item256_decomp isolated the item-side F=256 blowup to the gather+scan
skeleton itself (nokernel variant: 0.117s -> 0.328s), yet uniform-random
bare gathers barely degrade (10.75 -> 12.04 ns/row, round5_gather_cliff).
The delta is the index distribution: the fit gathers power-law column ids
(sorted within rows, heavy duplicates) and achieves ~6 ns/row at F=128 —
the locality win disappears at F=256.

Discriminators, each timed as a scan inside ONE dispatch over REAL bucketed
indices from the last.fm-shaped item side:

  real/shuffled      locality effect per width
  f32-128 vs bf16-256  same 512-byte rows, 128 vs 256 lanes: is the cost
                     per-byte or per-lane-tile?
  split-F            two (N, 128) half-tables, same indices: two 1-tile
                     gathers vs one 2-tile gather
  barrier            jax.lax.optimization_barrier forces the gathered block
                     to materialize (the production pattern: the block
                     feeds a pallas_call input in HBM)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_gather_shape.py
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
from implicit_tpu.sparse import BucketedCSR

USERS, ITEMS, NNZ = 360_000, 160_000, 17_500_000
STEPS = 8


def sync(x):
    return float(jnp.sum(x))


def timed(fn, reps=3):
    fn()
    return min(
        (lambda t0: (fn(), time.time() - t0)[1])(time.time())
        for _ in range(reps)
    )


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()
    ib = BucketedCSR(Ciu, target_entries=1 << 24, max_chunk_rows=65536)

    # the 6 biggest item-side classes by padded nnz (gathers of USER rows)
    classes = sorted(ib.classes, key=lambda c: -c.rows.shape[1] * c.L)[:6]
    rng = np.random.default_rng(0)

    for cls in classes:
        idx_real = np.asarray(cls.indices[0])  # (C, L) int32, fit order
        C, L = idx_real.shape
        idx_shuf = rng.integers(0, USERS, (C, L), dtype=np.int32)
        n = C * L * STEPS

        for tag, dt_, F in (("bf16-128", jnp.bfloat16, 128),
                            ("bf16-256", jnp.bfloat16, 256),
                            ("f32-128 ", jnp.float32, 128)):
            tab = jnp.asarray(rng.standard_normal((USERS, F)).astype(np.float32),
                              dtype=dt_)
            halves = (jnp.asarray(tab[:, :F // 2]), jnp.asarray(tab[:, F // 2:]))
            sync(tab.astype(jnp.float32))
            for h in halves:
                sync(h.astype(jnp.float32))
            row = {}
            for iname, idx0 in (("real", idx_real), ("shuf", idx_shuf)):
                idx = jnp.asarray(idx0)

                @jax.jit
                def g(tab=tab, idx=idx):
                    def step(i, acc):
                        yu = tab[(idx + i) % USERS]
                        yu = jax.lax.optimization_barrier(yu)
                        return acc + yu[0, 0, :].astype(jnp.float32)
                    return jax.lax.fori_loop(0, STEPS, step, jnp.zeros(F))

                row[iname] = timed(lambda: sync(g()))

                if iname == "real":
                    @jax.jit
                    def gs(halves=halves, idx=idx):
                        def step(i, acc):
                            ix = (idx + i) % USERS
                            a = jax.lax.optimization_barrier(halves[0][ix])
                            b = jax.lax.optimization_barrier(halves[1][ix])
                            return (acc + a[0, 0, :].astype(jnp.float32)
                                    + b[0, 0, :].astype(jnp.float32))
                        return jax.lax.fori_loop(0, STEPS, step,
                                                 jnp.zeros(F // 2))

                    row["split"] = timed(lambda: sync(gs()))

            print(f"[shape] C={C:6d} L={L:5d} {tag}: ns/row "
                  f"real={row['real'] / n * 1e9:6.2f} "
                  f"shuf={row['shuf'] / n * 1e9:6.2f} "
                  f"split={row['split'] / n * 1e9:6.2f}", flush=True)


if __name__ == "__main__":
    main()
