"""Round-5 probe: where does the wide-factor (F=256) ALS iteration go?

VERDICT r4 item 3: f=256 runs 0.451 s/iter vs 0.225 at f=128 — 2x wall for
2x factors on kernels whose per-row cost was measured ~F-independent, and
whose gathers are per-index bound (same index count at any F). Candidate
explanations measured here, back-to-back in ONE process (transport swings
~2x between sessions):

  A. raw gather cost: 512-byte rows (F=256 bf16) may cross from the
     per-index regime into per-byte — gather microbench at F=64..256
  B. dispatch shifts: _full_cg_max_l halves at F>128, pushing the
     512<L<=1024 classes from the tile-CG kernel to the gramian kernel —
     per-class nnz mass and per-class timing at both factor widths
  C. gramian-kernel throughput: per-row f32-cast + 8-row unrolled MXU
     dots — variants (bf16 build, BC=16)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_f256_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from implicit_tpu.datasets.synthetic import generate_synthetic
from implicit_tpu.ops import als as als_ops
from implicit_tpu.ops import pallas_ops
from implicit_tpu.sparse import BucketedCSR

USERS, ITEMS, NNZ = 360_000, 160_000, 17_500_000


def sync(x):
    return float(jnp.sum(x))


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()

    ub = BucketedCSR(Cui, target_entries=1 << 24, max_chunk_rows=65536)
    ib = BucketedCSR(Ciu, target_entries=1 << 24, max_chunk_rows=65536)

    # ---- B. class inventory: who goes where at F=128 vs F=256 ----
    for name, b in (("user", ub), ("item", ib)):
        print(f"[classes] {name} side:")
        for cls in b.classes:
            nnz_mass = int(np.sum(cls.lengths))
            rows = cls.n_chunks * cls.C
            for F in (128, 256):
                max_l = als_ops._full_cg_max_l("bfloat16", F)
                if cls.L <= max_l:
                    path = "tileCG"
                elif pallas_ops.gramian_tile_l(cls.L, F, 2):
                    path = "gramCG"
                else:
                    path = "einsum"
                if F == 128:
                    p128 = path
                else:
                    print(f"  L={cls.L:6d} C={cls.C:6d} chunks={cls.n_chunks:3d}"
                          f" rows~{rows:7d} nnz={nnz_mass:9d}"
                          f" F128->{p128} F256->{path}")
        print(flush=True)

    dub, dib = ub.to_device(), ib.to_device()

    # ---- A. gather microbench: 17.5M row gathers from the item table ----
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, ITEMS, 1 << 24, dtype=np.int32).reshape(256, 65536))
    for F in (64, 128, 192, 256):
        tab = jnp.asarray(rng.standard_normal((ITEMS, F)).astype(np.float32),
                          dtype=jnp.bfloat16)

        @jax.jit
        def g(tab=tab, idx=idx):
            def step(acc, ix):
                rows = tab[ix]
                return acc + jnp.sum(rows, dtype=jnp.float32), None
            acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
            return acc

        sync(g())
        dt = min(_timed(lambda: sync(g())) for _ in range(3))
        n = idx.size
        print(f"[gather] F={F:3d} bf16 rows/gather=64k total={n/1e6:.0f}M"
              f" wall={dt:.4f}s ns/row={dt/n*1e9:.2f}", flush=True)

    # ---- end-to-end s/iter at 128 and 256: carried-X scan vs end-scatter
    # (round-5 structural experiment: the carried form serializes chunk
    # i+1's gather behind chunk i's scatter; the end-scatter form leaves
    # every chunk's gather+solve independent for XLA to pipeline) ----
    results = {}
    for F in (128, 256):
        X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
        Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
        sync(X0), sync(Y0)
        for end_scatter in (1, 0):
            als_ops.ALS_END_SCATTER = end_scatter

            def run(F=F, X0=X0, Y0=Y0):
                X = X0 + 0.0
                Y = Y0 + 0.0
                sync(X)
                t0 = time.time()
                X, Y = als_ops.fit(X, Y, dub, dib, 0.01, iterations=5,
                                   compute_dtype="bfloat16")
                sync(X)
                return (time.time() - t0) / 5

            run()
            results[(F, end_scatter)] = min(run() for _ in range(3))
            print(f"[e2e] F={F} end_scatter={end_scatter} "
                  f"{results[(F, end_scatter)]:.4f} s/iter", flush=True)
    als_ops.ALS_END_SCATTER = 1

    # ---- per-side split at F=256 ----
    for F in (128, 256):
        X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
        Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
        for side, (A0, B0, bk) in (("user", (X0, Y0, dub)), ("item", (Y0, X0, dib))):
            def one(A0=A0, B0=B0, bk=bk):
                A = A0 + 0.0
                sync(A)
                t0 = time.time()
                A = als_ops.solve_side(A, B0, bk, 0.01, compute_dtype="bfloat16")
                sync(A)
                return time.time() - t0

            one()
            dt = min(one() for _ in range(3))
            print(f"[side] F={F} {side}: {dt:.4f}s", flush=True)

    # ---- C. per-class timing at F=256: tile-CG vs gramian classes ----
    F = 256
    X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
    Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
    YtY = als_ops.gramian(Y0, 0.01)
    Yb = Y0.astype(jnp.bfloat16)
    max_l = als_ops._full_cg_max_l("bfloat16", F)

    @jax.jit
    def tile_class(X, Yp, YtY, rows, idx, dat):
        return als_ops._cg_full_class(X, Yp, YtY, rows, idx, dat, 3)

    @jax.jit
    def gram_class(X, Yp, YtY, rows, idx, dat):
        return als_ops._long_row_class(X, Yp, YtY, rows, idx, dat, 3)

    for name, b, Xs, Ys in (("user", dub, X0, Yb),
                            ("item", dib, Y0, X0.astype(jnp.bfloat16))):
        YtYs = als_ops.gramian(Ys.astype(jnp.float32), 0.01)
        for cls in b.classes:
            L = cls.indices.shape[2]
            nnzc = cls.rows.shape[0] * cls.rows.shape[1] * L
            fn = tile_class if L <= max_l else (
                gram_class if pallas_ops.gramian_tile_l(L, F, 2) else None)
            if fn is None:
                print(f"[class] {name} L={L}: einsum path (skipped)")
                continue

            def one(fn=fn, Xs=Xs, Ys=Ys, YtYs=YtYs, cls=cls):
                X = Xs + 0.0
                sync(X)
                t0 = time.time()
                X = fn(X, Ys, YtYs, cls.rows, cls.indices, cls.data)
                sync(X)
                return time.time() - t0

            one()
            dt = min(one() for _ in range(3))
            path = "tileCG" if L <= max_l else "gramCG"
            print(f"[class] {name} L={L:6d} padded_nnz={nnzc/1e6:7.1f}M {path}"
                  f" {dt:.4f}s  ns/padded_row={dt/(nnzc/L)/max(1,1)*1e9/L:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
