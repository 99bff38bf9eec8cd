"""Round-5 probe: chunk-size (gathered-block) sweep at F=128 vs F=256.

Hypothesis (closes the round5_item256_decomp vs round5_gather_shape
discrepancy): the F=256 "gather cliff" is a BUFFERING effect, not a gather
effect. bench.py and the decomp probes share target_entries=1<<24 buckets
across widths; a full long-L chunk then gathers a (C, L, F) block of
16.7M * F * 2 bytes = 4.3GB at F=128 but 8.6GB at F=256 — the latter
cannot double-buffer in 16GB HBM, so chunk i+1's gather cannot overlap
chunk i's solve on exactly the classes that carry most of the nnz. The
small-block classes (e.g. C=28704 x L=40 = 587MB) showed NO width cliff
(round5_gather_shape), consistent with this.

Sweeps target_entries over the full item-side half-iteration (production
solve, pallas kernels) at both widths. If the hypothesis holds, F=256
improves sharply once blocks shrink to ~<2GB while F=128 degrades only
mildly (round-3 measured 16M 7% faster than 2M at f=128).

Also prints the model's own policy point (models/als.py clips
4GB/(F*itemsize) to [1<<21, 1<<24]) — bench.py's shared 1<<24 buckets
do NOT match it at F=256.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_chunk_sweep.py
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
from implicit_tpu.sparse import BucketedCSR

USERS, ITEMS, NNZ = 360_000, 160_000, 17_500_000


def sync(x):
    return float(jnp.sum(x))


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()
    rng = np.random.default_rng(0)

    for F in (256, 128):
        Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
        X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
        sync(Y0), sync(X0)
        for te_log in (24, 23, 22, 21, 20):
            dib = BucketedCSR(Ciu, target_entries=1 << te_log,
                              max_chunk_rows=65536).to_device()
            padded = sum(
                int(np.prod(c.indices.shape)) for c in dib.classes)
            biggest = max(
                c.indices.shape[1] * c.indices.shape[2] for c in dib.classes)
            block_gb = biggest * F * 2 / (1 << 30)

            def one():
                Y = Y0 + 0.0
                sync(Y)
                t0 = time.time()
                Y = als_ops.solve_side(Y, X0, dib, 0.01, cg_steps=3,
                                       compute_dtype="bfloat16",
                                       use_pallas=True)
                sync(Y)
                return time.time() - t0

            one()  # compile
            dt = min(one() for _ in range(3))
            print(f"[sweep] F={F:3d} te=2^{te_log} padded={padded/1e6:6.1f}M "
                  f"maxblock={block_gb:5.2f}GB item-side={dt:.4f}s "
                  f"({dt / padded * 1e9:5.2f} ns/row)", flush=True)
            del dib


if __name__ == "__main__":
    main()
