"""Round-5: int8 gather table at wide F — speed and quality.

Follow-up to round5_vmem_promo.py: if the F>=192 wall is the gather table
outgrowing the VMEM promotion boundary (176MB bf16 at 360k x 256), an int8
per-row-scaled copy (88MB + 0.7MB scales) fits back under it. This probe
measures, at the production last.fm shape:

1. s/iter for the full ALS iteration at F=256, bf16 gathers vs int8 gathers
   (both sides quantized — the user side's item table already fits at 82MB,
   so the win should be item-side dominated);
2. end-to-end quality through the public model on the clustered synthetic
   gate (p@10, int8 vs bf16) at F=128.

Usage: python benchmarks/round5_int8_gather.py
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

    for F in (256, 192, 128):
        target = als_chunk_target(F, "bfloat16")
        ub = BucketedCSR(Cui, target_entries=target, max_chunk_rows=65536).to_device()
        ib = BucketedCSR(Ciu, target_entries=target, max_chunk_rows=65536).to_device()
        X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
        Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
        sync(X0), sync(Y0)

        for quant in (False, True):
            def one_iter():
                X, Y = X0 + 0.0, Y0 + 0.0
                sync(X), sync(Y)
                t0 = time.time()
                X = als_ops.solve_side(X, Y, ub, 0.01, cg_steps=3,
                                       compute_dtype="bfloat16",
                                       use_pallas=True, gather_quant=quant)
                Y = als_ops.solve_side(Y, X, ib, 0.01, cg_steps=3,
                                       compute_dtype="bfloat16",
                                       use_pallas=True, gather_quant=quant)
                sync(X), sync(Y)
                return time.time() - t0

            one_iter()  # compile
            best = min(one_iter() for _ in range(3))
            print(f"F={F} gather={'int8' if quant else 'bf16'} "
                  f"{best:.4f} s/iter", flush=True)


if __name__ == "__main__":
    main()
