"""Headline benchmark: ALS training time per iteration, last.fm-360k scale, f=128.

Reference baseline (BASELINE.md): 0.389 s/iteration on an NVIDIA A6000
(implicit's CUDA build, factors=128, last.fm-360k = 360k users x 160k items,
~17M nonzeros). The real dataset can't be downloaded here (zero egress), so an
equivalently-shaped synthetic matrix is used: same user/item counts, same nnz,
power-law item popularity — the compute cost of an ALS iteration depends only
on these statistics, not the values.

Prints one JSON line:
    {"metric": ..., "value": seconds_per_iteration, "unit": "s/iter",
     "vs_baseline": baseline_seconds / measured_seconds}
so vs_baseline > 1 means faster than the reference GPU build.
"""

import json
import time

import numpy as np

USERS = 360_000
ITEMS = 160_000
NNZ = 17_500_000
FACTORS = 128
BASELINE_S_PER_ITER = 0.389  # reference CUDA on A6000, benchmarks/README.md:30-35


def synthetic_lastfm(users=USERS, items=ITEMS, nnz=NNZ, seed=0):
    """Synthetic play-count matrix with last.fm-like shape statistics."""
    from implicit_tpu.datasets.synthetic import generate_synthetic

    return generate_synthetic(users, items, nnz, seed=seed)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from implicit_tpu.ops import als as als_ops
    from implicit_tpu.sparse import BucketedCSR

    t0 = time.time()
    Cui = synthetic_lastfm()
    Ciu = Cui.T.tocsr()
    gen_s = time.time() - t0

    t0 = time.time()
    user_buckets = BucketedCSR(Cui).to_device()
    item_buckets = BucketedCSR(Ciu).to_device()
    prep_s = time.time() - t0

    rng = np.random.default_rng(42)
    X0 = jnp.asarray(rng.random((Cui.shape[0], FACTORS), dtype=np.float32) * 0.01)
    Y0 = jnp.asarray(rng.random((Cui.shape[1], FACTORS), dtype=np.float32) * 0.01)

    reg = 0.01
    # bfloat16 compute with f32 accumulation: converges to the same loss as
    # f32 (see benchmarks/benchmark_als.json trajectories) — the TPU-native
    # production configuration, analogous to the reference GPU's fp16 mode
    compute_dtype = "bfloat16"

    def sync(X):
        # fetch a scalar to the host: forces full completion of enqueued work
        # (block_until_ready alone is unreliable over remote transports)
        return float(jnp.sum(X))

    sync(X0), sync(Y0)
    iters = 5

    def run():
        # device-side copies: factor init/upload isn't part of an iteration
        X = X0 + 0.0
        Y = Y0 + 0.0
        sync(X)
        t0 = time.time()
        X, Y = als_ops.fit(
            X, Y, user_buckets, item_buckets, reg, iterations=iters,
            compute_dtype=compute_dtype,
        )
        sync(X)
        return (time.time() - t0) / iters

    # warmup / compile
    t0 = time.time()
    run()
    warm_s = time.time() - t0

    # timed: best of 3 (the shared transport adds session-level variance)
    s_per_iter = min(run() for _ in range(3))

    result = {
        "metric": "als_train_s_per_iter_lastfm360k_f128",
        "value": round(s_per_iter, 4),
        "unit": "s/iter",
        "vs_baseline": round(BASELINE_S_PER_ITER / s_per_iter, 3),
    }
    print(json.dumps(result))
    # context lines on stderr-ish (after the JSON line; drivers read line 1)
    import sys

    print(
        f"# nnz={Cui.nnz} gen={gen_s:.1f}s prep={prep_s:.1f}s "
        f"warmup(compile)={warm_s:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
