"""ALS benchmark harness: speed and loss convergence across solver configs.

Analogue of /root/reference/benchmarks/benchmark_als.py (which compares CG
step counts vs Cholesky vs GPU): compares the CG and Cholesky solvers and the
float32 vs bfloat16 compute modes on last.fm-360k-scale data, reporting
seconds/iteration and the training-loss trajectory.

Run: python benchmarks/benchmark_als.py [--factors 128] [--iterations 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# allow running as `python benchmarks/benchmark_als.py` from a source checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def benchmark(factors, iterations, users, items, nnz, configs):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    from implicit_tpu.datasets.synthetic import generate_synthetic
    from implicit_tpu.ops import als as als_ops
    from implicit_tpu.sparse import BucketedCSR

    Cui = generate_synthetic(users, items, nnz, seed=0)
    Ciu = Cui.T.tocsr()
    ub = BucketedCSR(Cui).to_device()
    ib = BucketedCSR(Ciu).to_device()

    rng = np.random.default_rng(42)
    X0 = rng.random((users, factors), dtype=np.float32) * 0.01
    Y0 = rng.random((items, factors), dtype=np.float32) * 0.01

    results = {}
    for name, kwargs in configs.items():
        X = jnp.asarray(X0)
        Y = jnp.asarray(Y0)
        # warmup/compile
        X, Y = als_ops.fit(X, Y, ub, ib, 0.01, iterations=1, **kwargs)
        float(jnp.sum(X))

        losses = []
        X = jnp.asarray(X0)
        Y = jnp.asarray(Y0)
        start = time.time()
        for _ in range(iterations):
            X, Y = als_ops.fit(X, Y, ub, ib, 0.01, iterations=1, **kwargs)
            losses.append(round(als_ops.calculate_loss_bucketed(ub, X, Y, 0.01), 6))
        elapsed = time.time() - start

        results[name] = {
            "s_per_iter_with_loss": round(elapsed / iterations, 4),
            "loss_trajectory": losses,
        }
        print(name, results[name], flush=True)

    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--factors", type=int, default=128)
    parser.add_argument("--iterations", type=int, default=5)
    parser.add_argument("--users", type=int, default=360_000)
    parser.add_argument("--items", type=int, default=160_000)
    parser.add_argument("--nnz", type=int, default=17_500_000)
    parser.add_argument("--output", type=str, default="benchmark_als.json")
    args = parser.parse_args()

    configs = {
        "cg_f32": {"use_cg": True, "compute_dtype": "float32"},
        "cg_bf16": {"use_cg": True, "compute_dtype": "bfloat16"},
        "cholesky_f32": {"use_cg": False, "compute_dtype": "float32"},
    }
    results = benchmark(
        args.factors, args.iterations, args.users, args.items, args.nnz, configs
    )
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
