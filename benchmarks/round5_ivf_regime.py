"""Round-5 probe: does IVF ever beat exact serving? (VERDICT r4 item 6)

Every measured configuration so far (160k-1M items) had exact brute-force
winning: the MXU makes dense scoring nearly free and the tunnel round-trip
dominates single queries. The untested claim is the big-catalog regime —
here 5M x 128 (2.56GB f32, still device-resident; the honest IVF-flat
memory story is that the index is the SAME size as the exact table, so IVF
never unlocks residency exact can't have — its lever is compute/HBM per
query at small batch, where exact cannot amortize its full-table pass).

Rows measured back-to-back in one process, device-resident tables:
  - exact ops.topk at batch 64 / 256 / 1024 (users/s; batch-64 is the
    regime IVF should win: a full 2.56GB table pass per 64 queries)
  - IVF (n_clusters=2048) at n_probe in {4, 8, 16, 32}: users/s +
    recall@10 vs the exact ids on identical queries
  - exact topk_streaming from a host-resident table (the beyond-budget
    regime's floor, for context)

Data is clustered (2048-center mixture), not uniform: IVF recall on
uniform data is meaninglessly flat, and real factor tables cluster.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_ivf_regime.py
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

from implicit_tpu.ann.ivf import _IVFIndex
from implicit_tpu.ops import topk as topk_ops

ITEMS = 5_000_000
F = 128
K = 10
N_CLUSTERS = 2048
N_CENTERS = 2048


def make_points(n, rng, centers):
    out = np.empty((n, F), dtype=np.float32)
    for s in range(0, n, 1 << 20):
        e = min(n, s + (1 << 20))
        ci = rng.integers(0, len(centers), e - s)
        out[s:e] = centers[ci] + 0.35 * rng.standard_normal(
            (e - s, F), dtype=np.float32)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((N_CENTERS, F), dtype=np.float32)
    t0 = time.time()
    points = make_points(ITEMS, rng, centers)
    queries = {b: centers[rng.integers(0, N_CENTERS, b)]
               + 0.35 * rng.standard_normal((b, F), dtype=np.float32)
               for b in (64, 256, 1024)}
    print(f"gen {time.time()-t0:.1f}s", flush=True)

    items_dev = jnp.asarray(points)
    float(jnp.sum(items_dev[0]))

    # ---- exact resident rows + ground truth ----
    exact_ids = {}
    for b, q in queries.items():
        qd = jnp.asarray(q)
        ids, _ = topk_ops.topk(items_dev, qd, K)  # warmup/compile
        exact_ids[b] = np.asarray(ids)
        reps = 5

        def run(qd=qd, reps=reps):
            t0 = time.time()
            for _ in range(reps):
                topk_ops.topk(items_dev, qd, K)
            return time.time() - t0

        dt = min(run() for _ in range(3))
        print(f"[exact] batch={b:5d} {b*reps/dt:8.0f} users/s "
              f"({dt/reps*1e3:.1f} ms/batch)", flush=True)

    # ---- IVF build ----
    t0 = time.time()
    index = _IVFIndex(points, N_CLUSTERS, kmeans_iters=10, seed=0)
    print(f"[ivf] build {time.time()-t0:.1f}s cap={index.cap} "
          f"(mean {ITEMS//N_CLUSTERS})", flush=True)

    for n_probe in (4, 8, 16, 32):
        for b, q in queries.items():
            ids, _ = index.search_batch(q, K, n_probe)  # warmup/compile
            hits = np.mean([
                len(set(ids[r]) & set(exact_ids[b][r])) / K
                for r in range(b)])
            reps = 5

            def run(q=q, n_probe=n_probe, reps=reps):
                t0 = time.time()
                for _ in range(reps):
                    index.search_batch(q, K, n_probe)
                return time.time() - t0

            dt = min(run() for _ in range(3))
            print(f"[ivf]   batch={b:5d} n_probe={n_probe:2d} "
                  f"{b*reps/dt:8.0f} users/s ({dt/reps*1e3:.1f} ms/batch) "
                  f"recall@10={hits:.3f}", flush=True)

    # ---- streamed exact from host (beyond-budget floor, one batch size) ----
    del items_dev
    b, q = 1024, queries[1024]
    ids, _ = topk_ops.topk_streaming(points, q, K)
    agree = np.mean([
        len(set(np.asarray(ids)[r]) & set(exact_ids[b][r])) / K
        for r in range(b)])
    t0 = time.time()
    topk_ops.topk_streaming(points, q, K)
    dt = time.time() - t0
    print(f"[stream] batch={b} {b/dt:8.0f} users/s agreement={agree:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
