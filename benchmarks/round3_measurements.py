"""Round-3 TPU measurement batch: run when the compile service is healthy.

Measures, in one process (back-to-back, so transport variance cancels):
  1. BPR epoch: split-table default vs unified-factor-buffer variant
     (models/bpr.py BPR_FUSED_BUFFER) at last.fm shape, f=128.
  2. Serving GEMM dtype: f32 vs bf16 table end-to-end recommend throughput
     at batch 8192 / 160k items.
  3. topk_streaming sanity at catalog scale (throughput is transport-bound
     through the dev tunnel; correctness + wall recorded for the record).

Each stage is independently guarded; output is one JSON line per stage so
a hung stage costs only itself (run under `timeout`). Decision rules are
printed at the end: flip BPR_FUSED_BUFFER default if fused is >=3% faster.
"""

import json
import sys
import time

import numpy as np


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(json.dumps({"stage": name, "result": out,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
        return out
    except Exception as exc:
        print(json.dumps({"stage": name, "error": f"{type(exc).__name__}: {exc}"}),
              flush=True)
        return None


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(json.dumps({"stage": "devices", "result": str(jax.devices())}), flush=True)

    sys.path.insert(0, "/root/repo")
    import bench
    from implicit_tpu.bpr import BayesianPersonalizedRanking
    from implicit_tpu.datasets.synthetic import generate_synthetic

    Cui = generate_synthetic(bench.USERS, bench.ITEMS, bench.NNZ, seed=0)

    import implicit_tpu.models.bpr as bprmod

    def bpr_split():
        bprmod.BPR_FUSED_BUFFER = 0
        return bench.bench_sgd_epochs(
            BayesianPersonalizedRanking, Cui, factors=128, random_state=1)

    def bpr_fused():
        bprmod.BPR_FUSED_BUFFER = 1
        return bench.bench_sgd_epochs(
            BayesianPersonalizedRanking, Cui, factors=128, random_state=1)

    split_s = stage("bpr_split_s_per_epoch", bpr_split)
    fused_s = stage("bpr_fused_s_per_epoch", bpr_fused)
    # interleave once more to cancel drift
    split2 = stage("bpr_split_repeat", bpr_split)
    fused2 = stage("bpr_fused_repeat", bpr_fused)
    bprmod.BPR_FUSED_BUFFER = 0

    f32 = stage("serving8k_f32_users_per_s", lambda: bench.bench_serving(
        Cui, batch=8192, n_batches=4))
    bf16 = stage("serving8k_bf16_users_per_s", lambda: bench.bench_serving(
        Cui, batch=8192, n_batches=4, dtype=np.float16))

    def streaming_sanity():
        from implicit_tpu.ops.topk import topk, topk_streaming

        rng = np.random.default_rng(3)
        items = rng.standard_normal((bench.ITEMS, 128), dtype=np.float32)
        q = rng.standard_normal((1024, 128), dtype=np.float32)
        t0 = time.time()
        ids_s, _ = topk_streaming(items, q, 10)
        wall = time.time() - t0
        ids_r, _ = topk(items, q, 10)
        agree = float(np.mean([len(np.intersect1d(a, b)) / 10
                               for a, b in zip(ids_s, ids_r)]))
        return {"wall_s": round(wall, 2), "agreement": agree}

    stage("topk_streaming_sanity", streaming_sanity)

    if split_s and fused_s:
        best_split = min(x for x in (split_s, split2) if x)
        best_fused = min(x for x in (fused_s, fused2) if x)
        verdict = "FLIP DEFAULT to fused" if best_fused < 0.97 * best_split \
            else "keep split default"
        print(json.dumps({"stage": "decision",
                          "bpr_split_best": round(best_split, 3),
                          "bpr_fused_best": round(best_fused, 3),
                          "verdict": verdict}), flush=True)


if __name__ == "__main__":
    main()
