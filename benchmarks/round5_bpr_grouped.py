"""Round-5 BPR epoch measurement: classic sampled vs user-grouped epochs.

VERDICT r4 item 2: the classic epoch's accounted floor is ~2.45 s at
last.fm shape / f=128 (scatters 43% of the wall; the engine is per-index
bound). The grouped epoch (models/bpr.py BPR_GROUPED) attacks the INDEX
COUNT: positives stream from resident chunk tensors (no sample-index
gathers), user rows touch ~2*n_users indexed ops per epoch instead of
~2*nnz, and mode 2 additionally window-slices negatives from a pre-shuffled
popularity snapshot (ids + factors + biases arrive as DMAs, not gathers).

Target: >=1.5x samples/s with quality parity (checked separately by
tests/test_bpr.py and the bench quality gate).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_bpr_grouped.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

import implicit_tpu.models.bpr as bprmod
from implicit_tpu.bpr import BayesianPersonalizedRanking
from implicit_tpu.datasets.synthetic import generate_synthetic

USERS, ITEMS, NNZ = 360_000, 160_000, 17_500_000


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    nnz = Cui.nnz

    results = {}
    for label, mode in (("classic", 0), ("grouped", 1), ("grouped+pool", 2),
                        ("grouped+poolids", 3)):
        bprmod.BPR_GROUPED = mode
        times, stats = [], []
        model = BayesianPersonalizedRanking(factors=128, iterations=4,
                                            random_state=1)
        t0 = time.time()
        model.fit(Cui, show_progress=False,
                  callback=lambda e, t, c, s: (times.append(t),
                                               stats.append((c, s))))
        best = min(times[1:])
        results[label] = best
        c, s = stats[-1]
        total = nnz
        print(f"{label:14s} best={best:.3f}s/epoch "
              f"({nnz/best/1e6:.2f}M samples/s) fit_wall={time.time()-t0:.1f}s "
              f"train_auc={100*c/max(total-s,1):.2f}% skipped={100*s/total:.2f}%",
              flush=True)

    base = results.get("classic")
    for label, v in results.items():
        print(f"{label}: {base/v:.2f}x vs classic", flush=True)


if __name__ == "__main__":
    main()
