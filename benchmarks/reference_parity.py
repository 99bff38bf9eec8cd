"""Measured head-to-head vs the reference's own ALS implementation.

Runs the reference package's pure-numpy ALS (use_native=False — its compiled
Cython kernels cannot be built here: no Cython, zero network) and this
framework on identical data/init, reporting per-iteration time and ranking
agreement. The pure-Python solver is documented by the reference itself as
"at least 10 times slower than the cython version"
(/root/reference/implicit/cpu/als.py:484-485), so the published i7-7820X
numbers in BASELINE.md remain the compiled-CPU perf baseline; this script's
value is the *numerical* head-to-head at a scale the tests don't reach.

Usage: python benchmarks/reference_parity.py [--users 2000 --items 800]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
from test_reference_parity import _load_reference_als, _paired_models, _random_likes  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--users", type=int, default=2000)
    parser.add_argument("--items", type=int, default=800)
    parser.add_argument("--factors", type=int, default=64)
    parser.add_argument("--iterations", type=int, default=5)
    args = parser.parse_args()

    _load_reference_als()
    likes = _random_likes(args.users, args.items, 0.02, seed=1)
    ref, ours = _paired_models(args.factors, 0.01, True, args.iterations,
                               args.users, args.items)

    t0 = time.time()
    ref.fit(likes, show_progress=False)
    ref_s = (time.time() - t0) / args.iterations

    from jax import enable_x64
    with enable_x64():
        t0 = time.time()
        ours.fit(likes, show_progress=False)
        our_s = (time.time() - t0) / args.iterations

    du = np.abs(ours.user_factors - ref.user_factors).max()
    di = np.abs(ours.item_factors - ref.item_factors).max()

    userids = np.arange(args.users)
    ref_ids, _ = ref.recommend(userids, likes, N=10)
    our_ids, _ = ours.recommend(userids, likes, N=10)
    agree = float((ref_ids == our_ids).mean())

    print({
        "shape": [args.users, args.items], "factors": args.factors,
        "reference_purepy_s_per_iter": round(ref_s, 3),
        "ours_s_per_iter_cold_cpu": round(our_s, 3),
        "max_factor_delta_user": float(du), "max_factor_delta_item": float(di),
        "top10_id_agreement": agree,
    })


if __name__ == "__main__":
    main()
