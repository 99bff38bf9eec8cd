"""Round-5 probe: device-trace the real item-side half-iteration at F=128/256.

The microprobes disagree: the full skeleton (gather+scan+scatter, kernels
stubbed) runs at ~16ns/gathered-row at F=256 while a bare static gather of
the same class indices runs at ~8.8 (round5_gather_shape). Rather than
guess at the residual, capture the XLA device trace of the production
``solve_side`` and read the per-op durations directly.

Writes /tmp/trace_f{F}/ ; a plugin-free summarizer prints the top device
ops per width from the trace.json.gz event stream.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_f256_trace.py
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

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


def summarize(trace_dir, label):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"[{label}] no trace file found under {trace_dir}", flush=True)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    # keep only device-lane complete events (TPU op executions carry "run_id"
    # or sit on pids whose sort name mentions the device); fall back to all
    # complete events grouped by name.
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if name.startswith(("process_", "thread_")):
            continue
        durs[name] += ev.get("dur", 0) / 1e6
        counts[name] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:25]
    print(f"[{label}] top ops (s, count):", flush=True)
    for name, d in top:
        print(f"    {d:8.4f}s x{counts[name]:5d}  {name[:110]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()
    dib = BucketedCSR(Ciu, target_entries=1 << 24, max_chunk_rows=65536).to_device()
    rng = np.random.default_rng(0)

    for F in (128, 256):
        Y0 = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32) * 0.01)
        X0 = jnp.asarray(rng.random((USERS, F), dtype=np.float32) * 0.01)
        sync(Y0), sync(X0)

        def one():
            Y = Y0 + 0.0
            sync(Y)
            t0 = time.time()
            Y = als_ops.solve_side(Y, X0, dib, 0.01, cg_steps=3,
                                   compute_dtype="bfloat16", use_pallas=True)
            sync(Y)
            return time.time() - t0

        one()  # compile
        one()
        tdir = f"/tmp/trace_f{F}"
        with jax.profiler.trace(tdir):
            dt = one()
        print(f"[trace] F={F} half-iter {dt:.4f}s -> {tdir}", flush=True)
        summarize(tdir, f"F={F}")


if __name__ == "__main__":
    main()
