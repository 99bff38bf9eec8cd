"""Round-4 probe: is the Mosaic-inside-shard_map penalty real on this stack?

Round 3 recorded (v5e, last.fm shape, f=128 bf16, mesh=1): no-mesh Pallas
0.295 s/iter, shard_map Pallas 0.738, shard_map einsum 0.414 — and the
sharded path therefore defaulted to einsum. This re-measures all four cells
with uploads excluded from the timed region (X/Y live on device, donated
chains re-seeded by a device-side copy), plus per-component shard_map/no-mesh
ratios. Round-4 result: NO penalty — see STATUS.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from implicit_tpu.datasets.synthetic import generate_synthetic  # noqa: E402
from implicit_tpu.ops import als as als_ops  # noqa: E402
from implicit_tpu.parallel import als_sharded  # noqa: E402
from implicit_tpu.sparse import pack_pair_on_device  # noqa: E402

USERS, ITEMS, NNZ, F = 360_000, 160_000, 17_500_000, 128
CDT = "bfloat16"
ITERS = 3  # timed iterations per measurement
REPS = 3   # best-of


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, n=REPS):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    mesh = Mesh(np.array([dev]), ("d",))

    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=3)
    Ciu = Cui.T.tocsr()
    rng = np.random.default_rng(0)
    X0 = rng.random((USERS, F), dtype=np.float32) * 0.01
    Y0 = rng.random((ITEMS, F), dtype=np.float32) * 0.01

    target = int(np.clip((4 << 30) // (F * 2), 1 << 21, 1 << 24))
    ub, ib = pack_pair_on_device(Cui, Ciu, target_entries=target,
                                 max_chunk_rows=65536, grid="pow2",
                                 data_dtype=np.float32)
    print("classes (user):", sorted(c.L for c in ub.to_device().classes)
          if hasattr(ub, "to_device") else sorted(c.L for c in ub.classes),
          flush=True)

    # device-resident factors, OUTSIDE timed regions
    Xd = jnp.asarray(X0)
    Yd = jnp.asarray(Y0)
    sync(Xd), sync(Yd)

    def run_fit(use_pallas):
        X, Y = als_ops.fit(Xd + 0.0, Yd + 0.0, ub, ib, 0.01, ITERS, True, 3,
                           CDT, use_pallas=use_pallas)
        sync(X)

    run_fit(True); run_fit(False)  # compile
    print("fitP ", round(timeit(lambda: run_fit(True)) / ITERS, 4), flush=True)
    print("fitE ", round(timeit(lambda: run_fit(False)) / ITERS, 4), flush=True)

    D = 1
    ush = als_sharded.RowShardedBuckets(Cui, mesh, "d", target, 65536, 8,
                                        "pow2", np.float32)
    ish = als_sharded.RowShardedBuckets(Ciu, mesh, "d", target, 65536, 8,
                                        "pow2", np.float32)
    shd = NamedSharding(mesh, P("d", None))
    Xp = jax.device_put(als_sharded.permute_rows(X0, D, ush.block), shd)
    Yp = jax.device_put(als_sharded.permute_rows(Y0, D, ish.block), shd)
    sync(Xp), sync(Yp)

    def run_shd(use_pallas):
        X, Y = als_sharded.fit(Xp + 0.0, Yp + 0.0, ush, ish, mesh, 0.01,
                               ITERS, "d", True, 3, CDT,
                               use_pallas=use_pallas)
        sync(X)

    run_shd(True); run_shd(False)
    print("shdP ", round(timeit(lambda: run_shd(True)) / ITERS, 4), flush=True)
    print("shdE ", round(timeit(lambda: run_shd(False)) / ITERS, 4), flush=True)


if __name__ == "__main__":
    main()
