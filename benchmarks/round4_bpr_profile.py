"""Round-4 BPR floor measurement: component-isolated step timings on the TPU.

VERDICT r3 item 2: the epoch (2.62 s at last.fm shape f=128) sits ~2x above
the round-2 analytic floor (1.3 s), and the fused Pallas epoch was rejected
by analysis, not measurement. This script produces the measurements:

  1. per-component timings of ONE epoch step at the real shapes — RNG,
     cuckoo verification, each gather, the elementwise math, each
     scatter-add, the bias ops — so the "is the indexed-row engine
     saturated?" question gets a recorded answer;
  2. a Pallas per-row-DMA gather microbenchmark at the same shape, giving a
     measured number for the "a kernel's per-row DMA issue cost is 1-2
     orders worse than the gather engine" claim (DESIGN.md round-3
     analysis);
  3. the full epoch, re-measured, and samples/s in reference-comparable
     units (reference posture: bpr.cu:17-70 processes one sample per CUDA
     block, one epoch = nnz samples).

Results recorded in STATUS.md / DESIGN.md; bench.py gains
``bpr_samples_per_s`` either way.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from implicit_tpu.datasets.synthetic import generate_synthetic  # noqa: E402
from implicit_tpu.models import bpr as bpr_mod  # noqa: E402
from implicit_tpu.ops import membership  # noqa: E402

USERS, ITEMS, NNZ, F = 360_000, 160_000, 17_500_000, 128
BATCH = 65536
REPS = 30


def timeit(fn, reps=REPS):
    fn()  # compile + warm
    fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main():
    print("device:", jax.devices()[0], flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=3)
    Cui.sort_indices()
    nnz = Cui.nnz
    user_counts = np.ediff1d(Cui.indptr)
    userids_h = np.repeat(np.arange(USERS, dtype=np.int32), user_counts)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((USERS, F), dtype=np.float32))
    Y = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32))
    yb = jnp.asarray(rng.random(ITEMS, dtype=np.float32))
    uids = jnp.asarray(userids_h)
    iids = jnp.asarray(Cui.indices, dtype=jnp.int32)

    pt = membership.build_pair_table(Cui, row_ids=userids_h)
    mh = (pt.a_bits, pt.b_bits, pt.bucket_bits)
    table = jnp.asarray(pt.table)

    key = jax.random.PRNGKey(0)
    steps = max(1, -(-nnz // BATCH))
    print(f"nnz={nnz} steps/epoch={steps} batch={BATCH}", flush=True)

    # fixed sample index batches (device-resident) for component isolation
    k1, k2 = jax.random.split(key)
    liked_idx = jax.random.randint(k1, (BATCH,), 0, nnz)
    disliked_idx = jax.random.randint(k2, (BATCH,), 0, nnz)
    u = jnp.asarray(np.asarray(uids)[np.asarray(liked_idx)])
    liked = jnp.asarray(np.asarray(iids)[np.asarray(liked_idx)])
    disliked = jnp.asarray(np.asarray(iids)[np.asarray(disliked_idx)])
    zv = jnp.asarray(rng.random(BATCH, dtype=np.float32))

    sync = lambda x: jax.block_until_ready(x)  # noqa: E731

    # --- components ---------------------------------------------------
    @jax.jit
    def c_rng(k):
        k1, k2 = jax.random.split(k)
        a = jax.random.randint(k1, (BATCH,), 0, nnz)
        b = jax.random.randint(k2, (BATCH,), 0, nnz)
        return a, b

    @jax.jit
    def c_sample_gathers(li, di):
        return uids[li], iids[li], iids[di]

    @jax.jit
    def c_verify(u, d):
        return membership._member(table, u, d, *mh, jnp)

    @jax.jit
    def c_gather1(idx):
        return X[idx]

    @jax.jit
    def c_gather3(u, l, d):
        return X[u], Y[l], Y[d]

    @jax.jit
    def c_bias_gather2(l, d):
        return yb[l], yb[d]

    @jax.jit
    def c_math(xu, yl, yd, bl, bd):
        score = jnp.sum(xu * (yl - yd), axis=1) + bl - bd
        z = 1.0 / (1.0 + jnp.exp(score))
        scale = jnp.where(z > 0, 0.01, 0.0)
        dx = z[:, None] * (yl - yd) - 0.01 * xu
        dyl = z[:, None] * xu - 0.01 * yl
        dyd = -z[:, None] * xu - 0.01 * yd
        return (scale[:, None] * dx, scale[:, None] * dyl,
                scale[:, None] * dyd, scale * z, scale * (-z))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def c_scatter1(Xd, idx, upd):
        return Xd.at[idx].add(upd)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def c_scatter3(Xd, Yd, u, l, d, dx, dyl, dyd):
        return Xd.at[u].add(dx), Yd.at[l].add(dyl).at[d].add(dyd)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def c_bias_scatter2(ybd, l, d, a, b):
        return ybd.at[l].add(a).at[d].add(b)

    xu, yl, yd = c_gather3(u, liked, disliked)
    bl, bd = c_bias_gather2(liked, disliked)
    dx, dyl, dyd, ba, bb = c_math(xu, yl, yd, bl, bd)
    sync((xu, dx, ba))

    t = {}
    t["rng"] = timeit(lambda: sync(c_rng(key)))
    t["sample_gathers"] = timeit(lambda: sync(c_sample_gathers(liked_idx, disliked_idx)))
    t["verify_cuckoo"] = timeit(lambda: sync(c_verify(u, disliked)))
    t["gather_X[u]"] = timeit(lambda: sync(c_gather1(u)))
    t["gather3_rows"] = timeit(lambda: sync(c_gather3(u, liked, disliked)))
    t["bias_gather2"] = timeit(lambda: sync(c_bias_gather2(liked, disliked)))
    t["math"] = timeit(lambda: sync(c_math(xu, yl, yd, bl, bd)))

    def scat1():
        nonlocal X
        X = c_scatter1(X, u, dx)
        sync(X)
    t["scatter1_rows"] = timeit(scat1)

    def scat3():
        nonlocal X, Y
        X, Y = c_scatter3(X, Y, u, liked, disliked, dx, dyl, dyd)
        sync(X)
    t["scatter3_rows"] = timeit(scat3)

    def bscat():
        nonlocal yb
        yb = c_bias_scatter2(yb, liked, disliked, ba, bb)
        sync(yb)
    t["bias_scatter2"] = timeit(bscat)

    comp_sum = (t["rng"] + t["sample_gathers"] + t["verify_cuckoo"]
                + t["gather3_rows"] + t["bias_gather2"] + t["math"]
                + t["scatter3_rows"] + t["bias_scatter2"])
    for k, v in t.items():
        print(f"{k:18s} {v*1e3:8.3f} ms  ({v/BATCH*1e9:6.2f} ns/sample)", flush=True)
    print(f"components sum     {comp_sum*1e3:8.3f} ms/step -> "
          f"{comp_sum*steps:6.3f} s/epoch-equivalent", flush=True)

    # --- full epoch (the real program, donated chain) -------------------
    bisect_iters = int(np.ceil(np.log2(max(int(user_counts.max()), 2)))) + 1
    Xe = jnp.asarray(rng.random((USERS, F), dtype=np.float32))
    Ye = jnp.asarray(rng.random((ITEMS, F), dtype=np.float32))
    ybe = jnp.asarray(rng.random(ITEMS, dtype=np.float32))
    indptr = jnp.asarray(Cui.indptr, dtype=jnp.int32)

    def epoch():
        nonlocal Xe, Ye, ybe
        Xe, Ye, ybe, c, s = bpr_mod._bpr_epoch(
            Xe, Ye, ybe, uids, iids, indptr, table, key,
            jnp.float32(0.01), jnp.float32(0.01),
            steps, BATCH, True, bisect_iters, mh, 0)
        sync(Xe)

    ep = timeit(epoch, reps=5)
    print(f"full epoch         {ep:8.3f} s  ({nnz/ep/1e6:.2f} M samples/s; "
          f"per-step {ep/steps*1e3:.3f} ms vs components {comp_sum*1e3:.3f})",
          flush=True)

    # --- Pallas per-row-DMA gather microbenchmark ----------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 256  # rows per grid step
    n_groups = BATCH // G

    def dma_gather_kernel(idx_ref, hbm_ref, out_ref, sem):
        g = pl.program_id(0)
        base = g * G

        def dma(i):
            return pltpu.make_async_copy(
                hbm_ref.at[idx_ref[base + i]], out_ref.at[i], sem.at[i % 8])

        # 8-deep rolling window: issue i, retire i-8 (double-buffered rows)
        def body(i, _):
            dma(i).start()

            @pl.when(i >= 8)
            def _():
                dma(i - 8).wait()

            return 0

        jax.lax.fori_loop(0, G, body, 0)

        def drain(i, _):
            dma(G - 8 + i).wait()
            return 0

        jax.lax.fori_loop(0, 8, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((G, F), lambda g, idx: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
    )

    @jax.jit
    def pallas_gather(idx, tab):
        return pl.pallas_call(
            dma_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((G, F), jnp.float32),
            grid_spec=grid_spec,
        )(idx, tab)

    try:
        tp = timeit(lambda: sync(pallas_gather(u, X)), reps=10)
        per_row = tp / BATCH * 1e9
        print(f"pallas DMA gather  {tp*1e3:8.3f} ms for {BATCH} rows "
              f"({per_row:6.2f} ns/row vs XLA gather "
              f"{t['gather_X[u]']/BATCH*1e9:.2f} ns/row incl. 3 engines)",
              flush=True)
    except Exception as e:  # pragma: no cover - measurement probe
        print("pallas DMA gather FAILED:", repr(e), flush=True)


if __name__ == "__main__":
    main()
