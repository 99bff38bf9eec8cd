"""Round-4 BPR floor measurement, take 2: scan-amortized component timings.

The take-1 script timed each component as its own dispatch — and measured a
~30ms transport round-trip FLOOR on every call (a bare 2x randint costs
30.1ms; the real epoch's steps cost 9.28ms inside one dispatch), so
per-dispatch isolation is unusable on this transport. This version times
each component as a ``steps``-long ``lax.scan`` inside ONE dispatch —
exactly the structure of the real epoch — with fresh RNG-drawn indices per
step, and reports (variant - rng baseline) deltas.

Variants build up cumulatively to the full epoch so each increment prices
one component group:

  rng           : 2x randint(64k) per step
  +sample_idx   : + u/liked/disliked index gathers from the 18.3M flats
  +verify       : + cuckoo pair-table membership (the verified-negative op)
  +gather3      : + the three (64k, 128) factor-row gathers
  +bias+math    : + 4x (64k,) bias gathers + the score/grad arithmetic
  +scatter3+bias: + the three factor scatter-adds + 2 bias scatter-adds
                  (== the full epoch minus stats accumulation)
  epoch         : models/bpr.py _bpr_epoch as shipped

Also: the Pallas per-row-DMA gather, run scan-amortized the same way, to
put a measured number on the round-3 analysis claim that per-row DMA issue
cannot beat the XLA gather engine.
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
STEPS = 280  # one epoch's step count at last.fm shape


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0], flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=3)
    Cui.sort_indices()
    nnz = Cui.nnz
    user_counts = np.ediff1d(Cui.indptr)
    userids_h = np.repeat(np.arange(USERS, dtype=np.int32), user_counts)

    rng = np.random.default_rng(0)
    X0 = rng.random((USERS, F), dtype=np.float32)
    Y0 = rng.random((ITEMS, F), dtype=np.float32)
    yb0 = rng.random(ITEMS, dtype=np.float32)
    uids = jnp.asarray(userids_h)
    iids = jnp.asarray(Cui.indices, dtype=jnp.int32)

    pt = membership.build_pair_table(Cui, row_ids=userids_h)
    mh = (pt.a_bits, pt.b_bits, pt.bucket_bits)
    table = jnp.asarray(pt.table)
    key = jax.random.PRNGKey(0)
    print(f"nnz={nnz} steps={STEPS} batch={BATCH}", flush=True)

    lr = jnp.float32(0.01)
    reg = jnp.float32(0.01)

    def make_variant(level):
        """level: 0=rng 1=+sample_idx 2=+verify 3=+gather3 4=+bias+math
        5=+scatter3+bias (full update)."""

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                           static_argnames=())
        def run(X, Y, yb, k):
            def step(carry, subkey):
                X, Y, yb, acc = carry
                k1, k2 = jax.random.split(subkey)
                li = jax.random.randint(k1, (BATCH,), 0, nnz)
                di = jax.random.randint(k2, (BATCH,), 0, nnz)
                if level == 0:
                    return (X, Y, yb, acc + jnp.sum(li) + jnp.sum(di)), None
                u = uids[li]
                liked = iids[li]
                disliked = iids[di]
                if level == 1:
                    return (X, Y, yb,
                            acc + jnp.sum(u) + jnp.sum(liked) + jnp.sum(disliked)), None
                skip = membership._member(table, u, disliked, *mh, jnp)
                if level == 2:
                    return (X, Y, yb, acc + jnp.sum(skip.astype(jnp.int32))
                            + jnp.sum(u) + jnp.sum(liked) + jnp.sum(disliked)), None
                xu = X[u]
                yl = Y[liked]
                yd = Y[disliked]
                if level == 3:
                    s = jnp.sum(xu[:, 0] + yl[:, 0] + yd[:, 0])
                    return (X, Y, yb, acc + s.astype(jnp.int32)
                            + jnp.sum(skip.astype(jnp.int32))), None
                bl = yb[liked]
                bd = yb[disliked]
                score = jnp.sum(xu * (yl - yd), axis=1) + bl - bd
                z = 1.0 / (1.0 + jnp.exp(score))
                scale = jnp.where(~skip, lr, 0.0)
                dx = scale[:, None] * (z[:, None] * (yl - yd) - reg * xu)
                dyl = scale[:, None] * (z[:, None] * xu - reg * yl)
                dyd = scale[:, None] * (-z[:, None] * xu - reg * yd)
                ba = scale * (z - reg * bl)
                bb = scale * (-z - reg * bd)
                if level == 4:
                    s = jnp.sum(dx[:, 0] + dyl[:, 0] + dyd[:, 0] + ba + bb)
                    return (X, Y, yb, acc + s.astype(jnp.int32)), None
                X = X.at[u].add(dx)
                Y = Y.at[liked].add(dyl).at[disliked].add(dyd)
                yb = yb.at[liked].add(ba).at[disliked].add(bb)
                return (X, Y, yb, acc), None

            subkeys = jax.random.split(k, STEPS)
            (X, Y, yb, acc), _ = jax.lax.scan(
                step, (X, Y, yb, jnp.int32(0)), subkeys)
            return X, Y, yb, acc

        return run

    # one upload; per-rep donated inputs are device-side copies so the
    # tunnel stays out of every timed region
    Xb = jnp.asarray(X0)
    Yb = jnp.asarray(Y0)
    ybb = jnp.asarray(yb0)
    jax.block_until_ready((Xb, Yb, ybb))

    names = ["rng", "+sample_idx", "+verify", "+gather3", "+bias+math",
             "+scatter3+bias"]
    results = {}
    for level, name in enumerate(names):
        run = make_variant(level)

        def go(run=run):
            X, Y, yb = Xb + 0.0, Yb + 0.0, ybb + 0.0
            jax.block_until_ready((X, Y, yb))
            t0 = time.time()
            out = run(X, Y, yb, key)
            jax.block_until_ready(out)
            return time.time() - t0

        go()  # compile
        results[name] = min(go() for _ in range(3))
        print(f"{name:15s} {results[name]:7.3f} s/epoch "
              f"(delta {results[name] - results.get('rng', 0):6.3f})", flush=True)

    # shipped epoch for reference
    bisect_iters = int(np.ceil(np.log2(max(int(user_counts.max()), 2)))) + 1
    indptr = jnp.asarray(Cui.indptr, dtype=jnp.int32)

    def epoch():
        X, Y, yb = Xb + 0.0, Yb + 0.0, ybb + 0.0
        jax.block_until_ready((X, Y, yb))
        t0 = time.time()
        out = bpr_mod._bpr_epoch(
            X, Y, yb, uids, iids, indptr, table, key, lr, reg,
            STEPS, BATCH, True, bisect_iters, mh, 0)
        jax.block_until_ready(out)
        return time.time() - t0

    epoch()
    ep = min(epoch() for _ in range(3))
    print(f"shipped epoch   {ep:7.3f} s  ({STEPS * BATCH / ep / 1e6:.2f} M samples/s)",
          flush=True)

    # Pallas per-row-DMA gather, scan-amortized: STEPS iterations of one
    # (BATCH, F) gather by per-row async DMA inside one dispatch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 512
    n_groups = BATCH // G

    def dma_gather_kernel(idx_ref, hbm_ref, out_ref, sem):
        g = pl.program_id(0)
        base = g * G

        def dma(i):
            return pltpu.make_async_copy(
                hbm_ref.at[idx_ref[base + i]], out_ref.at[i], sem.at[i % 16])

        def body(i, _):
            dma(i).start()

            @pl.when(i >= 16)
            def _():
                dma(i - 16).wait()

            return 0

        jax.lax.fori_loop(0, G, body, 0)

        def drain(i, _):
            dma(G - 16 + i).wait()
            return 0

        jax.lax.fori_loop(0, 16, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((G, F), lambda g, idx: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
    )

    pallas_gather = pl.pallas_call(
        dma_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((G, F), jnp.float32),
        grid_spec=grid_spec,
    )

    @jax.jit
    def pallas_scan(X, k):
        def step(acc, subkey):
            li = jax.random.randint(subkey, (BATCH,), 0, USERS)
            out = pallas_gather(li, X)
            return acc + jnp.sum(out[:, 0]), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jax.random.split(k, STEPS))
        return acc

    @jax.jit
    def xla_gather_scan(X, k):
        def step(acc, subkey):
            li = jax.random.randint(subkey, (BATCH,), 0, USERS)
            return acc + jnp.sum(X[li][:, 0]), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jax.random.split(k, STEPS))
        return acc

    Xd = jnp.asarray(X0)
    jax.block_until_ready(Xd)
    try:
        tp = timeit(lambda: jax.block_until_ready(pallas_scan(Xd, key)))
        tx = timeit(lambda: jax.block_until_ready(xla_gather_scan(Xd, key)))
        n_rows = STEPS * BATCH
        print(f"pallas DMA gather scan {tp:7.3f} s ({tp / n_rows * 1e9:6.2f} ns/row) "
              f"vs XLA gather scan {tx:7.3f} s ({tx / n_rows * 1e9:6.2f} ns/row)",
              flush=True)
    except Exception as e:  # pragma: no cover - measurement probe
        print("pallas DMA gather FAILED:", repr(e), flush=True)


if __name__ == "__main__":
    main()
