"""Round-5 probe: is the wide-factor ALS gap the >100MB gather cliff?

The item-side half-iteration gathers rows of the USER table (360k rows):
at F=256 bf16 that table is 184MB — past the ~100MB cliff where row
gathers were measured to slow ~3x (ops/als.py gather NOTE) — while the
user side's source (the 160k-item table, 82MB) stays under it. That
asymmetry matches the measured side split (user 1.26x, item 2.45x going
128->256).

Everything here is timed as a lax.scan over many gather steps inside ONE
dispatch (per-call round trips are ~25-30ms on this transport and would
swamp the numbers).

Measured:
  1. ns/row vs table bytes: 360k rows, F in {128, 256} bf16 and F=128 f32
     (92MB / 184MB / 184MB) — if the 184MB points are slow at BOTH widths,
     the cliff is bytes, not width.
  2. split-F gather: two (N, 128) half tables (92MB each, both sub-cliff),
     same indices, concat'd — the candidate fix. Also the no-concat
     variant (each half reduced independently) as the upper bound.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/round5_gather_cliff.py
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

N_ROWS = 360_000
STEPS, PER = 256, 65_536  # 16.8M gathered rows per timing


def sync(x):
    return float(jnp.sum(x))


def timed(fn, reps=3):
    fn()
    return min(
        (lambda t0: (fn(), time.time() - t0)[1])(time.time())
        for _ in range(reps)
    )


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, N_ROWS, STEPS * PER, dtype=np.int32).reshape(STEPS, PER))
    n = STEPS * PER

    # ---- 1. plain gathers across table sizes ----
    for F, dt_ in ((128, jnp.bfloat16), (256, jnp.bfloat16), (128, jnp.float32),
                   (256, jnp.float32)):
        tab = jnp.asarray(rng.standard_normal((N_ROWS, F)).astype(np.float32),
                          dtype=dt_)
        mb = N_ROWS * F * tab.dtype.itemsize / 2**20

        @jax.jit
        def g(tab=tab, idx=idx):
            def step(acc, ix):
                return acc + jnp.sum(tab[ix], dtype=jnp.float32), None
            acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
            return acc

        w = timed(lambda: sync(g()))
        print(f"[gather] F={F:3d} {np.dtype(dt_).name:8s} table={mb:6.0f}MB "
              f"wall={w:.4f}s ns/row={w / n * 1e9:5.2f}", flush=True)

    # ---- 2. split-F candidate at F=256 bf16 ----
    F = 256
    tab = jnp.asarray(rng.standard_normal((N_ROWS, F)).astype(np.float32),
                      dtype=jnp.bfloat16)
    lo, hi = tab[:, :128], tab[:, 128:]
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)
    sync(lo.astype(jnp.float32)), sync(hi.astype(jnp.float32))

    @jax.jit
    def g_split_concat(lo=lo, hi=hi, idx=idx):
        def step(acc, ix):
            rows = jnp.concatenate([lo[ix], hi[ix]], axis=-1)
            return acc + jnp.sum(rows, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return acc

    @jax.jit
    def g_split_free(lo=lo, hi=hi, idx=idx):
        def step(acc, ix):
            return (acc + jnp.sum(lo[ix], dtype=jnp.float32)
                    + jnp.sum(hi[ix], dtype=jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return acc

    for name, fn in (("split+concat", g_split_concat), ("split-free", g_split_free)):
        w = timed(lambda fn=fn: sync(fn()))
        print(f"[split]  F=256 bf16 {name:13s} wall={w:.4f}s "
              f"ns/row={w / n * 1e9:5.2f}", flush=True)

    # ---- 3. consumer-shaped check: gathered block feeds a (C,L,F) kernel-
    # style reduction (sum over L weighted) so the concat must materialize
    # in layout, like the real Yu block feeding pallas ----
    C, L = 128, 512
    idx2 = jnp.asarray(
        rng.integers(0, N_ROWS, 64 * C * L, dtype=np.int32).reshape(64, C, L))
    wgt = jnp.asarray(rng.random((C, L), dtype=np.float32))

    @jax.jit
    def blk_one(tab=tab, idx2=idx2, wgt=wgt):
        def step(acc, ix):
            yu = tab[ix]  # (C, L, F)
            return acc + jnp.sum(wgt[:, :, None] * yu.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx2)
        return acc

    @jax.jit
    def blk_split(lo=lo, hi=hi, idx2=idx2, wgt=wgt):
        def step(acc, ix):
            yu = jnp.concatenate([lo[ix], hi[ix]], axis=-1)
            return acc + jnp.sum(wgt[:, :, None] * yu.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx2)
        return acc

    n2 = 64 * C * L
    for name, fn in (("one-table", blk_one), ("split+concat", blk_split)):
        w = timed(lambda fn=fn: sync(fn()))
        print(f"[block]  F=256 bf16 {name:13s} wall={w:.4f}s "
              f"ns/row={w / n2 * 1e9:5.2f}", flush=True)


if __name__ == "__main__":
    main()
