"""Round-4 BPR optimization prototypes, measured head-to-head on the chip.

The scan-amortized profile (round4_bpr_profile2.py) prices one epoch at
last.fm shape f=128 as:

  sample-index gathers (3x 4B ops)   0.540 s
  cuckoo verify                      0.275 s
  factor row gathers (3x 512B ops)   0.254 s
  bias gathers (2x 4B) + math        0.542 s
  factor scatters (3x) + bias (2x)   1.135 s
  total / shipped epoch              2.746 / 2.599 s

Per-op: a 4B-payload indexed op costs ~0.18 s/epoch, a 512B row op only
~0.085 — the gather/scatter engine is PER-INDEX bound, not per-byte. That
inverts the round-2 layout decision: the split-bias layout saves bytes but
pays 4 extra small indexed ops per step (2 bias gathers + 2 bias
scatters), while the reference's glued factors+1 layout
(/root/reference/implicit/cpu/bpr.pyx:156-173) rides the bias on the row
ops for free IF wide-row ops stay per-index bound.

Two prototypes, composable:
  glued  : (F+1)-wide factor rows, user bias col pinned 1.0 — bias needs
           no ops at all; dx masks its last column (the bpr.cu:60-63
           guard, vectorized).
  packed : the (user, item) sample flats interleaved as one (nnz, 2) int32
           array — u+liked arrive in ONE 8B-row gather, disliked in a
           second (3 small gathers -> 2).
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
STEPS = 280


def main():
    print("device:", jax.devices()[0], flush=True)
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=3)
    Cui.sort_indices()
    nnz = Cui.nnz
    user_counts = np.ediff1d(Cui.indptr)
    userids_h = np.repeat(np.arange(USERS, dtype=np.int32), user_counts)

    rng = np.random.default_rng(0)
    Xg0 = rng.random((USERS, F + 1), dtype=np.float32)
    Xg0[:, F] = 1.0
    Yg0 = rng.random((ITEMS, F + 1), dtype=np.float32)
    uids = jnp.asarray(userids_h)
    iids = jnp.asarray(Cui.indices, dtype=jnp.int32)
    pairs = jnp.asarray(
        np.stack([userids_h, Cui.indices.astype(np.int32)], axis=1))

    pt = membership.build_pair_table(Cui, row_ids=userids_h)
    mh = (pt.a_bits, pt.b_bits, pt.bucket_bits)
    table = jnp.asarray(pt.table)
    key = jax.random.PRNGKey(0)
    bisect_iters = int(np.ceil(np.log2(max(int(user_counts.max()), 2)))) + 1
    indptr = jnp.asarray(Cui.indptr, dtype=jnp.int32)
    print(f"nnz={nnz} steps={STEPS} batch={BATCH}", flush=True)

    lr = jnp.float32(0.01)
    reg = jnp.float32(0.01)
    # the bpr.cu:60-63 bias-column guard, vectorized: the user row's bias
    # column is pinned (no update); item rows update every column
    xmask = jnp.ones((1, F + 1), jnp.float32).at[0, F].set(0.0)

    def make_glued(packed):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(X, Y, k):
            def step(carry, subkey):
                X, Y, correct, skipped = carry
                k1, k2 = jax.random.split(subkey)
                li = jax.random.randint(k1, (BATCH,), 0, nnz)
                di = jax.random.randint(k2, (BATCH,), 0, nnz)
                if packed:
                    pl_ = pairs[li]
                    u, liked = pl_[:, 0], pl_[:, 1]
                    disliked = pairs[di][:, 1]
                else:
                    u = uids[li]
                    liked = iids[li]
                    disliked = iids[di]
                skip = membership._member(table, u, disliked, *mh, jnp)

                xu = X[u]
                yl = Y[liked]
                yd = Y[disliked]
                score = jnp.sum(xu * (yl - yd), axis=1)
                z = 1.0 / (1.0 + jnp.exp(score))
                keep = ~skip
                correct = correct + jnp.sum((z < 0.5) & keep)
                skipped = skipped + jnp.sum(skip)
                scale = jnp.where(keep, lr, 0.0)[:, None]
                dx = (scale * (z[:, None] * (yl - yd) - reg * xu)) * xmask
                dyl = scale * (z[:, None] * xu - reg * yl)
                dyd = scale * (-z[:, None] * xu - reg * yd)
                X = X.at[u].add(dx)
                Y = Y.at[liked].add(dyl).at[disliked].add(dyd)
                return (X, Y, correct, skipped), None

            subkeys = jax.random.split(k, STEPS)
            (X, Y, c, s), _ = jax.lax.scan(
                step, (X, Y, jnp.int32(0), jnp.int32(0)), subkeys)
            return X, Y, c, s

        return run

    Xb = jnp.asarray(Xg0)
    Yb = jnp.asarray(Yg0)
    ybb = jnp.asarray(np.ascontiguousarray(Yg0[:, F]))
    Xs = jnp.asarray(np.ascontiguousarray(Xg0[:, :F]))
    Ys = jnp.asarray(np.ascontiguousarray(Yg0[:, :F]))
    jax.block_until_ready((Xb, Yb, ybb, Xs, Ys))

    # split layout + packed sample flats: the sample-gather saving alone
    def make_split_packed():
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def run(X, Y, yb, k):
            def step(carry, subkey):
                X, Y, yb, correct, skipped = carry
                k1, k2 = jax.random.split(subkey)
                li = jax.random.randint(k1, (BATCH,), 0, nnz)
                di = jax.random.randint(k2, (BATCH,), 0, nnz)
                pl_ = pairs[li]
                u, liked = pl_[:, 0], pl_[:, 1]
                disliked = pairs[di][:, 1]
                skip = membership._member(table, u, disliked, *mh, jnp)
                xu = X[u]
                yl = Y[liked]
                yd = Y[disliked]
                bl = yb[liked]
                bd = yb[disliked]
                score = jnp.sum(xu * (yl - yd), axis=1) + bl - bd
                z = 1.0 / (1.0 + jnp.exp(score))
                keep = ~skip
                correct = correct + jnp.sum((z < 0.5) & keep)
                skipped = skipped + jnp.sum(skip)
                scale = jnp.where(keep, lr, 0.0)
                X = X.at[u].add(scale[:, None] * (z[:, None] * (yl - yd) - reg * xu))
                Y = Y.at[liked].add(scale[:, None] * (z[:, None] * xu - reg * yl))
                Y = Y.at[disliked].add(scale[:, None] * (-z[:, None] * xu - reg * yd))
                yb = yb.at[liked].add(scale * (z - reg * bl))
                yb = yb.at[disliked].add(scale * (-z - reg * bd))
                return (X, Y, yb, correct, skipped), None

            subkeys = jax.random.split(k, STEPS)
            (X, Y, yb, c, s), _ = jax.lax.scan(
                step, (X, Y, yb, jnp.int32(0), jnp.int32(0)), subkeys)
            return X, Y, yb, c, s

        return run

    # split layout + packed flats + 8-lane bias tile: bias lives in col 0
    # of an (items, 8) tile so the 4 bias ops become 32B-row ops (the
    # engine is per-index bound: a 4B indexed op measured ~2x a row op)
    def make_split_packed_bias8():
        ymask = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1.0)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def run(X, Y, yb8, k):
            def step(carry, subkey):
                X, Y, yb8, correct, skipped = carry
                k1, k2 = jax.random.split(subkey)
                li = jax.random.randint(k1, (BATCH,), 0, nnz)
                di = jax.random.randint(k2, (BATCH,), 0, nnz)
                pl_ = pairs[li]
                u, liked = pl_[:, 0], pl_[:, 1]
                disliked = pairs[di][:, 1]
                skip = membership._member(table, u, disliked, *mh, jnp)
                xu = X[u]
                yl = Y[liked]
                yd = Y[disliked]
                bl8 = yb8[liked]
                bd8 = yb8[disliked]
                bl = bl8[:, 0]
                bd = bd8[:, 0]
                score = jnp.sum(xu * (yl - yd), axis=1) + bl - bd
                z = 1.0 / (1.0 + jnp.exp(score))
                keep = ~skip
                correct = correct + jnp.sum((z < 0.5) & keep)
                skipped = skipped + jnp.sum(skip)
                scale = jnp.where(keep, lr, 0.0)
                X = X.at[u].add(scale[:, None] * (z[:, None] * (yl - yd) - reg * xu))
                Y = Y.at[liked].add(scale[:, None] * (z[:, None] * xu - reg * yl))
                Y = Y.at[disliked].add(scale[:, None] * (-z[:, None] * xu - reg * yd))
                yb8 = yb8.at[liked].add(
                    (scale * (z - reg * bl))[:, None] * ymask)
                yb8 = yb8.at[disliked].add(
                    (scale * (-z - reg * bd))[:, None] * ymask)
                return (X, Y, yb8, correct, skipped), None

            subkeys = jax.random.split(k, STEPS)
            (X, Y, yb8, c, s), _ = jax.lax.scan(
                step, (X, Y, yb8, jnp.int32(0), jnp.int32(0)), subkeys)
            return X, Y, yb8, c, s

        return run

    # sync rule: block_until_ready lies over this transport — force
    # completion by pulling a scalar derived from the final carry
    def timed(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    def shipped():
        X, Y, yb = Xs + 0.0, Ys + 0.0, ybb + 0.0
        jax.block_until_ready((X, Y, yb))
        t0 = time.time()
        out = bpr_mod._bpr_epoch(
            X, Y, yb, uids, iids, indptr, table, key, lr, reg,
            STEPS, BATCH, True, bisect_iters, mh, 0)
        c, s = int(out[3]), int(out[4])
        dt = time.time() - t0
        return dt, c, s

    shipped()
    base, c0, s0 = min(shipped() for _ in range(3))
    print(f"shipped split epoch {base:7.3f} s  correct={c0} skipped={s0}",
          flush=True)

    sp = make_split_packed()

    def go_sp():
        X, Y, yb = Xs + 0.0, Ys + 0.0, ybb + 0.0
        jax.block_until_ready((X, Y, yb))
        t0 = time.time()
        out = sp(X, Y, yb, key)
        c, s = int(out[3]), int(out[4])
        dt = time.time() - t0
        go_sp.stats = (c, s)
        return dt

    t = timed(go_sp)
    print(f"split+packed        {t:7.3f} s  ({base / t:.2f}x vs shipped) "
          f"correct={go_sp.stats[0]} skipped={go_sp.stats[1]}", flush=True)

    spb = make_split_packed_bias8()
    yb8_0 = np.zeros((ITEMS, 8), dtype=np.float32)
    yb8_0[:, 0] = np.asarray(ybb)
    yb8_b = jnp.asarray(yb8_0)
    jax.block_until_ready(yb8_b)

    def go_spb():
        X, Y, yb8 = Xs + 0.0, Ys + 0.0, yb8_b + 0.0
        jax.block_until_ready((X, Y, yb8))
        t0 = time.time()
        out = spb(X, Y, yb8, key)
        c, s = int(out[3]), int(out[4])
        dt = time.time() - t0
        go_spb.stats = (c, s)
        return dt

    t = timed(go_spb)
    print(f"split+packed+bias8  {t:7.3f} s  ({base / t:.2f}x vs shipped) "
          f"correct={go_spb.stats[0]} skipped={go_spb.stats[1]}", flush=True)

    for packed in (False, True):
        run = make_glued(packed)

        def go(run=run):
            X, Y = Xb + 0.0, Yb + 0.0
            jax.block_until_ready((X, Y))
            t0 = time.time()
            out = run(X, Y, key)
            c, s = int(out[2]), int(out[3])
            dt = time.time() - t0
            go.stats = (c, s)
            return dt

        t = timed(go)
        name = "glued+packed" if packed else "glued"
        print(f"{name:19s} {t:7.3f} s  ({base / t:.2f}x vs shipped) "
              f"correct={go.stats[0]} skipped={go.stats[1]}", flush=True)


if __name__ == "__main__":
    main()
