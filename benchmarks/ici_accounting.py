"""Validate the multi-chip ICI-bytes cost model against the traced programs.

docs/parallel.md publishes a per-phase communication model (what crosses ICI
per ALS iteration / per serving batch) and predicted multi-chip scaling.
Real multi-chip hardware isn't available here, but the *bytes* side of the
model is checkable without it, at two levels:

  1. jaxpr (primary, exact): trace the D=8 sharded programs and sum the
     shapes of every ``all_gather`` / ``psum`` primitive — this is the
     communication the program REQUESTS, including the compute-dtype
     all-gather (bf16 halves the table bytes).
  2. compiled HLO (informational): the XLA:CPU backend demotes bf16
     collectives to f32 (verified here: the jaxpr all-gathers bf16, the CPU
     HLO inserts convert fusions and gathers f32), so compiled bytes on the
     virtual mesh match the model only in f32 mode. On TPU the bf16
     collective lowers natively; this script records the CPU deviation so
     nobody mistakes it for a model error.

Run:

    PYTHONPATH=/root/repo python benchmarks/ici_accounting.py

Exits nonzero if any jaxpr-level phase diverges from the model.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from implicit_tpu.datasets.synthetic import generate_synthetic
from implicit_tpu.parallel import als_sharded

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "i32": 4}

FAILURES = []


def _shape_bytes(dt, dims):
    n = 1
    for d in dims.split(","):
        if d.strip():
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def jaxpr_collective_bytes(jaxpr_text):
    """Sum output bytes of all_gather/psum primitives in a jaxpr dump."""
    out = {}
    for m in re.finditer(r"(\w+)\[([\d,]*)\] = (all_gather|psum)\[",
                         jaxpr_text):
        dt, dims, kind = m.groups()
        out[kind] = out.get(kind, 0) + _shape_bytes(dt, dims)
    return out


def hlo_collective_bytes(hlo_text):
    """Sum output bytes of collectives in optimized HLO (informational)."""
    out = {}
    for m in re.finditer(
            r"= (\w+)\[([\d,]*)\][^=\n]*?(all-gather|all-reduce|reduce-scatter|"
            r"collective-permute|all-to-all)\(", hlo_text):
        dt, dims, kind = m.groups()
        out[kind] = out.get(kind, 0) + _shape_bytes(dt, dims)
    return out


def check(name, got, model, tol=0.0):
    rel = abs(got - model) / max(model, 1)
    ok = rel <= tol + 1e-9
    print(f"{'PASS' if ok else 'FAIL'} {name:52s} got={got/1e6:9.4f}MB"
          f" model={model/1e6:9.4f}MB rel={rel:6.1%}", flush=True)
    if not ok:
        FAILURES.append(name)


def als_iteration(mesh, D, users, items, factors, compute_dtype):
    Cui = generate_synthetic(users, items, users * 30, seed=0)
    Ciu = Cui.T.tocsr()
    ush = als_sharded.RowShardedBuckets(Cui, mesh)
    ish = als_sharded.RowShardedBuckets(Ciu, mesh)
    shd = NamedSharding(mesh, P("d", None))
    rng = np.random.default_rng(0)
    Xp = jax.device_put(als_sharded.permute_rows(
        rng.random((users, factors), dtype=np.float32), D, ush.block), shd)
    Yp = jax.device_put(als_sharded.permute_rows(
        rng.random((items, factors), dtype=np.float32), D, ish.block), shd)

    step = als_sharded._build_step(
        mesh, "d",
        (len(ush.classes), ush.empty_rows is not None),
        (len(ish.classes), ish.empty_rows is not None),
        True, 3, compute_dtype, False,
    )
    args = (Xp, Yp, als_sharded._class_tuples(ush), ush.empty_rows,
            als_sharded._class_tuples(ish), ish.empty_rows, jnp.float32(0.01))
    jaxpr = str(jax.make_jaxpr(lambda *a: step(*a))(*args))
    got = jaxpr_collective_bytes(jaxpr)

    itemsize = jnp.dtype(compute_dtype).itemsize
    # model (per full iteration): one tiled all-gather of each side's padded
    # table in the compute dtype + two F x F f32 gramian psums
    ag = (ush.block * D + ish.block * D) * factors * itemsize
    ar = 2 * factors * factors * 4
    check(f"ALS iter D={D} F={factors} {compute_dtype} all_gather (jaxpr)",
          got.get("all_gather", 0), ag)
    check(f"ALS iter D={D} F={factors} {compute_dtype} psum (jaxpr)",
          got.get("psum", 0), ar)

    hlo = step.lower(*args).compile().as_text()
    hgot = hlo_collective_bytes(hlo)
    note = (" (XLA:CPU demotes bf16 collectives to f32 — expect 2x; "
            "native bf16 on TPU)" if itemsize == 2 else "")
    print(f"  info: compiled-HLO all-gather ="
          f" {hgot.get('all-gather', 0)/1e6:.4f}MB{note}", flush=True)


def topk_batch(mesh, D, items, factors, batch, k):
    from implicit_tpu.ops import topk as topk_ops

    rng = np.random.default_rng(1)
    tab = rng.standard_normal((items, factors)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((batch, factors)).astype(np.float32))
    items_dev, norms_dev, n_items = topk_ops.shard_items_for_topk(
        tab, None, mesh)
    core = topk_ops._topk_core_sharded(mesh)
    dummy = jnp.zeros((1,), jnp.int32)
    jaxpr = str(jax.make_jaxpr(
        lambda qq: core(items_dev, qq, norms_dev, dummy, dummy, dummy,
                        k=k, n_items=n_items, use_norms=False, use_qf=False,
                        use_if=False))(q))
    got = jaxpr_collective_bytes(jaxpr)
    # model: every chip contributes k local candidates per query — one
    # all-gather of (D*k) f32 scores + (D*k) i32 global ids per query row
    ag = batch * D * k * 8
    check(f"topk batch={batch} D={D} k={k} all_gather (jaxpr)",
          got.get("all_gather", 0), ag)


def main():
    D = 8
    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))
    print(f"mesh: {D} virtual CPU devices", flush=True)

    # small-but-structured shapes trace quickly; the BYTES model is exact at
    # any scale (linear in the padded table sizes)
    als_iteration(mesh, D, users=4000, items=1500, factors=32,
                  compute_dtype="float32")
    als_iteration(mesh, D, users=4000, items=1500, factors=32,
                  compute_dtype="bfloat16")
    topk_batch(mesh, D, items=4096, factors=32, batch=256, k=10)

    print(f"\n{len(FAILURES)} failures", flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
