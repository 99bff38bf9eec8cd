"""Solver-path equivalence: einsum CG vs tile-resident Pallas CG vs Cholesky.

All three formulations target the same normal equations; the tile-resident
kernel must reproduce the einsum CG (same warm start, same step count) up to
accumulation-order noise, and the Cholesky path must land on the same solution
up to CG truncation error.
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from implicit_tpu.ops import als as als_ops
from implicit_tpu.sparse import BucketedCSR


def _setup(seed=0, users=200, items=150, F=16):
    rng = np.random.RandomState(seed)
    Cui = sp.random(users, items, density=0.1, random_state=rng, format="csr")
    Cui.data = (Cui.data * 10 + 1).astype(np.float32)
    buckets = BucketedCSR(Cui).to_device()
    X0 = jnp.asarray(rng.rand(users, F).astype(np.float32) * 0.01)
    Y = jnp.asarray(rng.rand(items, F).astype(np.float32) * 0.01)
    return buckets, X0, Y


def test_tile_resident_cg_matches_einsum_cg():
    buckets, X0, Y = _setup()
    x_einsum = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01, use_pallas=False)
    x_pallas = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(x_einsum), np.asarray(x_pallas), atol=1e-3, rtol=1e-3
    )


def test_cholesky_close_to_converged_cg():
    buckets, X0, Y = _setup(seed=1)
    # many CG steps converge to the exact normal-equation solution
    x_cg = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.1, use_cg=True, cg_steps=40)
    x_cho = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.1, use_cg=False)
    np.testing.assert_allclose(np.asarray(x_cg), np.asarray(x_cho), atol=1e-3, rtol=1e-2)


def test_packed_gather_variant_matches(monkeypatch):
    # ALS_PACKED_GATHER=1 is a kept measurement point (end-to-end dead end on
    # TPU, see the ops/als.py gather NOTE); the packed table must still solve
    # to the identical result — the bitcast round-trip is value-preserving.
    buckets, X0, Y = _setup(seed=3)
    base = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01,
                              compute_dtype="bfloat16")
    monkeypatch.setenv("ALS_PACKED_GATHER", "1")
    packed = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01,
                                compute_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(base), np.asarray(packed),
                               atol=2e-6, rtol=1e-4)


def test_bf16_compute_close_to_f32():
    buckets, X0, Y = _setup(seed=2)
    x32 = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01, compute_dtype="float32")
    x16 = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01, compute_dtype="bfloat16")
    # bf16 inputs round at ~4e-3 relative; solutions stay close
    err = np.abs(np.asarray(x32) - np.asarray(x16)).max()
    scale = np.abs(np.asarray(x32)).max()
    assert err / scale < 0.05


def test_end_scatter_form_matches_carried(monkeypatch):
    # The scan-with-output + single-scatter class solve (ALS_END_SCATTER=1)
    # must be bit-identical to the carried-X form: chunk/class row sets are
    # disjoint and warm starts read each row's own pre-iteration value, so
    # the restructure only changes scheduling, never math.
    buckets, X0, Y = _setup(seed=5)
    for use_cg in (True, False):
        monkeypatch.setattr(als_ops, "ALS_END_SCATTER", 0)
        carried = np.asarray(als_ops.solve_side(
            jnp.array(X0), Y, buckets, 0.01, use_cg=use_cg))
        als_ops._solve_side_jit.clear_cache()
        monkeypatch.setattr(als_ops, "ALS_END_SCATTER", 1)
        scattered = np.asarray(als_ops.solve_side(
            jnp.array(X0), Y, buckets, 0.01, use_cg=use_cg))
        als_ops._solve_side_jit.clear_cache()
        np.testing.assert_array_equal(carried, scattered)
