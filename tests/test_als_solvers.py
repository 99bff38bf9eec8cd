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


def test_int8_gather_quant_close_to_bf16():
    # gather_quant=True dequantizes per-row int8 rows where the bf16 path
    # reads rounded bf16 rows: same contract, coarser rounding (~0.8%
    # per-element vs ~0.4%), so solutions stay close but not identical.
    # The speed rationale (VMEM promotion of the halved table) is
    # documented at ops/als._quantize_table and measured in
    # benchmarks/round5_int8_gather.py.
    buckets, X0, Y = _setup(seed=3)
    for use_cg in (True, False):
        base = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01,
                                  use_cg=use_cg, compute_dtype="bfloat16")
        quant = als_ops.solve_side(jnp.array(X0), Y, buckets, 0.01,
                                   use_cg=use_cg, compute_dtype="bfloat16",
                                   gather_quant=True)
        err = np.abs(np.asarray(base) - np.asarray(quant)).max()
        scale = np.abs(np.asarray(base)).max()
        assert err / scale < 0.15, (use_cg, err / scale)


def test_quantize_table_roundtrip():
    rng = np.random.RandomState(0)
    Y = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = als_ops._quantize_table(Y, "float32")
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    back = np.asarray(q, dtype=np.float32) * np.asarray(s)[:, None]
    err = np.abs(back - np.asarray(Y)).max(axis=1)
    bound = np.abs(np.asarray(Y)).max(axis=1) / 127.0
    assert (err <= bound + 1e-6).all()
    # all-zero rows quantize to zeros with a unit scale (no div-by-zero)
    qz, sz = als_ops._quantize_table(jnp.zeros((4, 8)), "bfloat16")
    assert not np.asarray(qz).any() and (np.asarray(sz) == 1.0).all()


def test_int8_gather_quant_pallas_kernels_converge():
    # the in-kernel dequant path (int8 block + scale block -> bf16 tile in
    # VMEM, pallas_ops._dequant_tile) must converge to the same solution as
    # the bf16 kernels and as the composed-XLA quant formulation. Gate on
    # converged loss — single-solve max-deltas just measure CG truncation
    # noise under a coarser rounding.
    from implicit_tpu.sparse import BucketedCSR
    import scipy.sparse as sp
    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    Cui = sp.random(300, 200, density=0.08, random_state=rng, format="csr")
    Cui.data = (Cui.data * 10 + 1).astype(np.float32)
    Ciu = Cui.T.tocsr()
    ub = BucketedCSR(Cui).to_device()
    ib = BucketedCSR(Ciu).to_device()
    X0 = jnp.asarray(rng.rand(300, 32).astype(np.float32) * 0.1)
    Y0 = jnp.asarray(rng.rand(200, 32).astype(np.float32) * 0.1)

    def run(**kw):
        X, Y = X0 + 0.0, Y0 + 0.0
        for _ in range(4):
            X = als_ops.solve_side(X, Y, ub, 0.01, compute_dtype="bfloat16", **kw)
            Y = als_ops.solve_side(Y, X, ib, 0.01, compute_dtype="bfloat16", **kw)
        return als_ops.calculate_loss_bucketed(ub, X, Y, 0.01)

    l_bf = run(use_pallas=True)
    l_q = run(use_pallas=True, gather_quant=True)
    l_qx = run(use_pallas=False, gather_quant=True)
    assert abs(l_q - l_bf) / abs(l_bf) < 0.02
    assert abs(l_qx - l_q) / abs(l_bf) < 0.01
