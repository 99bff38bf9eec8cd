"""Pallas kernel tests against the jnp oracle (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from implicit_tpu.ops.pallas_ops import weighted_matvec, weighted_matvec_reference


@pytest.mark.parametrize("shape", [(64, 8, 128), (128, 96, 128), (16, 256, 128)])
@pytest.mark.parametrize("alpha,beta", [(1.0, -1.0), (0.0, 1.0)])
def test_weighted_matvec_matches_oracle(shape, alpha, beta):
    C, L, F = shape
    rng = np.random.default_rng(C + L)
    Yu = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    w = jnp.asarray(rng.random((C, L), dtype=np.float32))
    bv = jnp.asarray(rng.random((C, L), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32))

    got = weighted_matvec(Yu, w, bv, v, alpha, beta, interpret=True)
    want = weighted_matvec_reference(Yu, w, bv, v, alpha, beta)
    # different accumulation order than the einsum oracle -> ~1e-4 noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_weighted_matvec_bf16():
    C, L, F = 32, 16, 128
    rng = np.random.default_rng(0)
    Yu = jnp.asarray(rng.standard_normal((C, L, F), dtype=np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.random((C, L), dtype=np.float32))
    bv = jnp.asarray(rng.random((C, L), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32))

    got = weighted_matvec(Yu, w, bv, v, 1.0, -1.0, interpret=True)
    want = weighted_matvec_reference(Yu, w, bv, v, 1.0, -1.0)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-2, atol=1.0)


def test_zero_weights_give_b_only():
    # with w == 0 and (alpha, beta) = (1, -1) the result is exactly b
    C, L, F = 16, 8, 128
    rng = np.random.default_rng(1)
    Yu = jnp.asarray(rng.standard_normal((C, L, F), dtype=np.float32))
    w = jnp.zeros((C, L), dtype=jnp.float32)
    bv = jnp.asarray(rng.random((C, L), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32))

    got = weighted_matvec(Yu, w, bv, v, 1.0, -1.0, interpret=True)
    want = jnp.einsum("cl,clf->cf", bv, Yu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def _composed_cg_oracle(Yu, dat, x0, YtY_reg, cg_steps):
    """The composed (einsum) formulation of the same masked CG solve."""
    from implicit_tpu.ops.als import _masked_cg, _weights

    w, bv = _weights(dat)
    r = (weighted_matvec_reference(Yu, w, bv, x0, 1.0, -1.0)
         - x0 @ YtY_reg)
    return _masked_cg(
        x0, r,
        lambda v: weighted_matvec_reference(Yu, w, bv, v, 0.0, 1.0) + v @ YtY_reg,
        cg_steps,
    )


def _cg_case(C, L, F, seed):
    rng = np.random.default_rng(seed)
    Yu = jnp.asarray(rng.standard_normal((C, L, F), dtype=np.float32) * 0.1)
    dat = rng.random((C, L), dtype=np.float32) * 5 + 1
    dat[:, -2:] = 0.0  # padding tail
    x0 = jnp.asarray(rng.standard_normal((C, F), dtype=np.float32) * 0.01)
    Y = rng.standard_normal((64, F), dtype=np.float32) * 0.1
    YtY_reg = jnp.asarray(Y.T @ Y + 0.05 * np.eye(F, dtype=np.float32))
    return Yu, jnp.asarray(dat), x0, YtY_reg


# shapes include the wide-factor (F=256) classes that must tile differently
# from the F=128 default (regression: scoped-VMEM OOM at f=256, L=768)
@pytest.mark.parametrize("shape", [(16, 64, 128), (16, 96, 256), (8, 24, 64)])
def test_cg_solve_full_matches_composed(shape):
    from implicit_tpu.ops.pallas_ops import cg_solve_full

    Yu, dat, x0, YtY_reg = _cg_case(*shape, seed=shape[1])
    got = cg_solve_full(Yu, dat, x0, YtY_reg, cg_steps=3, interpret=True)
    want = _composed_cg_oracle(Yu, dat, x0, YtY_reg, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("shape", [(16, 1536, 128), (16, 768, 256), (8, 2048, 64)])
def test_gramian_cg_solve_matches_composed(shape):
    from implicit_tpu.ops.pallas_ops import gramian_cg_solve

    Yu, dat, x0, YtY_reg = _cg_case(*shape, seed=shape[2])
    got = gramian_cg_solve(Yu, dat, x0, YtY_reg, cg_steps=3, interpret=True)
    want = _composed_cg_oracle(Yu, dat, x0, YtY_reg, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_gramian_tile_l_respects_vmem_and_mosaic():
    from implicit_tpu.ops.pallas_ops import gramian_tile_l

    # fits whole-row: always legal regardless of 128-divisibility
    assert gramian_tile_l(1040, 128, 2) == 1040
    # must tile: result is a 128-multiple divisor within the VMEM budget
    bl = gramian_tile_l(1280, 128, 2)  # regression: full 1280 OOM'd at 16.2MB
    assert bl % 128 == 0 and 1280 % bl == 0 and bl <= 1024
    bl = gramian_tile_l(768, 256, 2)
    assert bl % 128 == 0 and 768 % bl == 0 and bl < 768
    assert gramian_tile_l(640, 256, 2) == 128
    # no viable tile: L has no 128-multiple divisor and exceeds the budget
    assert gramian_tile_l(832, 256, 2) is None
    # normal-matrix scratch alone crowds out the tiles at very wide factors
    assert gramian_tile_l(2048, 512, 2) is None
    assert gramian_tile_l(1024, 1024, 2) is None


def test_full_cg_max_l_scales_with_factor_width():
    from implicit_tpu.ops.als import _full_cg_max_l

    assert _full_cg_max_l(jnp.bfloat16, 128) == 1024
    assert _full_cg_max_l(jnp.float32, 128) == 512
    assert _full_cg_max_l(jnp.bfloat16, 256) == 512
    assert _full_cg_max_l(jnp.float32, 256) == 256
    assert _full_cg_max_l(jnp.bfloat16, 64) == 1024


def test_weighted_matvec_partial_l_tile():
    # L=576 is not a multiple of the 256 tile: the kernel must mask the
    # partial final tile instead of folding undefined reads into every row
    rng = np.random.default_rng(5)
    C, L, F = 16, 576, 32
    Yu = jnp.asarray(rng.standard_normal((C, L, F)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((C, L)).astype(np.float32))
    bv = jnp.asarray(rng.standard_normal((C, L)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((C, F)).astype(np.float32))
    out = np.asarray(weighted_matvec(Yu, w, bv, v, 1.0, -1.0))
    t = np.einsum("clf,cf->cl", np.asarray(Yu), np.asarray(v))
    ref = np.einsum("cl,clf->cf", np.asarray(bv) - np.asarray(w) * t,
                    np.asarray(Yu))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_gramian_cg_non_multiple_of_8_rows():
    from implicit_tpu.ops.pallas_ops import gramian_cg_solve as _gcg
    # C=20: the ceil grid must solve the tail rows (floor silently skipped
    # them, returning uninitialized memory)
    rng = np.random.default_rng(6)
    C, L, F = 20, 16, 8
    Yu = jnp.asarray(rng.standard_normal((C, L, F)).astype(np.float32))
    dat = jnp.asarray((rng.random((C, L)) < 0.5).astype(np.float32) * 3)
    x0 = jnp.zeros((C, F), jnp.float32)
    yty = jnp.eye(F, dtype=jnp.float32) * 2.0
    sol = np.asarray(_gcg(Yu, dat, x0, yty, 3))
    full = np.asarray(_gcg(
        jnp.pad(Yu, ((0, 4), (0, 0), (0, 0))),
        jnp.pad(dat, ((0, 4), (0, 0))),
        jnp.pad(x0, ((0, 4), (0, 0))), yty, 3))[:C]
    np.testing.assert_allclose(sol, full, atol=1e-6)
