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
