"""Device solvers vs the pure-numpy per-row reference solvers."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from implicit_tpu.models.als import least_squares, least_squares_cg
from implicit_tpu.ops import als as als_ops
from implicit_tpu.sparse import BucketedCSR


def _setup(seed=0, users=60, items=40, F=8):
    rng = np.random.RandomState(seed)
    Cui = sp.random(users, items, density=0.15, random_state=rng, format="csr")
    Cui.data = (Cui.data * 8 + 1).astype(np.float32)
    X0 = (rng.rand(users, F) * 0.01).astype(np.float32)
    Y = (rng.rand(items, F) * 0.01).astype(np.float32)
    return Cui, X0, Y


def test_cg_matches_numpy_oracle():
    Cui, X0, Y = _setup()
    X_np = X0.copy()
    least_squares_cg(Cui, X_np, Y, 0.05, cg_steps=3)

    buckets = BucketedCSR(Cui).to_device()
    X_dev = als_ops.solve_side(jnp.asarray(X0), jnp.asarray(Y), buckets, 0.05)
    np.testing.assert_allclose(np.asarray(X_dev), X_np, atol=1e-4, rtol=1e-3)


def test_cholesky_matches_numpy_oracle():
    Cui, X0, Y = _setup(seed=2)
    X_np = X0.copy().astype(np.float64)
    least_squares(Cui, X_np, Y.astype(np.float64), 0.05)

    buckets = BucketedCSR(Cui).to_device()
    X_dev = als_ops.solve_side(
        jnp.asarray(X0), jnp.asarray(Y), buckets, 0.05, use_cg=False
    )
    np.testing.assert_allclose(np.asarray(X_dev), X_np, atol=1e-4, rtol=1e-3)


def test_negative_confidences():
    # disliked items (negative values) must follow the P=0, C=|c| convention
    Cui, X0, Y = _setup(seed=3)
    Cui.data[::3] *= -1

    X_np = X0.copy()
    least_squares_cg(Cui, X_np, Y, 0.05, cg_steps=3)

    buckets = BucketedCSR(Cui).to_device()
    X_dev = als_ops.solve_side(jnp.asarray(X0), jnp.asarray(Y), buckets, 0.05)
    np.testing.assert_allclose(np.asarray(X_dev), X_np, atol=1e-4, rtol=1e-3)
