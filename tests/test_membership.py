"""Exactness tests for the cuckoo pair-membership table (ops/membership.py)."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix
from scipy.sparse import random as sprandom

from implicit_tpu.ops.membership import build_pair_table


@pytest.mark.parametrize(
    "users,items,density",
    [(500, 300, 0.05), (5000, 2000, 0.01), (37, 11, 0.3), (3, 2, 0.5)],
)
def test_exact_membership(users, items, density):
    rng = np.random.RandomState(42)
    M = csr_matrix(sprandom(users, items, density=density, random_state=rng, format="csr"))
    pt = build_pair_table(M)
    assert pt is not None

    # every stored pair is found
    u = np.repeat(np.arange(users, dtype=np.uint32), np.ediff1d(M.indptr))
    i = M.indices.astype(np.uint32)
    assert pt.member(u, i).all()

    # random pairs agree with the dense truth exactly — the quotient scheme
    # stores enough bits to reconstruct the full key (no false positives)
    ru = rng.randint(0, users, size=20000).astype(np.uint32)
    ri = rng.randint(0, items, size=20000).astype(np.uint32)
    truth = (np.asarray(M.todense()) != 0)[ru, ri]
    np.testing.assert_array_equal(np.asarray(pt.member(ru, ri)), truth)


def test_jax_lookup_matches_host():
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    M = csr_matrix(sprandom(2000, 700, density=0.02, random_state=rng, format="csr"))
    pt = build_pair_table(M)
    ru = rng.randint(0, 2000, size=5000).astype(np.uint32)
    ri = rng.randint(0, 700, size=5000).astype(np.uint32)
    host = np.asarray(pt.member(ru, ri, xp=np))
    dev = np.asarray(pt.member(jnp.asarray(ru), jnp.asarray(ri), xp=jnp))
    np.testing.assert_array_equal(host, dev)


def test_empty_matrix_returns_none():
    M = csr_matrix((5, 5), dtype=np.float32)
    assert build_pair_table(M) is None


def test_slot_width_adapts_to_id_space():
    rng = np.random.RandomState(3)
    small = csr_matrix(sprandom(200, 100, density=0.1, random_state=rng, format="csr"))
    assert build_pair_table(small).table.dtype == np.uint16

    # sparse but huge id space: remainder outgrows 16-bit slots
    from scipy.sparse import coo_matrix

    n = 1 << 19
    ru = rng.randint(0, n, size=5000)
    ri = rng.randint(0, n, size=5000)
    big = coo_matrix((np.ones(5000, np.float32), (ru, ri)), shape=(n, n)).tocsr()
    pt = build_pair_table(big)
    assert pt is not None
    assert pt.table.dtype == np.uint32
    u = np.repeat(np.arange(n, dtype=np.uint32), np.ediff1d(big.indptr))
    assert pt.member(u, big.indices.astype(np.uint32)).all()
    # negatives in the huge space stay negative
    qu = rng.randint(0, n, size=5000).astype(np.uint32)
    qi = rng.randint(0, n, size=5000).astype(np.uint32)
    hits = np.asarray(pt.member(qu, qi))
    dense_keys = set(zip(ru.tolist(), ri.tolist()))
    truth = np.array([(a, b) in dense_keys for a, b in zip(qu.tolist(), qi.tolist())])
    np.testing.assert_array_equal(hits, truth)


def test_numpy_fallback_build_matches_native(monkeypatch):
    """The pure-numpy build (no C++ runtime) must be just as exact."""
    from implicit_tpu import native
    from implicit_tpu.ops import membership

    rng = np.random.RandomState(11)
    M = csr_matrix(sprandom(3000, 900, density=0.02, random_state=rng, format="csr"))

    monkeypatch.setattr(native, "cuckoo_build", lambda *a, **k: None)
    pt = membership.build_pair_table(M)
    assert pt is not None

    u = np.repeat(np.arange(3000, dtype=np.uint32), np.ediff1d(M.indptr))
    i = M.indices.astype(np.uint32)
    assert pt.member(u, i).all()
    ru = rng.randint(0, 3000, size=10000).astype(np.uint32)
    ri = rng.randint(0, 900, size=10000).astype(np.uint32)
    truth = (np.asarray(M.todense()) != 0)[ru, ri]
    np.testing.assert_array_equal(np.asarray(pt.member(ru, ri)), truth)
