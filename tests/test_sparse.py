"""BucketedCSR round-trip and invariants."""

import numpy as np
from scipy.sparse import random as sparse_random

from implicit_tpu.sparse import BucketedCSR


def _reconstruct(bucketed):
    """Rebuild a dense matrix from the bucketed representation."""
    dense = np.zeros(bucketed.shape, dtype=np.float32)
    for cls in bucketed.classes:
        for chunk in range(cls.n_chunks):
            for c in range(cls.C):
                row = cls.rows[chunk, c]
                if row == bucketed.sentinel:
                    continue
                length = cls.lengths[chunk, c]
                cols = cls.indices[chunk, c, :length]
                vals = cls.data[chunk, c, :length]
                dense[row, cols] = vals
    return dense


def test_roundtrip():
    rng = np.random.RandomState(0)
    mat = sparse_random(100, 60, density=0.1, random_state=rng, format="csr")
    mat.data = mat.data.astype(np.float32) * 3

    bucketed = BucketedCSR(mat)
    np.testing.assert_allclose(_reconstruct(bucketed), mat.toarray(), rtol=1e-6)


def test_row_partition():
    rng = np.random.RandomState(1)
    mat = sparse_random(200, 50, density=0.05, random_state=rng, format="csr")
    bucketed = BucketedCSR(mat)

    nnz_per_row = np.diff(mat.indptr)
    seen = list(bucketed.empty_rows)
    for cls in bucketed.classes:
        real = cls.rows[cls.rows != bucketed.sentinel]
        seen.extend(real.tolist())
        # L is a tile-aligned bucket >= every row length in the class
        assert (nnz_per_row[real] <= cls.L).all()
        assert cls.L % 8 == 0

    # every row appears exactly once across classes + empties
    assert sorted(seen) == list(range(200))


def test_padding_semantics():
    rng = np.random.RandomState(2)
    mat = sparse_random(64, 32, density=0.1, random_state=rng, format="csr")
    bucketed = BucketedCSR(mat)

    for cls in bucketed.classes:
        for chunk in range(cls.n_chunks):
            for c in range(cls.C):
                length = cls.lengths[chunk, c]
                # padding entries always carry confidence 0
                assert (cls.data[chunk, c, length:] == 0).all()
                if cls.rows[chunk, c] == bucketed.sentinel:
                    assert length == 0


def test_empty_matrix():
    from scipy.sparse import csr_matrix

    bucketed = BucketedCSR(csr_matrix((10, 5), dtype=np.float32))
    assert bucketed.classes == []
    assert len(bucketed.empty_rows) == 10


def test_pack_pair_on_device_matches_host_packer():
    """On-device packing (one COO upload) must produce bit-identical class
    tensors to the host packer for both sides, across grids and shapes."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.sparse import BucketedCSR, pack_pair_on_device

    rng = np.random.default_rng(0)
    cases = [(300, 200, 0.05, "fine"), (157, 83, 0.12, "pow2"),
             (64, 400, 0.02, "fine")]
    for users, items, density, grid in cases:
        Cui = sparse_random(users, items, density=density,
                            random_state=np.random.RandomState(1), format="csr")
        Cui.data = rng.integers(1, 9, Cui.nnz).astype(np.float32)
        Ciu = Cui.T.tocsr()
        got_u, got_i = pack_pair_on_device(Cui, Ciu, target_entries=1 << 12,
                                           grid=grid, mode="device")
        want_u = BucketedCSR(Cui, target_entries=1 << 12, grid=grid).to_device()
        want_i = BucketedCSR(Ciu, target_entries=1 << 12, grid=grid).to_device()
        for got, want in ((got_u, want_u), (got_i, want_i)):
            assert len(got.classes) == len(want.classes)
            assert (got.shape, got.nnz, got.sentinel) == \
                   (want.shape, want.nnz, want.sentinel)
            for g, w in zip(got.classes, want.classes):
                assert (g.L, g.C, g.n_chunks) == (w.L, w.C, w.n_chunks)
                np.testing.assert_array_equal(np.asarray(g.rows), np.asarray(w.rows))
                np.testing.assert_array_equal(np.asarray(g.indices),
                                              np.asarray(w.indices))
                np.testing.assert_array_equal(np.asarray(g.data), np.asarray(w.data))
                np.testing.assert_array_equal(np.asarray(g.lengths),
                                              np.asarray(w.lengths))


def test_pack_pair_on_device_rejects_unknown_mode():
    """A typo'd mode must raise, not silently force the device pack (the
    cold-cache 192s-vs-48s wall the knob exists to avoid)."""
    import pytest
    from scipy.sparse import csr_matrix

    from implicit_tpu.sparse import pack_pair_on_device

    Cui = csr_matrix(np.ones((3, 2), dtype=np.float32))
    with pytest.raises(ValueError, match="mode must be"):
        pack_pair_on_device(Cui, Cui.T.tocsr(), mode="Auto")


def test_pack_pair_on_device_empty_matrix():
    from scipy.sparse import csr_matrix

    from implicit_tpu.sparse import pack_pair_on_device

    Cui = csr_matrix((5, 4), dtype=np.float32)
    got_u, got_i = pack_pair_on_device(Cui, Cui.T.tocsr())
    assert got_u.classes == [] and got_i.classes == []
    assert got_u.nnz == 0


def test_pack_pair_auto_routes_by_warmth(monkeypatch):
    """mode="auto" (the round-4 cold-fit fix): host-packs while the device
    pack programs are cold (4 fewer compile-service round trips on first
    contact — measured 192s vs 48s cold fit), switches to the device pack
    once the structure is marked warm. Outputs are identical either way."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu import sparse as sm

    Cui = sparse_random(60, 40, density=0.1,
                        random_state=np.random.RandomState(5), format="csr")
    Cui.data = Cui.data.astype(np.float32)
    Ciu = Cui.T.tocsr()

    calls = []
    real = sm._pack_side
    monkeypatch.setattr(sm, "_pack_side",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.setattr(sm, "_device_pack_warm", set())
    # ignore any marker files a previous process left in the cache dir
    monkeypatch.setattr(sm, "_pack_marker_path", lambda key: None)

    # cold: auto takes the host path (no device-pack program runs)
    a_u, a_i = sm.pack_pair_on_device(Cui, Ciu, mode="auto")
    assert calls == []

    # device mode runs the pack programs and marks the structure warm
    d_u, d_i = sm.pack_pair_on_device(Cui, Ciu, mode="device")
    assert len(calls) == 2

    # warm: auto now takes the device path
    w_u, w_i = sm.pack_pair_on_device(Cui, Ciu, mode="auto")
    assert len(calls) == 4

    for a, b in ((a_u, d_u), (d_u, w_u), (a_i, d_i), (d_i, w_i)):
        for ca, cb in zip(a.classes, b.classes):
            np.testing.assert_array_equal(np.asarray(ca.indices),
                                          np.asarray(cb.indices))
            np.testing.assert_array_equal(np.asarray(ca.data),
                                          np.asarray(cb.data))


def test_fill_matches_full_constructor():
    """A metadata-only plan filled after the fact (the ingest="auto" cold
    path reuses its warmth-check plans this way) must equal the one-shot
    constructor's packing exactly, on both length-class grids."""
    rng = np.random.RandomState(11)
    csr = sparse_random(80, 50, density=0.12, random_state=rng, format="csr")
    csr.data = csr.data.astype(np.float32)
    for grid in ("fine", "pow2"):
        full = BucketedCSR(csr, grid=grid)
        filled = BucketedCSR(csr, grid=grid, metadata_only=True).fill(csr)
        assert len(full.classes) == len(filled.classes)
        for a, b in zip(full.classes, filled.classes):
            assert (a.L, a.C, a.n_chunks) == (b.L, b.C, b.n_chunks)
            np.testing.assert_array_equal(a.rows, b.rows)
            np.testing.assert_array_equal(a.lengths, b.lengths)
            np.testing.assert_array_equal(a.indices, b.indices)
            np.testing.assert_array_equal(a.data, b.data)


def test_als_chunk_target_policy():
    """One shared chunk policy for the model fit and bench: the gathered
    (C, L, F) block is bounded (4GB default) and the target stays inside
    [2^21, 2^24] at any width/dtype."""
    from implicit_tpu.sparse import als_chunk_target

    assert als_chunk_target(128, "bfloat16") == 1 << 24
    assert als_chunk_target(64, "bfloat16") == 1 << 24   # clipped high
    assert als_chunk_target(256, "bfloat16") == 1 << 23
    assert als_chunk_target(128, "float32") == 1 << 23
    assert als_chunk_target(4096, "float32") == 1 << 21  # clipped low
    for f in (64, 96, 128, 192, 256, 512):
        for d in ("bfloat16", "float32"):
            t = als_chunk_target(f, d)
            size = 2 if d == "bfloat16" else 4
            assert (1 << 21) <= t <= (1 << 24)
            assert t * f * size <= (4 << 30) or t == 1 << 21
