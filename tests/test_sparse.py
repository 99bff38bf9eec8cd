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
