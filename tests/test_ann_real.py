"""ANN wrapper integration tests against the REAL index libraries.

These run in the dedicated CI leg that pip-installs faiss-cpu and annoy
(.github/workflows/build.yml, test-real-ann); everywhere else they skip.
The in-repo mock tests (test_ann.py) cover the wrapper logic; these verify
the real libraries accept our index-construction inputs and return sane
neighbourhoods end-to-end.
"""

import numpy as np
import pytest
from conftest import get_checkerboard
from scipy.sparse import csr_matrix

from implicit_tpu.als import AlternatingLeastSquares

annoy = pytest.importorskip("annoy", reason="annoy not installed (real-ANN CI leg only)")


def _fitted(wrapper_cls, **kwargs):
    likes = csr_matrix(get_checkerboard(50))
    model = wrapper_cls(AlternatingLeastSquares(factors=16, random_state=3), **kwargs)
    model.fit(likes, show_progress=False)
    return model, likes


def test_real_annoy_end_to_end():
    from implicit_tpu.ann.annoy import AnnoyModel

    model, likes = _fitted(AnnoyModel, n_trees=20)
    hits = sum(
        model.recommend(u, likes[u], N=1)[0][0] == u for u in range(50)
    )
    assert hits >= 45  # approximate: allow a few misses

    ids, scores = model.similar_items(3, N=5)
    assert 3 in ids  # an item is its own nearest cosine neighbour
    assert len(ids) == 5


def test_real_faiss_end_to_end():
    faiss = pytest.importorskip("faiss")
    from implicit_tpu.ann.faiss import FaissModel

    model, likes = _fitted(FaissModel, nlist=1, nprobe=1)
    hits = sum(
        model.recommend(u, likes[u], N=1)[0][0] == u for u in range(50)
    )
    assert hits >= 45

    ids, _ = model.similar_items(3, N=5)
    assert 3 in ids

    # filters still produce N results through over-fetching
    ids, _ = model.recommend(2, likes[2], N=3, filter_items=[2])
    assert 2 not in ids and len(ids) == 3
