"""ANN wrapper logic tests with a mocked index library.

annoy/nmslib/faiss aren't installed in CI; these tests exercise the wrapper
behavior — index construction inputs, over-fetching for filters, post-filter
truncation and distance rescaling — against a deterministic fake index that
returns exact inner-product/angular results.
"""

import sys
import types

import numpy as np
import pytest
from conftest import get_checkerboard

from implicit_tpu.als import AlternatingLeastSquares


class _FakeAnnoyIndex:
    """Exact 'angular' index with annoy's API surface."""

    def __init__(self, f, metric):
        assert metric == "angular"
        self.f = f
        self.vectors = {}
        self.built = False

    def add_item(self, i, vec):
        self.vectors[i] = np.asarray(vec, dtype=np.float64)

    def build(self, n_trees):
        ids = sorted(self.vectors)
        self._ids = np.array(ids)
        self._mat = np.stack([self.vectors[i] for i in ids])
        norms = np.linalg.norm(self._mat, axis=1)
        norms[norms == 0] = 1e-12
        self._unit = self._mat / norms[:, None]
        self.built = True

    def get_nns_by_vector(self, vec, n, search_k=-1, include_distances=False):
        v = np.asarray(vec, dtype=np.float64)
        nv = np.linalg.norm(v)
        nv = nv if nv > 0 else 1e-12
        cos = self._unit @ (v / nv)
        # angular distance = sqrt(2 - 2cos)
        dist = np.sqrt(np.maximum(2.0 - 2.0 * cos, 0.0))
        order = np.argsort(dist)[:n]
        ids = self._ids[order].tolist()
        if include_distances:
            return ids, dist[order].tolist()
        return ids


@pytest.fixture
def fake_annoy(monkeypatch):
    mod = types.ModuleType("annoy")
    mod.AnnoyIndex = _FakeAnnoyIndex
    monkeypatch.setitem(sys.modules, "annoy", mod)
    return mod


def _fitted_annoy_model(fake_annoy):
    from implicit_tpu.ann.annoy import AnnoyModel

    likes = get_checkerboard(50)
    model = AnnoyModel(AlternatingLeastSquares(factors=16, random_state=3), n_trees=5)
    model.fit(likes, show_progress=False)
    return model, likes


def test_annoy_recommend_matches_exact(fake_annoy):
    model, likes = _fitted_annoy_model(fake_annoy)

    # the fake index is exact, so top-1 must equal the exact model's top-1
    for userid in range(10):
        ids, scores = model.recommend(userid, likes[userid], N=1)
        exact_ids, exact_scores = model.model.recommend(userid, likes[userid], N=1)
        assert ids[0] == exact_ids[0]
        # the rescaled inner-product approximation should be close
        assert scores[0] == pytest.approx(exact_scores[0], rel=0.05)


def test_annoy_similar_items(fake_annoy):
    model, _ = _fitted_annoy_model(fake_annoy)
    ids, scores = model.similar_items(4, N=5)
    assert ids[0] == 4  # itself first in cosine space
    assert all(i % 2 == 0 for i in ids)  # checkerboard parity
    assert scores[0] == pytest.approx(1.0, abs=1e-4)


def test_annoy_filters(fake_annoy):
    model, likes = _fitted_annoy_model(fake_annoy)
    ids, _ = model.recommend(0, likes[0], N=3, filter_items=[0, 2])
    assert not {0, 2}.intersection(ids)

    ids, _ = model.similar_items(4, N=3, filter_items=[4])
    assert 4 not in ids


def test_annoy_batch_falls_back_to_loop(fake_annoy):
    model, likes = _fitted_annoy_model(fake_annoy)
    userids = np.arange(6)
    ids, scores = model.recommend(userids, likes[userids], N=2)
    assert ids.shape == (6, 2)
    for i, u in enumerate(userids):
        solo_ids, _ = model.recommend(int(u), likes[int(u)], N=2)
        np.testing.assert_array_equal(ids[i], solo_ids)


def test_annoy_exact_fallback_paths(fake_annoy):
    from implicit_tpu.ann.annoy import AnnoyModel

    likes = get_checkerboard(50)
    model = AnnoyModel(
        AlternatingLeastSquares(factors=16, random_state=3),
        approximate_recommend=False,
        approximate_similar_items=False,
    )
    model.fit(likes, show_progress=False)
    # with approximation off, calls route to the exact model
    ids, _ = model.recommend(1, likes[1], N=1)
    assert ids[0] == 1


def test_factory_constructs_wrapper(fake_annoy):
    from implicit_tpu.approximate_als import AnnoyAlternatingLeastSquares

    model = AnnoyAlternatingLeastSquares(factors=8, random_state=0, n_trees=3)
    likes = get_checkerboard(20)
    model.fit(likes, show_progress=False)
    ids, _ = model.recommend(2, likes[2], N=1)
    assert len(ids) == 1


class _FakeFaissIndex:
    """Exact inner-product index with faiss's IVFFlat API surface."""

    def __init__(self):
        self.nprobe = 0
        self._mat = None

    def train(self, matrix):
        pass

    def add(self, matrix):
        self._mat = np.asarray(matrix, dtype=np.float32)

    def search(self, query, count):
        scores = np.asarray(query, dtype=np.float32) @ self._mat.T
        order = np.argsort(-scores, axis=1)[:, :count]
        rows = np.arange(query.shape[0])[:, None]
        return scores[rows, order], order


@pytest.fixture
def fake_faiss(monkeypatch):
    mod = types.ModuleType("faiss")
    mod.METRIC_INNER_PRODUCT = 0
    mod.IndexFlat = lambda f: None
    mod.IndexIVFFlat = lambda quantizer, f, nlist, metric: _FakeFaissIndex()
    # deliberately NO StandardGpuResources: models the faiss-cpu build
    monkeypatch.setitem(sys.modules, "faiss", mod)
    return mod


def test_faiss_recommend_matches_exact(fake_faiss):
    from implicit_tpu.ann.faiss import FaissModel

    likes = get_checkerboard(50)
    model = FaissModel(AlternatingLeastSquares(factors=16, random_state=3))
    model.fit(likes, show_progress=False)
    ids, _ = model.recommend(7, likes[7], N=1)
    assert ids[0] == 7


def test_faiss_use_gpu_without_gpu_build_raises(fake_faiss):
    from implicit_tpu.ann.faiss import FaissModel

    likes = get_checkerboard(20)
    model = FaissModel(AlternatingLeastSquares(factors=8, random_state=0), use_gpu=True)
    with pytest.raises(ValueError, match="faiss-gpu"):
        model.fit(likes, show_progress=False)


def test_faiss_gpu_large_count_serves_exactly(fake_faiss):
    # faiss GPU indexes can't return >=1024 results; the wrapper must fall
    # back to the exact model (reference: implicit/ann/faiss.py:142,248)
    from implicit_tpu.ann.faiss import FaissModel

    likes = get_checkerboard(40)
    inner = AlternatingLeastSquares(factors=8, random_state=1)
    model = FaissModel(inner)
    model.fit(likes, show_progress=False)
    model.use_gpu = True  # simulate a GPU wrapper post-fit

    # break the ANN indexes: if the fallback doesn't engage, these would blow up
    model.recommend_index = None
    model.similar_items_index = None

    ids, scores = model.recommend(3, likes[3], N=1030)
    exact_ids, exact_scores = inner.recommend(3, likes[3], N=1030)
    np.testing.assert_array_equal(ids, exact_ids)

    ids, _ = model.similar_items(2, N=1500)
    exact_ids, _ = inner.similar_items(2, N=1500)
    np.testing.assert_array_equal(ids, exact_ids)
