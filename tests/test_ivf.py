"""TPU-native IVF index tests (implicit_tpu/ann/ivf.py)."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from implicit_tpu.als import AlternatingLeastSquares
from implicit_tpu.ann.ivf import TPUIVFModel, _IVFIndex
from implicit_tpu.approximate_als import TPUIVFAlternatingLeastSquares


def _clustered_points(n, f, groups, rng):
    centers = rng.standard_normal((groups, f)).astype(np.float32) * 3
    pts = centers[rng.integers(0, groups, n)] + rng.standard_normal((n, f)).astype(np.float32) * 0.3
    return pts.astype(np.float32)


def test_index_recall_vs_exact():
    rng = np.random.default_rng(0)
    pts = _clustered_points(4000, 16, 32, rng)
    norms = np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    index = _IVFIndex(pts / norms, n_clusters=64, kmeans_iters=10, seed=3)

    hits = total = 0
    for qi in range(50):
        q = pts[qi] / np.linalg.norm(pts[qi])
        ids, scores = index.search(q, 10, n_probe=8)
        exact = np.argsort(-(pts / norms) @ q)[:10]
        hits += len(set(ids.tolist()) & set(exact.tolist()))
        total += 10
        # scores must be the exact cosine for whatever was returned
        np.testing.assert_allclose(
            scores, (pts[ids] / norms[ids].ravel()[:, None] @ q.reshape(-1, 1)).ravel(),
            rtol=1e-4, atol=1e-5,
        )
    assert hits / total > 0.85, hits / total


def test_probing_everything_is_exact():
    rng = np.random.default_rng(1)
    pts = _clustered_points(500, 8, 10, rng)
    index = _IVFIndex(pts, n_clusters=16, kmeans_iters=10, seed=0)
    q = rng.standard_normal(8).astype(np.float32)
    ids, scores = index.search(q, 20, n_probe=16)  # probe all clusters
    exact = np.argsort(-pts @ q)[:20]
    exact_scores = np.sort(pts @ q)[::-1][:20]
    np.testing.assert_allclose(np.sort(scores)[::-1], exact_scores, rtol=1e-4, atol=1e-5)
    assert set(ids.tolist()) == set(exact.tolist())


def _likes():
    rng = np.random.RandomState(5)
    dense = (rng.rand(120, 80) < 0.2).astype(np.float32)
    return csr_matrix(dense)


def test_wrapper_end_to_end():
    likes = _likes()
    model = TPUIVFAlternatingLeastSquares(
        factors=16, iterations=5, random_state=2, n_probe=1000,  # probe all
    )
    model.fit(likes, show_progress=False)

    ids, scores = model.recommend(3, likes[3], N=5)
    assert len(ids) == 5
    assert np.isfinite(scores).all()
    # probing every cluster makes the ANN path exact: must match the model
    exact_ids, _ = model.model.recommend(3, likes[3], N=5)
    assert set(ids.tolist()) == set(exact_ids.tolist())

    sids, sscores = model.similar_items(7, N=5)
    exact_sids, exact_sscores = model.model.similar_items(7, N=5)
    assert set(sids.tolist()) == set(exact_sids.tolist())
    # cosine score convention matches the exact path
    order = np.argsort(sids)
    eorder = np.argsort(exact_sids)
    np.testing.assert_allclose(
        np.asarray(sscores)[order], np.asarray(exact_sscores)[eorder], rtol=1e-3, atol=1e-4
    )


def test_wrapper_filters():
    likes = _likes()
    model = TPUIVFAlternatingLeastSquares(
        factors=16, iterations=5, random_state=2, n_probe=1000,
    )
    model.fit(likes, show_progress=False)
    ids, _ = model.recommend(0, likes[0], N=5, filter_items=[1, 2, 3])
    assert not {1, 2, 3} & set(ids.tolist())
    ids, _ = model.recommend(0, likes[0], N=5, filter_already_liked_items=True)
    assert not set(likes[0].indices.tolist()) & set(ids.tolist())


def test_exact_fallback_paths():
    likes = _likes()
    model = TPUIVFAlternatingLeastSquares(
        factors=8, iterations=3, random_state=1,
        approximate_recommend=False, approximate_similar_items=False,
    )
    model.fit(likes, show_progress=False)
    ids, _ = model.recommend(1, likes[1], N=4)
    exact_ids, _ = model.model.recommend(1, likes[1], N=4)
    np.testing.assert_array_equal(ids, exact_ids)


def test_search_count_exceeding_probed_candidates():
    """count > n_probe * cap must clamp, not crash (top_k width bound)."""
    rng = np.random.default_rng(2)
    pts = _clustered_points(500, 8, 10, rng)
    index = _IVFIndex(pts, n_clusters=16, kmeans_iters=5, seed=0)
    q = rng.standard_normal(8).astype(np.float32)
    ids, scores = index.search(q, 400, n_probe=2)  # far beyond 2 clusters
    assert len(ids) <= 2 * index.cap
    assert len(ids) == len(scores)
    assert np.isfinite(scores).all()


def test_factory_is_deterministic_and_accepts_kmeans_iters():
    likes = _likes()
    out = []
    for _ in range(2):
        model = TPUIVFAlternatingLeastSquares(
            factors=8, iterations=3, random_state=9, n_probe=2, kmeans_iters=5,
        )
        model.fit(likes, show_progress=False)
        ids, _ = model.recommend(2, likes[2], N=5)
        out.append(ids)
    np.testing.assert_array_equal(out[0], out[1])


def test_batched_serving_matches_scalar():
    likes = _likes()
    model = TPUIVFAlternatingLeastSquares(
        factors=16, iterations=5, random_state=2, n_probe=1000,  # probe all
    )
    model.fit(likes, show_progress=False)

    userids = np.arange(20)
    bids, bscores = model.recommend(userids, likes[userids], N=5,
                                    filter_items=[2, 4])
    assert bids.shape == (20, 5)
    for r, u in enumerate(userids):
        sids, sscores = model.recommend(int(u), likes[[u]], N=5,
                                        filter_items=[2, 4])
        np.testing.assert_array_equal(bids[r][: len(sids)], sids)
    assert not {2, 4} & set(bids.ravel().tolist())

    itemids = np.arange(15)
    sim_b, _ = model.similar_items(itemids, N=4, filter_items=[0])
    assert sim_b.shape == (15, 4)
    for r, it in enumerate(itemids):
        sim_s, _ = model.similar_items(int(it), N=4, filter_items=[0])
        np.testing.assert_array_equal(sim_b[r][: len(sim_s)], sim_s)


def test_ivf_model_npz_roundtrip(tmp_path):
    """The TPU-native IVF wrapper round-trips to npz — beyond reference
    parity (the host-library wrappers raise NotImplementedError on save,
    /root/reference/implicit/ann/annoy.py:229-240): the index is plain
    arrays (centroids, reorder permutation, cluster extents)."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.ann.ivf import TPUIVFModel
    from scipy.sparse import random as sparse_random

    rng = np.random.default_rng(2)
    likes = sparse_random(150, 80, density=0.1, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 5, n).astype(np.float64))
    likes = likes.tocsr()

    model = TPUIVFModel(AlternatingLeastSquares(factors=16, iterations=4,
                                                random_state=7),
                        n_clusters=8, n_probe=8, random_state=3)
    model.fit(likes, show_progress=False)

    path = str(tmp_path / "ivf_index")
    model.save(path)
    loaded = TPUIVFModel.load(path)

    # identical serving from the restored index
    for uid in (0, 3, 17):
        i1, s1 = model.recommend(uid, likes[uid], N=5)
        i2, s2 = loaded.recommend(uid, likes[uid], N=5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
    i1, s1 = model.similar_items(4, N=5)
    i2, s2 = loaded.similar_items(4, N=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)

    # inner model restored with its factors and hyperparameters
    np.testing.assert_array_equal(loaded.model.user_factors, model.model.user_factors)
    assert loaded.model.factors == 16
    assert loaded._probe == model._probe


def test_ivf_model_save_before_fit_raises(tmp_path):
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.ann.ivf import TPUIVFModel

    model = TPUIVFModel(AlternatingLeastSquares(factors=8))
    with pytest.raises(ValueError, match="unfitted"):
        model.save(str(tmp_path / "x"))


def test_flags_gate_index_builds(tmp_path):
    """approximate_similar_items/recommend=False skip that index's k-means
    build entirely (the dominant construction cost), like the host-library
    wrappers; save/load round-trips the one built index."""
    import numpy as np

    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.ann.ivf import TPUIVFModel

    rng = np.random.default_rng(5)
    model = AlternatingLeastSquares(factors=8)
    model.user_factors = rng.standard_normal((40, 8)).astype(np.float32)
    model.item_factors = rng.standard_normal((30, 8)).astype(np.float32)

    wrapper = TPUIVFModel(model, approximate_recommend=False, random_state=3,
                          n_probe=16)
    wrapper._build_indexes(model.item_factors)
    assert wrapper.similar_items_index is not None
    assert wrapper.recommend_index is None

    # recommend falls back to the exact path; similar_items queries the index
    from scipy.sparse import csr_matrix
    likes = csr_matrix(np.ones((1, 30), dtype=np.float32))
    ids, _ = wrapper.recommend(0, likes, N=5)
    assert len(ids) == 5
    sids, _ = wrapper.similar_items(3, N=4)
    assert len(sids) == 4

    path = str(tmp_path / "ivf_one_index")
    wrapper.save(path)
    loaded = TPUIVFModel.load(path)
    assert loaded.recommend_index is None
    l_ids, _ = loaded.similar_items(3, N=4)
    np.testing.assert_array_equal(l_ids, sids)
