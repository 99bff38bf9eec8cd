"""Behavioral contract tests shared by every model.

Covers the same API surface as the reference's RecommenderBaseTestMixin
(/root/reference/tests/recommender_base_test.py:31-487), expressed as
parametrized pytest functions: recommend correctness on the checkerboard
fixture, batch==scalar consistency, filters, items= subsetting, recalculate
paths, serialization, pickling and input validation.
"""

import os
import pickle
import random
import tempfile

import numpy as np
import pytest
from conftest import get_checkerboard
from numpy.testing import assert_array_equal
from scipy.sparse import coo_matrix, csr_matrix

from implicit_tpu.evaluation import precision_at_k
from implicit_tpu.nearest_neighbours import ItemItemRecommender
from implicit_tpu.utils import ParameterWarning


def test_recommend(model_factory):
    item_users = get_checkerboard(50)
    user_items = item_users.T.tocsr()

    model = model_factory()
    model.fit(item_users, show_progress=False)

    for userid in range(50):
        ids, _ = model.recommend(userid, user_items[userid], N=1)
        assert len(ids) == 1
        # the top item recommended should be the withheld diagonal item
        assert ids[0] == userid

    # over-asking should return the available items without error
    ids, _ = model.recommend(0, user_items[0], N=10000)
    assert len(ids)

    # filter recommended items using an additional filter list
    ids, _ = model.recommend(0, user_items[0], N=1, filter_items=[0])
    assert 0 not in set(ids)


def test_recommend_batch(model_factory):
    user_items = get_checkerboard(50)

    model = model_factory()
    model.fit(user_items, show_progress=False)

    userids = np.arange(50)
    ids, scores = model.recommend(userids, user_items[userids], N=1)
    for userid in userids:
        assert len(ids[userid]) == 1
        assert ids[userid][0] == userid

        # batch results must match the scalar call
        ids_user, scores_user = model.recommend(userid, user_items[userid], N=1)
        assert np.allclose(ids_user, ids[userid])
        assert np.allclose(scores_user, scores[userid], atol=1e-5)

    userids = np.array([2, 3, 4])
    ids, _ = model.recommend(userids, user_items[userids], N=1)
    for i, userid in enumerate(userids):
        assert ids[i][0] == userid

    ids, _ = model.recommend(userids, user_items[userids], N=1, filter_items=[0])
    for i, _ in enumerate(userids):
        assert 0 not in ids[i]

    # unfiltered scores also must match batch vs scalar
    userids = np.arange(50)
    ids, scores = model.recommend(
        userids, user_items[userids], N=5, filter_already_liked_items=False
    )
    for userid in range(50):
        ids_user, scores_user = model.recommend(
            userid, user_items[userid], N=5, filter_already_liked_items=False
        )
        assert np.allclose(scores_user, scores[userid], atol=1e-5)
        assert np.allclose(ids_user, ids[userid])


def test_recalculate_user(model_factory):
    item_users = get_checkerboard(50)
    user_items = item_users.T.tocsr()

    model = model_factory()
    model.fit(item_users, show_progress=False)

    try:
        userids = np.arange(50)
        batch_ids, batch_scores = model.recommend(
            userids, user_items[userids], N=1, recalculate_user=True
        )
    except NotImplementedError:
        return

    # stored factors round through the model's storage dtype while the
    # recalculated vector is solved fresh in f32, so 16-bit-storage models
    # (bf16 serving GEMM, ~8 mantissa bits) need a looser score gate — the
    # id-level assertions stay exact
    tol = 1e-3 if np.dtype(getattr(model, "dtype", np.float32)).itemsize > 2 else 2e-2

    for userid in range(item_users.shape[1]):
        ids, scores = model.recommend(userid, user_items[userid], N=1)
        assert len(ids) == 1
        user_vector = user_items[userid]

        ids_from_liked, scores_from_liked = model.recommend(
            userid=0, user_items=user_vector, N=1, recalculate_user=True
        )
        assert ids[0] == ids_from_liked[0]
        assert scores[0] == pytest.approx(scores_from_liked[0], abs=tol)
        assert batch_ids[userid][0] == ids_from_liked[0]
        assert batch_scores[userid][0] == pytest.approx(scores_from_liked[0], abs=tol)


def test_evaluation(model_factory):
    item_users = get_checkerboard(50)
    user_items = item_users.T.tocsr()

    model = model_factory()
    model.fit(item_users, show_progress=False)

    # the withheld diagonal must be recovered for every user
    p = precision_at_k(
        model, user_items.tocsr(), csr_matrix(np.eye(50)), K=1, show_progress=False
    )
    assert p == 1


def test_similar_users(model_factory):
    model = model_factory()
    model.fit(get_checkerboard(50), show_progress=False)

    try:
        for userid in range(50):
            ids, _ = model.similar_users(userid, N=10)
            for r in ids:
                assert r % 2 == userid % 2
    except NotImplementedError:
        pass


def test_similar_users_batch(model_factory):
    model = model_factory()
    model.fit(get_checkerboard(256), show_progress=False)
    userids = np.arange(50)

    try:
        ids, scores = model.similar_users(userids, N=10)
    except NotImplementedError:
        return

    assert ids.shape == (50, 10)
    for userid in userids:
        # first user returned should be itself with score ~1
        assert ids[userid][0] == userid
        assert scores[userid][0] == pytest.approx(1.0, abs=1e-4)
        for r in ids[userid]:
            assert r % 2 == userid % 2


def test_similar_users_filter(model_factory):
    model = model_factory()
    if isinstance(model, ItemItemRecommender):
        return

    model.fit(get_checkerboard(256), show_progress=False)
    userids = np.arange(50)

    try:
        ids, _ = model.similar_users(userids, N=10, filter_users=np.arange(52) * 5)
    except NotImplementedError:
        return

    for userid in userids:
        for r in ids[userid]:
            assert r % 5 != 0

    selected = np.arange(10)
    ids, _ = model.similar_users(userids, N=10, users=selected)
    for userid in userids:
        assert set(ids[userid]) == set(selected)


def test_similar_items(model_factory):
    model = model_factory()
    user_items = get_checkerboard(256)
    item_users = user_items.T.tocsr()
    model.fit(user_items, show_progress=False)

    for itemid in range(50):
        ids, scores = model.similar_items(itemid, N=10)
        for r in ids:
            assert r % 2 == itemid % 2

        try:
            recalculated_ids, recalculated_scores = model.similar_items(
                itemid, N=10, item_users=item_users[itemid]
            )
            assert np.allclose(ids, recalculated_ids)
            assert np.allclose(scores, recalculated_scores, atol=1e-5)
        except NotImplementedError:
            continue


def test_similar_items_batch(model_factory):
    model = model_factory()
    user_items = get_checkerboard(256)
    model.fit(user_items, show_progress=False)
    itemids = np.arange(50)

    def check_results(ids):
        assert ids.shape == (50, 10)
        for itemid in itemids:
            assert ids[itemid][0] == itemid
            for r in ids[itemid]:
                assert r % 2 == itemid % 2

    ids, _ = model.similar_items(itemids, N=10)
    check_results(ids)
    try:
        ids, _ = model.similar_items(
            itemids, N=10, recalculate_item=True, item_users=user_items.T.tocsr()[itemids]
        )
        check_results(ids)
    except NotImplementedError:
        pass


def test_similar_items_filter(model_factory):
    model = model_factory()
    model.fit(get_checkerboard(256), show_progress=False)
    itemids = np.arange(50)

    ids, _ = model.similar_items(itemids, N=10, filter_items=np.arange(52) * 5)
    for itemid in itemids:
        for r in ids[itemid]:
            assert r % 5 != 0

    try:
        selected = np.arange(10)
        ids, _ = model.similar_items(itemids, N=10, items=selected)
        for itemid in itemids:
            assert set(ids[itemid]) == set(selected)
    except NotImplementedError:
        pass


def test_zero_length_row(model_factory):
    item_users = np.asarray(get_checkerboard(50).todense())
    item_users[42] = 0
    item_users[:, 42] = 0
    item_users[49] = 0
    item_users[:, 49] = 0

    model = model_factory()
    model.fit(csr_matrix(item_users), show_progress=False)

    # item 42 has no users, shouldn't be similar to anything
    for itemid in range(40):
        ids, _ = model.similar_items(itemid, 10)
        assert 42 not in ids


def test_fit_non_csr_matrix(model_factory):
    user_items = get_checkerboard(50)

    model = model_factory()
    with pytest.warns(ParameterWarning):
        model.fit(user_items.tocoo(), show_progress=False)

    model = model_factory()
    with pytest.warns(ParameterWarning):
        model.fit(user_items.tolil(), show_progress=False)


def test_fit_ordering(model_factory):
    # returned scores must be decreasing
    samples, user_count, item_count = 1000, 100, 200
    rng = np.random.RandomState(10)
    itemids = rng.randint(0, item_count, size=samples, dtype=np.int32)
    userids = rng.randint(0, user_count, size=samples, dtype=np.int32)
    likes = coo_matrix((np.ones(samples), (userids, itemids))).tocsr()

    model = model_factory()
    model.fit(likes, show_progress=False)
    for userid in userids:
        _, scores = model.recommend(userid, likes[userid])
        assert np.all(np.diff(scores) <= 1e-6)


def test_dtype(model_factory):
    item_users = get_checkerboard(50)
    model = model_factory()
    model.fit(item_users.astype(np.float64), show_progress=False)

    model = model_factory()
    model.fit(item_users.astype(np.float32), show_progress=False)


def test_rank_items(model_factory):
    item_users = get_checkerboard(50)
    user_items = item_users.T.tocsr()

    model = model_factory()
    model.fit(item_users, show_progress=False)

    try:
        selected_items = np.array([1, 2, 3, 4, 5, 6])
        ids, _ = model.recommend(0, user_items[0], items=selected_items, N=20)

        assert len(ids) == len(selected_items)
        assert set(ids) == set(selected_items)

        if not isinstance(model, ItemItemRecommender):
            # items 2, 4, 6 are already liked and should rank last
            assert set(ids[3:]) == {2, 4, 6}
    except NotImplementedError:
        return

    for userid in range(50):
        selected_items = random.sample(range(50), 10)

        ids, _ = model.recommend(
            userid, user_items[userid], items=selected_items, filter_already_liked_items=False
        )
        assert set(ids) == set(selected_items)

        with pytest.raises(IndexError):
            model.recommend(userid, user_items[userid], items=selected_items + [-1, -3, -5])
        with pytest.raises(IndexError):
            model.recommend(userid, user_items[userid], items=selected_items + [51, 300, 200])


def test_rank_items_batch(model_factory):
    item_users = get_checkerboard(50)
    user_items = item_users.T.tocsr()

    model = model_factory()
    model.fit(item_users, show_progress=False)

    selected_items = np.arange(10) * 3
    try:
        ids, _ = model.recommend(np.arange(50), user_items, items=selected_items)
    except NotImplementedError:
        return

    for userid in range(50):
        assert set(ids[userid]) == set(selected_items)


def test_pickle(model_factory):
    user_items = get_checkerboard(50)
    model = model_factory()
    model.fit(user_items, show_progress=False)

    reloaded = pickle.loads(pickle.dumps(model))

    ids, _ = model.recommend(0, user_items[0])
    reloaded_ids, _ = reloaded.recommend(0, user_items[0])
    assert_array_equal(ids, reloaded_ids)

    ids, _ = model.similar_items(0)
    reloaded_ids, _ = reloaded.similar_items(0)
    assert_array_equal(ids, reloaded_ids)


def test_pickle_unfitted_model(model_factory):
    model = model_factory()
    pickle.loads(pickle.dumps(model))


def test_invalid_user_items(model_factory):
    user_items = get_checkerboard(50)
    model = model_factory()
    model.fit(user_items, show_progress=False)

    with pytest.raises(ValueError):
        model.recommend(0, user_items=user_items.tocsc())
    with pytest.raises(ValueError):
        model.recommend(0, user_items=user_items.tocoo())


def test_serialization(model_factory):
    likes = get_checkerboard(50)
    model = model_factory()
    model.fit(likes, show_progress=False)

    with tempfile.TemporaryDirectory() as tmpdir:
        filename = os.path.join(tmpdir, "model.npz")
        model.save(filename)
        reloaded = model.load(filename)

        assert_array_equal(model.similar_items(1)[0], reloaded.similar_items(1)[0])
        assert_array_equal(model.similar_items(1)[1], reloaded.similar_items(1)[1])

    # file objects work too
    with tempfile.TemporaryDirectory() as tmpdir:
        with open(os.path.join(tmpdir, "model.npz"), "wb+") as f:
            model.save(f)
            f.seek(0)
            reloaded = model.load(f)
            assert_array_equal(model.similar_items(1)[0], reloaded.similar_items(1)[0])
            assert_array_equal(model.similar_items(1)[1], reloaded.similar_items(1)[1])


def test_serialization_without_fit(model_factory):
    model = model_factory()
    with tempfile.TemporaryDirectory() as tmpdir:
        filename = os.path.join(tmpdir, "model.npz")
        model.save(filename)
        reloaded = model.load(filename)
        assert model.__dict__ == reloaded.__dict__


def test_fit_callback(model_factory):
    model = model_factory()
    num_called = 0

    def callback(*args, **kwargs):
        nonlocal num_called
        num_called += 1

    try:
        model.fit(get_checkerboard(5), show_progress=False, callback=callback)
    except NotImplementedError:
        # callback isn't supported on ItemItem KNN models
        return

    assert num_called >= 1


def test_recommend_pipelined(model_factory):
    user_items = get_checkerboard(50)

    model = model_factory()
    model.fit(user_items, show_progress=False)
    if not hasattr(model, "recommend_pipelined"):
        pytest.skip("model has no MF serving base")

    batches = [np.arange(0, 20), np.arange(20, 35), np.arange(35, 50)]
    results = list(model.recommend_pipelined(
        ((b, user_items[b]) for b in batches), N=3, max_in_flight=2))
    assert len(results) == len(batches)
    for b, (ids, scores) in zip(batches, results):
        ref_ids, ref_scores = model.recommend(b, user_items[b], N=3)
        assert_array_equal(ids, ref_ids)
        assert np.allclose(scores, ref_scores, atol=1e-5)

    # without filtering, batches are bare userid arrays
    results = list(model.recommend_pipelined(
        batches, N=3, filter_already_liked_items=False))
    for b, (ids, scores) in zip(batches, results):
        ref_ids, _ = model.recommend(
            b, user_items[b], N=3, filter_already_liked_items=False)
        assert_array_equal(ids, ref_ids)

    # items= subsetting applies across the stream
    sub = np.arange(1, 40)
    results = list(model.recommend_pipelined(
        ((b, user_items[b]) for b in batches), N=3, items=sub))
    for b, (ids, scores) in zip(batches, results):
        ref_ids, _ = model.recommend(b, user_items[b], N=3, items=sub)
        assert_array_equal(ids, ref_ids)


def test_similar_items_pipelined(model_factory):
    user_items = get_checkerboard(50)

    model = model_factory()
    model.fit(user_items, show_progress=False)
    if not hasattr(model, "similar_items_pipelined"):
        pytest.skip("model has no MF serving base")

    batches = [np.arange(0, 25), np.arange(25, 50)]
    results = list(model.similar_items_pipelined(batches, N=4, max_in_flight=2))
    assert len(results) == len(batches)
    for b, (ids, scores) in zip(batches, results):
        ref_ids, ref_scores = model.similar_items(b, N=4)
        assert_array_equal(ids, ref_ids)
        assert np.allclose(scores, ref_scores, atol=1e-5)

    # items= subsetting and filter_items apply stream-wide
    sub = np.arange(0, 30)
    for kwargs in (dict(items=sub), dict(filter_items=[1, 2])):
        results = list(model.similar_items_pipelined(batches, N=4, **kwargs))
        for b, (ids, _) in zip(batches, results):
            ref_ids, _ = model.similar_items(b, N=4, **kwargs)
            assert_array_equal(ids, ref_ids)


def test_similar_users_pipelined(model_factory):
    user_items = get_checkerboard(50)

    model = model_factory()
    model.fit(user_items, show_progress=False)
    if not hasattr(model, "similar_users_pipelined"):
        pytest.skip("model has no MF serving base")
    try:
        model.similar_users(0, N=2)
    except NotImplementedError:
        pytest.skip("similar_users not supported by this model")

    batches = [np.arange(0, 30), np.arange(30, 50)]
    results = list(model.similar_users_pipelined(batches, N=4))
    for b, (ids, scores) in zip(batches, results):
        ref_ids, ref_scores = model.similar_users(b, N=4)
        assert_array_equal(ids, ref_ids)
        assert np.allclose(scores, ref_scores, atol=1e-5)

    sub = np.arange(0, 35)
    results = list(model.similar_users_pipelined(batches, N=4, users=sub))
    for b, (ids, _) in zip(batches, results):
        ref_ids, _ = model.similar_users(b, N=4, users=sub)
        assert_array_equal(ids, ref_ids)
