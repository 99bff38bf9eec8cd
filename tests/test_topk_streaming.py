"""topk_streaming: exact serving over host-resident (beyond-HBM) tables.

Results must be identical to ops.topk.topk on a device-resident table for
every filter combination and block-boundary shape.
"""

import numpy as np
import pytest
from scipy.sparse import random as sparse_random

from implicit_tpu.ops.topk import topk, topk_streaming


def _data(n_items=700, factors=24, q=33, seed=0):
    rng = np.random.default_rng(seed)
    items = rng.standard_normal((n_items, factors)).astype(np.float32)
    queries = rng.standard_normal((q, factors)).astype(np.float32)
    return items, queries


@pytest.mark.parametrize("block_rows", [128, 256, 1024])
def test_matches_resident(block_rows):
    items, queries = _data()
    ids_r, vals_r = topk(items, queries, 10)
    ids_s, vals_s = topk_streaming(items, queries, 10, block_rows=block_rows)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_matches_with_filters():
    items, queries = _data(seed=1)
    rng = np.random.default_rng(2)
    qf = sparse_random(queries.shape[0], items.shape[0], density=0.05,
                       random_state=rng, format="csr")
    qf.data[:] = 1.0
    fi = rng.choice(items.shape[0], size=40, replace=False)
    norms = np.linalg.norm(items, axis=1)

    kw = dict(item_norms=norms, filter_query_items=qf, filter_items=fi)
    ids_r, vals_r = topk(items, queries, 10, **kw)
    ids_s, vals_s = topk_streaming(items, queries, 10, block_rows=256, **kw)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_k_exceeds_items():
    items, queries = _data(n_items=7, q=3, seed=3)
    ids_r, vals_r = topk(items, queries, 12)
    ids_s, vals_s = topk_streaming(items, queries, 12, block_rows=128)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)
    assert (ids_s[:, 7:] == -1).all()


def test_block_not_dividing_items():
    items, queries = _data(n_items=777, seed=4)
    ids_r, _ = topk(items, queries, 5)
    ids_s, _ = topk_streaming(items, queries, 5, block_rows=256)
    np.testing.assert_array_equal(ids_r, ids_s)


def test_scalar_query_and_k0():
    items, queries = _data(seed=5)
    ids_s, vals_s = topk_streaming(items, queries[0], 4, block_rows=256)
    ids_r, vals_r = topk(items, queries[0].reshape(1, -1), 4)
    np.testing.assert_array_equal(ids_r, ids_s)
    ids0, vals0 = topk_streaming(items, queries, 0)
    assert ids0.shape == (queries.shape[0], 0)


def test_bf16_table_streams_bf16():
    import ml_dtypes

    items, queries = _data(seed=6)
    items16 = items.astype(ml_dtypes.bfloat16)
    ids_r, vals_r = topk(items16, queries, 10)
    ids_s, vals_s = topk_streaming(items16, queries, 10, block_rows=256)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_memmap_table(tmp_path):
    # the intended >HBM shape: the table never fully materializes in RAM
    items, queries = _data(seed=7)
    path = str(tmp_path / "table.npy")
    np.save(path, items)
    mm = np.load(path, mmap_mode="r")
    ids_r, _ = topk(items, queries, 10)
    ids_s, _ = topk_streaming(mm, queries, 10, block_rows=256)
    np.testing.assert_array_equal(ids_r, ids_s)


def test_default_block_sizing_bounds_table_dim():
    # the default block size must bound the (block, F) upload too — a
    # single-query call over a large catalog must not upload it all at once
    from implicit_tpu.ops import topk as topk_mod

    items, _ = _data(n_items=5000, q=1, seed=8)
    budget = topk_mod._score_budget_elements()
    # reproduce the sizing: both dims bounded
    expect_max = max(1024, min(budget // 1, budget // items.shape[1]))
    assert expect_max * items.shape[1] <= max(budget, 1024 * items.shape[1])
    ids_r, _ = topk(items, items[:1], 10)
    ids_s, _ = topk_streaming(items, items[0], 10)  # default block_rows
    np.testing.assert_array_equal(ids_r[0], ids_s[0])


def test_query_chunking_matches():
    # multiple uniformly padded query chunks against multiple blocks, with
    # both filter kinds crossing chunk and block boundaries
    items, queries = _data(n_items=500, q=70, seed=9)
    rng = np.random.default_rng(10)
    qf = sparse_random(70, 500, density=0.04, random_state=rng, format="csr")
    qf.data[:] = 1.0
    fi = rng.choice(500, size=25, replace=False)
    kw = dict(filter_query_items=qf, filter_items=fi)
    ids_r, vals_r = topk(items, queries, 7, **kw)
    ids_s, vals_s = topk_streaming(items, queries, 7, block_rows=128,
                                   q_chunk_rows=16, **kw)
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_allclose(vals_r, vals_s, rtol=1e-6)


def test_all_items_filtered_parity_semantics():
    # every candidate filtered: like resident topk, filtered real ids still
    # round out the results at -FLT_MAX (never -1 pad sentinels)
    items, queries = _data(n_items=60, q=4, seed=11)
    fi = np.arange(60)
    ids_s, vals_s = topk_streaming(items, queries, 10, block_rows=16,
                                   filter_items=fi)
    assert (ids_s >= 0).all()
    assert (vals_s <= -np.finfo(np.float32).max / 2).all()


def test_model_auto_streams_beyond_budget(monkeypatch):
    """A model whose factor tables exceed the device budget serves through
    topk_streaming transparently — same results as resident serving, and
    the full table is never uploaded."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.models import mf_base

    rng = np.random.default_rng(12)
    users, items_n, f = 90, 120, 16
    uf = rng.standard_normal((users, f)).astype(np.float32)
    itf = rng.standard_normal((items_n, f)).astype(np.float32)
    likes = sparse_random(users, items_n, density=0.1,
                          random_state=rng, format="csr")
    likes.data[:] = 1.0

    resident = AlternatingLeastSquares(factors=f)
    resident.user_factors = uf.copy()
    resident.item_factors = itf.copy()
    userids = np.arange(40)
    r_ids, r_scores = resident.recommend(userids, likes[userids], N=8)
    r_sim, r_simsc = resident.similar_items(np.arange(20), N=6)
    r_su, _ = resident.similar_users(np.arange(15), N=5)
    r_sub, _ = resident.recommend(userids[:5], likes[userids[:5]], N=4,
                                  items=np.arange(0, 120, 3))

    # force every table over the "budget"
    monkeypatch.setattr(mf_base, "_stream_threshold_bytes", lambda: 1024)
    streaming = AlternatingLeastSquares(factors=f)
    streaming.user_factors = uf.copy()
    streaming.item_factors = itf.copy()
    s_ids, s_scores = streaming.recommend(userids, likes[userids], N=8)
    s_sim, s_simsc = streaming.similar_items(np.arange(20), N=6)
    s_su, _ = streaming.similar_users(np.arange(15), N=5)
    s_sub, _ = streaming.recommend(userids[:5], likes[userids[:5]], N=4,
                                   items=np.arange(0, 120, 3))

    np.testing.assert_array_equal(r_ids, s_ids)
    np.testing.assert_allclose(r_scores, s_scores, rtol=1e-6)
    np.testing.assert_array_equal(r_sim, s_sim)
    np.testing.assert_allclose(r_simsc, s_simsc, rtol=1e-5)
    np.testing.assert_array_equal(r_su, s_su)
    np.testing.assert_array_equal(r_sub, s_sub)
    # the table device caches must never have been populated
    assert streaming._item_factors_dev is None
    assert streaming._user_factors_dev is None

    # pipelined generators degrade gracefully to the streaming path
    batches = [np.arange(0, 20), np.arange(20, 40)]
    out = list(streaming.recommend_pipelined(
        ((b, likes[b]) for b in batches), N=8))
    np.testing.assert_array_equal(np.concatenate([i for i, _ in out]), r_ids)


def test_streaming_pipelined_one_pass(monkeypatch):
    """With a beyond-budget table, the pipelined generators serve the whole
    stream in one topk_streaming pass (not one table pass per batch), with
    results identical to per-batch calls."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.models import mf_base

    rng = np.random.default_rng(13)
    users, items_n, f = 60, 80, 8
    likes = sparse_random(users, items_n, density=0.15,
                          random_state=rng, format="csr")
    likes.data[:] = 1.0

    model = AlternatingLeastSquares(factors=f)
    model.user_factors = rng.standard_normal((users, f)).astype(np.float32)
    model.item_factors = rng.standard_normal((items_n, f)).astype(np.float32)

    monkeypatch.setattr(mf_base, "_stream_threshold_bytes", lambda: 512)
    calls = []
    real = mf_base.topk_streaming

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mf_base, "topk_streaming", counting)

    batches = [np.arange(0, 20), np.arange(20, 40), np.arange(40, 60)]
    out = list(model.recommend_pipelined(
        ((b, likes[b]) for b in batches), N=6))
    assert len(calls) == 1, "pipelined stream must make one table pass"
    ref = model.recommend(np.arange(60), likes, N=6)
    np.testing.assert_array_equal(np.concatenate([i for i, _ in out]), ref[0])

    calls.clear()
    sim_out = list(model.similar_items_pipelined(
        [np.arange(0, 10), np.arange(10, 20)], N=5))
    assert len(calls) == 1
    ref_ids, ref_scores = model.similar_items(np.arange(20), N=5)
    np.testing.assert_array_equal(
        np.concatenate([i for i, _ in sim_out]), ref_ids)
    np.testing.assert_allclose(
        np.concatenate([s for _, s in sim_out]), ref_scores, rtol=1e-5)

    calls.clear()
    su_out = list(model.similar_users_pipelined([np.arange(0, 8)], N=4))
    assert len(calls) == 1
    ref_su, _ = model.similar_users(np.arange(8), N=4)
    np.testing.assert_array_equal(su_out[0][0], ref_su)


def test_streaming_pipelined_bounded_passes(monkeypatch):
    """Big streams buffer in bounded groups: more than one table pass, but
    far fewer than one per batch, memory bounded by the pass size; scalar
    userids with recalculate_user work too."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.models import mf_base

    rng = np.random.default_rng(14)
    users, items_n, f = 48, 64, 8
    likes = sparse_random(users, items_n, density=0.2,
                          random_state=rng, format="csr")
    likes.data[:] = 1.0

    model = AlternatingLeastSquares(factors=f, regularization=0.1)
    model.fit(likes, show_progress=False)

    monkeypatch.setattr(mf_base, "_stream_threshold_bytes", lambda: 256)
    monkeypatch.setattr(mf_base, "_STREAM_PASS_ROWS", 20)
    calls = []
    real = mf_base.topk_streaming

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mf_base, "topk_streaming", counting)

    batches = [np.arange(s, s + 8) for s in range(0, 48, 8)]  # 6 batches
    out = list(model.recommend_pipelined(
        ((b, likes[b]) for b in batches), N=6))
    assert 1 < len(calls) < len(batches)  # grouped passes, not per-batch
    ref_ids, _ = model.recommend(np.arange(48), likes, N=6)
    np.testing.assert_array_equal(np.concatenate([i for i, _ in out]), ref_ids)

    # scalar userids + recalculate_user through the streaming group path
    out2 = list(model.recommend_pipelined(
        ((int(u), likes[u]) for u in range(5)), N=4, recalculate_user=True))
    for u, (ids, scores) in enumerate(out2):
        assert ids.shape == (4,)
        r_ids, r_scores = model.recommend(int(u), likes[u], N=4,
                                          recalculate_user=True)
        np.testing.assert_array_equal(ids, r_ids)
        np.testing.assert_allclose(scores, r_scores, rtol=1e-5)
