"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The sharded paths must produce the same numbers as the single-device paths —
sharding is a layout decision, not a semantic one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import random as sparse_random

from conftest import get_checkerboard
from implicit_tpu.ops import als as als_ops
from implicit_tpu.parallel import create_mesh, shard_buckets, sharded_topk
from implicit_tpu.parallel.mesh import replicated
from implicit_tpu.sparse import BucketedCSR

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _random_csr(users=64, items=48, seed=0):
    mat = sparse_random(
        users, items, density=0.2, random_state=np.random.RandomState(seed), format="csr"
    )
    mat.data = mat.data.astype(np.float32) * 10 + 1
    return mat


def test_sharded_solve_matches_single_device():
    Cui = _random_csr()
    users, items = Cui.shape
    factors = 16
    rng = np.random.default_rng(0)
    X0 = rng.random((users, factors), dtype=np.float32) * 0.01
    Y0 = rng.random((items, factors), dtype=np.float32) * 0.01
    reg = 0.01

    buckets = BucketedCSR(Cui)

    # single-device result
    X_single = als_ops.solve_side(jnp.asarray(X0), jnp.asarray(Y0), buckets, reg)

    # sharded over an 8-way mesh
    mesh = create_mesh(8)
    chunks = shard_buckets(buckets, mesh)
    X = replicated(mesh, X0)
    Y = replicated(mesh, Y0)
    YtY = als_ops.gramian(Y, reg)
    for cls in chunks.classes:
        X = als_ops.cg_solve_scan(X, Y, YtY, cls.rows, cls.indices, cls.data, cg_steps=3)

    np.testing.assert_allclose(np.asarray(X), np.asarray(X_single), atol=1e-5)


def test_model_fit_on_mesh():
    # model-level multi-chip training must match single-device training
    from implicit_tpu.als import AlternatingLeastSquares

    Cui = _random_csr(users=80, items=60, seed=3)

    single = AlternatingLeastSquares(factors=16, iterations=3, random_state=5)
    single.fit(Cui, show_progress=False)

    sharded = AlternatingLeastSquares(factors=16, iterations=3, random_state=5, mesh=8)
    sharded.fit(Cui, show_progress=False)

    # iterative-CG tolerance: the row-sharded layout reduces YtY over a
    # permuted gathered table, so float rounding differs across layouts
    np.testing.assert_allclose(
        sharded.user_factors, single.user_factors, atol=1e-3, rtol=2e-2
    )
    ids_a, _ = single.recommend(3, Cui[3])
    ids_b, _ = sharded.recommend(3, Cui[3])
    np.testing.assert_array_equal(ids_a, ids_b)


def test_bpr_fit_on_mesh():
    # multi-chip BPR: deterministic and passes the checkerboard quality gate
    from conftest import get_checkerboard

    from implicit_tpu.bpr import BayesianPersonalizedRanking

    likes = get_checkerboard(50)

    model = BayesianPersonalizedRanking(
        factors=31, learning_rate=0.01, regularization=0, random_state=42, mesh=8
    )
    model.fit(likes, show_progress=False)
    ok = sum(int(model.recommend(u, likes[u], N=1)[0][0] == u) for u in range(50))
    assert ok >= 48

    # same seed + same mesh => bit-identical factors
    model2 = BayesianPersonalizedRanking(
        factors=31, learning_rate=0.01, regularization=0, random_state=42, mesh=8
    )
    model2.fit(likes, show_progress=False)
    np.testing.assert_array_equal(model.user_factors, model2.user_factors)


def test_lmf_fit_on_mesh():
    from conftest import get_checkerboard

    from implicit_tpu.lmf import LogisticMatrixFactorization

    likes = get_checkerboard(50)
    model = LogisticMatrixFactorization(factors=30, random_state=23, mesh=8)
    model.fit(likes, show_progress=False)
    ok = sum(int(model.recommend(u, likes[u], N=1)[0][0] == u) for u in range(50))
    assert ok >= 48


def test_row_sharded_fit_matches_single_device():
    """The row-sharded layout (parallel.als_sharded): converged quality and
    serving results must match single-device training. Factors agree to
    iterative-solver tolerance (reduction order differs across layouts)."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.models.als import calculate_loss

    Cui = _random_csr(users=500, items=300, seed=11)
    single = AlternatingLeastSquares(factors=32, iterations=5, random_state=7)
    single.fit(Cui, show_progress=False)
    meshed = AlternatingLeastSquares(factors=32, iterations=5, random_state=7,
                                     mesh=8)
    meshed.fit(Cui, show_progress=False)

    np.testing.assert_allclose(meshed.user_factors, single.user_factors,
                               atol=5e-3)
    l1 = calculate_loss(Cui, single.user_factors, single.item_factors, 0.01)
    l2 = calculate_loss(Cui, meshed.user_factors, meshed.item_factors, 0.01)
    assert abs(l1 - l2) / l1 < 1e-3

    ids1, _ = single.recommend(np.arange(50), Cui[:50], N=10)
    ids2, _ = meshed.recommend(np.arange(50), Cui[:50], N=10)
    assert (ids1 == ids2).mean() > 0.999


def test_row_sharded_fit_pallas_matches_single_device_pallas():
    """use_pallas=True inside shard_map (the TPU default since round 4,
    interpreter-backed on the CPU mesh) runs the SAME kernel formulation as
    the single-device Pallas fit — sharding is a layout decision, so the
    factors must agree to f32 reduction-order tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from implicit_tpu.parallel import als_sharded, create_mesh

    mesh = create_mesh(8)
    Cui = _random_csr(users=500, items=300, seed=9)
    Ciu = Cui.T.tocsr()
    rng = np.random.default_rng(5)
    X0 = rng.random((500, 32), dtype=np.float32) * 0.01
    Y0 = rng.random((300, 32), dtype=np.float32) * 0.01

    ub = BucketedCSR(Cui).to_device()
    ib = BucketedCSR(Ciu).to_device()
    X1, Y1 = als_ops.fit(jnp.asarray(X0), jnp.asarray(Y0), ub, ib, 0.01, 3,
                         use_pallas=True)

    ush = als_sharded.RowShardedBuckets(Cui, mesh)
    ish = als_sharded.RowShardedBuckets(Ciu, mesh)
    shd = NamedSharding(mesh, P("d", None))
    Xp = jax.device_put(als_sharded.permute_rows(X0, 8, ush.block), shd)
    Yp = jax.device_put(als_sharded.permute_rows(Y0, 8, ish.block), shd)
    X2, Y2 = als_sharded.fit(Xp, Yp, ush, ish, mesh, 0.01, 3, use_pallas=True)

    # tolerance = the measured f32 layout-reduction noise of the EINSUM
    # formulation under the identical single-vs-sharded comparison (0.017
    # max at 3 iterations, factor scale ~17; both formulations converge to
    # 0.007 by 8 iterations) — Pallas measured 0.025, the same order, so
    # this is iterative-solver noise, not a kernel defect
    X2u = als_sharded.unpermute_rows(X2, 8, ush.block, 500)
    Y2u = als_sharded.unpermute_rows(Y2, 8, ish.block, 300)
    np.testing.assert_allclose(X2u, np.asarray(X1), atol=5e-2)
    np.testing.assert_allclose(Y2u, np.asarray(Y1), atol=5e-2)

    # the semantic gate: serving through either factor set agrees
    s1 = np.asarray(X1[:100] @ Y1.T)
    s2 = X2u[:100] @ Y2u.T
    ids1 = np.argsort(-s1, axis=1)[:, :10]
    ids2 = np.argsort(-s2, axis=1)[:, :10]
    assert (ids1 == ids2).mean() > 0.99


def test_row_sharded_empty_rows_and_cholesky():
    """Empty rows zero out per-chip; the batched-Cholesky path works under
    the row-sharded layout; training-loss parity with the bucketed loss."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.ops.als import calculate_loss_bucketed
    from implicit_tpu.parallel import als_sharded
    from implicit_tpu.sparse import BucketedCSR

    Cui = _random_csr(users=77, items=53, seed=4).tolil()
    Cui[5, :] = 0
    Cui[76, :] = 0
    Cui = Cui.tocsr()
    Cui.eliminate_zeros()

    model = AlternatingLeastSquares(factors=16, iterations=3, random_state=2,
                                    mesh=8, use_cg=False,
                                    calculate_training_loss=True)
    losses = []
    model.fit(Cui, show_progress=False, callback=lambda e, t, l: losses.append(l))
    assert np.all(model.user_factors[5] == 0)
    assert np.all(model.user_factors[76] == 0)
    assert losses[-1] <= losses[0]

    # the shard_map loss matches the single-device bucketed loss
    ref = calculate_loss_bucketed(
        BucketedCSR(Cui), jnp.asarray(model.user_factors),
        jnp.asarray(model.item_factors), 0.01)
    mesh = create_mesh(8)
    sh = als_sharded.RowShardedBuckets(Cui, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shd = NamedSharding(mesh, P("d", None))
    X = jax.device_put(als_sharded.permute_rows(model.user_factors, 8, sh.block), shd)
    Y = jax.device_put(als_sharded.permute_rows(
        model.item_factors, 8, als_sharded._block(Cui.shape[1], 8)), shd)
    got = als_sharded.calculate_loss(sh, X, Y, 0.01, mesh)
    assert abs(got - ref) / abs(ref) < 1e-4


def test_sharded_topk_matches_single_device():
    rng = np.random.default_rng(1)
    items = rng.standard_normal((512, 32), dtype=np.float32)
    queries = rng.standard_normal((16, 32), dtype=np.float32)

    mesh = create_mesh(8)
    vals, ids = sharded_topk(replicated(mesh, items), replicated(mesh, queries), 10, mesh)

    scores = queries @ items.T
    oracle_ids = np.argsort(-scores, axis=1)[:, :10]
    oracle_vals = np.take_along_axis(scores, oracle_ids, axis=1)

    np.testing.assert_allclose(np.asarray(vals), oracle_vals, atol=1e-5)
    # ids may differ on exact ties only
    assert (np.asarray(ids) == oracle_ids).mean() > 0.99


def test_sharded_topk_uneven_shards():
    # item count not divisible by mesh size still must work via padding
    rng = np.random.default_rng(2)
    items = rng.standard_normal((496, 16), dtype=np.float32)  # 496 = 8 * 62
    queries = rng.standard_normal((4, 16), dtype=np.float32)

    mesh = create_mesh(8)
    vals, ids = sharded_topk(replicated(mesh, items), replicated(mesh, queries), 5, mesh)
    scores = queries @ items.T
    oracle = np.sort(scores, axis=1)[:, ::-1][:, :5]
    np.testing.assert_allclose(np.asarray(vals), oracle, atol=1e-5)


def test_mesh_recommend_matches_single_device():
    """Public multi-chip serving: model.recommend / similar_* on a mesh
    return the same results as single-device serving (ids identical;
    scores to float tolerance — per-shard matmul blocking differs)."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(9)
    likes = sparse_random(120, 90, density=0.08, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 6, n).astype(np.float64))
    likes = likes.tocsr()

    single = AlternatingLeastSquares(factors=16, iterations=5, random_state=3)
    single.fit(likes, show_progress=False)

    meshed = AlternatingLeastSquares(factors=16, iterations=5, random_state=3,
                                     mesh=8)
    meshed.user_factors = single.user_factors.copy()
    meshed.item_factors = single.item_factors.copy()

    userids = np.arange(120)
    i1, s1 = single.recommend(userids, likes, N=10)
    i2, s2 = meshed.recommend(userids, likes, N=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    # scalar query + filter_items
    i1, s1 = single.recommend(3, likes[3], N=5, filter_items=[1, 2, 3])
    i2, s2 = meshed.recommend(3, likes[3], N=5, filter_items=[1, 2, 3])
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    # items= subsetting (one-off shard path)
    subset = np.arange(0, 90, 3)
    i1, s1 = single.recommend(5, likes[5], N=8, items=subset)
    i2, s2 = meshed.recommend(5, likes[5], N=8, items=subset)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    # similar_items / similar_users
    i1, s1 = single.similar_items(np.arange(20), N=5)
    i2, s2 = meshed.similar_items(np.arange(20), N=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    i1, s1 = single.similar_users(7, N=5)
    i2, s2 = meshed.similar_users(7, N=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_mesh_recommend_over_ask_and_empty():
    """Over-asking N pads with -1 sentinels identically on the mesh path."""
    from implicit_tpu.als import AlternatingLeastSquares

    likes = get_checkerboard(40)
    single = AlternatingLeastSquares(factors=8, iterations=4, random_state=1)
    single.fit(likes, show_progress=False)
    meshed = AlternatingLeastSquares(factors=8, iterations=4, random_state=1, mesh=8)
    meshed.user_factors = single.user_factors.copy()
    meshed.item_factors = single.item_factors.copy()

    i1, s1 = single.recommend(0, likes[0], N=500, filter_already_liked_items=False)
    i2, s2 = meshed.recommend(0, likes[0], N=500, filter_already_liked_items=False)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_meshed_model_pickles():
    """A model holding a live Mesh object degrades it to a device count on
    pickle (Mesh holds device handles) and still serves after restore."""
    import pickle

    from implicit_tpu.als import AlternatingLeastSquares

    likes = get_checkerboard(30)
    model = AlternatingLeastSquares(factors=8, iterations=4, random_state=1,
                                    mesh=create_mesh(8))
    model.fit(likes, show_progress=False)
    i1, s1 = model.recommend(1, likes[1], N=3)

    restored = pickle.loads(pickle.dumps(model))
    assert restored.mesh == 8
    i2, s2 = restored.recommend(1, likes[1], N=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_mesh_recommend_pipelined():
    """Pipelined streaming serving works over a mesh and matches per-batch
    mesh recommend exactly (same item-sharded score + ICI merge path)."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(21)
    likes = sparse_random(100, 70, density=0.1, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 6, n).astype(np.float64))
    likes = likes.tocsr()

    model = AlternatingLeastSquares(factors=16, iterations=4, random_state=5,
                                    mesh=8)
    model.fit(likes, show_progress=False)

    batches = [np.arange(0, 40), np.arange(40, 100)]
    out = list(model.recommend_pipelined(
        ((b, likes[b]) for b in batches), N=7))
    assert len(out) == 2
    for b, (ids, scores) in zip(batches, out):
        ref_ids, ref_scores = model.recommend(b, likes[b], N=7)
        np.testing.assert_array_equal(ids, ref_ids)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5)


def test_mesh_serving_bf16_table():
    """16-bit-storage models serve through a bf16 mesh-sharded table; mesh
    and single-device results agree (both score the same rounded table)."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(4)
    likes = sparse_random(100, 80, density=0.1, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 6, n).astype(np.float64))
    likes = likes.tocsr()

    single = AlternatingLeastSquares(factors=16, iterations=4, random_state=5,
                                     dtype=np.float16)
    single.fit(likes, show_progress=False)

    meshed = AlternatingLeastSquares(factors=16, random_state=5,
                                     dtype=np.float16, mesh=8)
    meshed.user_factors = single.user_factors.copy()
    meshed.item_factors = single.item_factors.copy()

    # the sharded table must carry the serving dtype
    table, _, _ = meshed._factors_on_mesh("item", meshed._serving_mesh())
    assert str(table.dtype) == "bfloat16"

    userids = np.arange(100)
    i1, s1 = single.recommend(userids, likes, N=8)
    i2, s2 = meshed.recommend(userids, likes, N=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    i1, s1 = single.similar_items(np.arange(20), N=5)
    i2, s2 = meshed.similar_items(np.arange(20), N=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_mesh_serving_bf16_subset_consistent():
    """items=/users= subset serving on a mesh uses the same bf16-rounded
    table as the full catalog: self-similarity stays exactly ~1 and subset
    results agree with the single-device subset path."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(6)
    likes = sparse_random(80, 60, density=0.12, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 6, n).astype(np.float64))
    likes = likes.tocsr()

    single = AlternatingLeastSquares(factors=16, iterations=4, random_state=2,
                                     dtype=np.float16)
    single.fit(likes, show_progress=False)
    meshed = AlternatingLeastSquares(factors=16, random_state=2,
                                     dtype=np.float16, mesh=8)
    meshed.user_factors = single.user_factors.copy()
    meshed.item_factors = single.item_factors.copy()

    subset = np.arange(0, 60, 2)
    for model in (single, meshed):
        ids, scores = model.similar_items(np.arange(0, 20, 2), N=5, items=subset)
        # each even item is in the subset, so it must rank itself first at ~1
        np.testing.assert_array_equal(ids[:, 0], np.arange(0, 20, 2))
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-5)

    i1, s1 = single.recommend(np.arange(10), likes[:10], N=5, items=subset)
    i2, s2 = meshed.recommend(np.arange(10), likes[:10], N=5, items=subset)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_row_sharded_on_device_pack_matches_host():
    """The sharded on-device packing produces bit-identical class tensors to
    the host packer (the single-COO-upload trick, multi-chip twin)."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.parallel import RowShardedBuckets, create_mesh

    mesh = create_mesh(8)
    rng = np.random.default_rng(21)
    csr = sparse_random(150, 90, density=0.15, random_state=rng,
                        data_rvs=lambda n: rng.integers(1, 9, n).astype(np.float64),
                        format="csr")
    csr = csr.tocsr()
    csr.sort_indices()

    host = RowShardedBuckets(csr, mesh, grid="fine", on_device_pack=False)
    dev = RowShardedBuckets(csr, mesh, grid="fine", on_device_pack=True)

    assert len(host.classes) == len(dev.classes)
    for h, d in zip(host.classes, dev.classes):
        assert (h.L, h.n_chunks, h.C) == (d.L, d.n_chunks, d.C)
        np.testing.assert_array_equal(np.asarray(h.rows), np.asarray(d.rows))
        np.testing.assert_array_equal(np.asarray(h.indices), np.asarray(d.indices))
        np.testing.assert_array_equal(np.asarray(h.data), np.asarray(d.data))


def test_row_sharded_fit_on_device_pack_end_to_end():
    """mesh= ALS trains through the on-device-pack path to the same factors
    as single-device training (tightened tolerance parity check)."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(22)
    likes = sparse_random(90, 60, density=0.12, random_state=rng,
                          data_rvs=lambda n: rng.integers(1, 6, n).astype(np.float64),
                          format="csr").tocsr()

    single = AlternatingLeastSquares(factors=16, iterations=6, random_state=4)
    single.fit(likes, show_progress=False)
    meshed = AlternatingLeastSquares(factors=16, iterations=6, random_state=4,
                                     mesh=8)
    meshed.fit(likes, show_progress=False)
    np.testing.assert_allclose(single.user_factors, meshed.user_factors,
                               atol=2e-4)
    np.testing.assert_allclose(single.item_factors, meshed.item_factors,
                               atol=2e-4)


def test_streaming_topk_on_mesh_matches_single_device():
    """topk_streaming(mesh=...) — blocks row-sharded over the chips with an
    ICI candidate merge per block — returns results identical to the
    single-device streaming path and to resident topk, across filters,
    norms, block boundaries, and k > n_items."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.ops.topk import topk, topk_streaming

    mesh = create_mesh(8)
    rng = np.random.default_rng(31)
    items = rng.standard_normal((700, 24)).astype(np.float32)
    queries = rng.standard_normal((33, 24)).astype(np.float32)
    qf = sparse_random(33, 700, density=0.05,
                       random_state=np.random.RandomState(32), format="csr")
    qf.data[:] = 1.0
    fi = rng.choice(700, size=40, replace=False)
    norms = np.linalg.norm(items, axis=1)

    kw = dict(item_norms=norms, filter_query_items=qf, filter_items=fi)
    ids_r, vals_r = topk(items, queries, 10, **kw)
    ids_s, vals_s = topk_streaming(items, queries, 10, block_rows=256, **kw)
    ids_m, vals_m = topk_streaming(items, queries, 10, block_rows=256,
                                   mesh=mesh, **kw)
    np.testing.assert_array_equal(ids_r, ids_m)
    np.testing.assert_array_equal(ids_s, ids_m)
    np.testing.assert_allclose(vals_r, vals_m, rtol=1e-6)

    # no filters/norms; block size not a multiple of the mesh (rounds up)
    ids_r2, _ = topk(items, queries, 7)
    ids_m2, _ = topk_streaming(items, queries, 7, block_rows=100, mesh=mesh)
    np.testing.assert_array_equal(ids_r2, ids_m2)

    # k exceeding the catalog pads with -1 exactly like single-device
    small = items[:7]
    ids_r3, vals_r3 = topk(small, queries[:3], 12)
    ids_m3, vals_m3 = topk_streaming(small, queries[:3], 12, block_rows=128,
                                     mesh=mesh)
    np.testing.assert_array_equal(ids_r3, ids_m3)
    assert (ids_m3[:, 7:] == -1).all()


def test_meshed_model_streams_beyond_pooled_budget(monkeypatch):
    """A meshed model whose table exceeds the MESH's pooled budget serves
    through sharded streaming (blocks row-sharded per pass) with results
    identical to single-device resident serving."""
    from scipy.sparse import random as sparse_random

    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.models import mf_base

    rng = np.random.default_rng(33)
    users, items_n, f = 90, 120, 16
    uf = rng.standard_normal((users, f)).astype(np.float32)
    itf = rng.standard_normal((items_n, f)).astype(np.float32)
    likes = sparse_random(users, items_n, density=0.1,
                          random_state=np.random.RandomState(34), format="csr")
    likes.data[:] = 1.0

    resident = AlternatingLeastSquares(factors=f)
    resident.user_factors = uf.copy()
    resident.item_factors = itf.copy()
    userids = np.arange(40)
    r_ids, r_scores = resident.recommend(userids, likes[userids], N=8)
    r_sim, _ = resident.similar_items(np.arange(20), N=6)

    # threshold below table-bytes/8: even the pooled mesh budget overflows
    monkeypatch.setattr(mf_base, "_stream_threshold_bytes", lambda: 128)
    meshed = AlternatingLeastSquares(factors=f, mesh=8)
    meshed.user_factors = uf.copy()
    meshed.item_factors = itf.copy()
    m_ids, m_scores = meshed.recommend(userids, likes[userids], N=8)
    m_sim, _ = meshed.similar_items(np.arange(20), N=6)

    np.testing.assert_array_equal(r_ids, m_ids)
    np.testing.assert_allclose(r_scores, m_scores, rtol=1e-6)
    np.testing.assert_array_equal(r_sim, m_sim)
    # the resident mesh cache must never have been populated
    assert not any(k[0] in ("user", "item")
                   for k in meshed._mesh_serving_cache)

    # above the pooled budget but below the single-chip one: resident
    # mesh serving takes over again
    table_bytes = items_n * f * 4
    monkeypatch.setattr(mf_base, "_stream_threshold_bytes",
                        lambda: table_bytes // 4)
    meshed2 = AlternatingLeastSquares(factors=f, mesh=8)
    meshed2.user_factors = uf.copy()
    meshed2.item_factors = itf.copy()
    m2_ids, _ = meshed2.recommend(userids, likes[userids], N=8)
    np.testing.assert_array_equal(r_ids, m2_ids)
    assert any(k[0] == "item" for k in meshed2._mesh_serving_cache)


# ---------------------------------------------------------------------------
# meshed KNN / EASE fit
# ---------------------------------------------------------------------------


def test_dense_gramian_meshed_matches_dense():
    from implicit_tpu.nearest_neighbours import _dense_gramian_meshed

    mesh = create_mesh(8)
    # items=17 is indivisible by 8: exercises the row padding
    mat = _random_csr(users=40, items=17, seed=3)
    S, block = _dense_gramian_meshed(mat, mesh)
    assert block == 3 and S.shape == (24, 17)
    got = np.asarray(S)
    np.testing.assert_allclose(got[:17], (mat.T @ mat).toarray(), rtol=1e-5, atol=1e-5)
    assert not got[17:].any()  # padding rows stay zero


def test_all_pairs_knn_device_meshed_matches_host():
    from implicit_tpu.nearest_neighbours import all_pairs_knn

    mesh = create_mesh(8)
    mat = _random_csr(users=60, items=23, seed=4)
    host = all_pairs_knn(mat, 5, method="host").tocsr()
    dev = all_pairs_knn(mat, 5, method="device", mesh=mesh).tocsr()
    assert host.shape == dev.shape
    for row in range(23):
        h = dict(zip(host[row].indices, host[row].data))
        for col, val in zip(dev[row].indices, dev[row].data):
            # ties at the K boundary may pick different columns; values of
            # shared columns must agree (same check as the single-device test)
            if col in h:
                np.testing.assert_allclose(val, h[col], rtol=1e-4, atol=1e-5)
        # row top-1 is unambiguous: must match exactly
        if h:
            assert dev[row].indices[np.argmax(dev[row].data)] == max(h, key=h.get)


def test_knn_model_fit_on_mesh_matches_single_device():
    # distinct random values (no ties): host-fit and meshed-device-fit
    # models must serve identical top-1 recommendations
    import implicit_tpu.nearest_neighbours as nn

    likes = _random_csr(users=50, items=21, seed=6)
    single = nn.CosineRecommender(K=10)
    single.fit(likes)

    meshed = nn.CosineRecommender(K=10, mesh=create_mesh(8))
    # force the device path (the cost model keeps tiny fits on the host)
    weighted = nn.normalize(likes.T).T.tocsr()
    weighted.data = np.abs(weighted.data)
    meshed.similarity = nn.all_pairs_knn(
        weighted, 10, method="device", mesh=meshed.mesh
    ).tocsr()
    meshed.scorer = nn.NearestNeighboursScorer(meshed.similarity)

    ids_s, _ = single.recommend(np.arange(50), likes, N=3)
    ids_m, _ = meshed.recommend(np.arange(50), likes, N=3)
    np.testing.assert_array_equal(ids_s[:, 0], ids_m[:, 0])


def test_ease_weights_meshed_matches_single_device():
    from implicit_tpu.ease import ease_weights

    mesh = create_mesh(8)
    mat = _random_csr(users=50, items=19, seed=5)
    B1 = np.asarray(ease_weights(mat, 5.0))
    Bm = np.asarray(ease_weights(mat, 5.0, mesh=mesh))
    assert Bm.shape == B1.shape  # public fn trims the row padding
    np.testing.assert_allclose(Bm, B1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.diag(Bm), 0.0, atol=0)


def test_ease_fit_on_mesh_matches_single_device():
    from implicit_tpu.ease import EASERecommender

    # binarize=False keeps the distinct random values: no exact B ties, so
    # the top-K selections are deterministic across both layouts
    likes = _random_csr(users=50, items=19, seed=7)
    single = EASERecommender(K=8, regularization=1.0, binarize=False)
    single.fit(likes)
    meshed = EASERecommender(K=8, regularization=1.0, binarize=False, mesh=8)
    meshed.fit(likes)

    np.testing.assert_allclose(
        meshed.similarity.toarray(), single.similarity.toarray(),
        rtol=1e-4, atol=1e-5,
    )

    # serving parity end-to-end + pickle degrades the live mesh to an int
    import pickle

    ids_s, _ = single.recommend(np.arange(50), likes, N=5)
    ids_m, _ = meshed.recommend(np.arange(50), likes, N=5)
    np.testing.assert_array_equal(ids_s[:, 0], ids_m[:, 0])
    restored = pickle.loads(pickle.dumps(meshed))
    assert restored.mesh == 8


def test_meshed_knn_ease_tiny_catalog_and_empty():
    """Catalogs smaller than the mesh (padding-dominant) and nnz=0."""
    from implicit_tpu.ease import ease_weights
    from implicit_tpu.nearest_neighbours import all_pairs_knn
    from scipy.sparse import csr_matrix

    mesh = create_mesh(8)
    mat = _random_csr(users=20, items=3, seed=8)  # 3 items on 8 devices
    host = all_pairs_knn(mat, 2, method="host").toarray()
    dev = all_pairs_knn(mat, 2, method="device", mesh=mesh).toarray()
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ease_weights(mat, 1.0, mesh=mesh)),
        np.asarray(ease_weights(mat, 1.0)),
        rtol=1e-4, atol=1e-5,
    )

    empty = csr_matrix((10, 5))
    assert all_pairs_knn(empty, 3, method="device", mesh=mesh).nnz == 0


def test_row_sharded_gather_quant_matches_single_device():
    """gather_quant over the mesh: each shard quantizes its own rows before
    the all-gather (per-row scales are row-local, so the quantized table is
    identical math to the single-device one). Factor-level equality is NOT
    the contract here — int8 rounding sits at .5 boundaries where f32
    reduction-order noise flips values and amplifies across iterations — so
    this gates on behavior: converged loss and recommendation overlap."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.models.als import calculate_loss

    Cui = _random_csr(users=400, items=250, seed=13)
    single = AlternatingLeastSquares(factors=32, iterations=4, random_state=7,
                                     gather_quant=True)
    single.fit(Cui, show_progress=False)
    meshed = AlternatingLeastSquares(factors=32, iterations=4, random_state=7,
                                     mesh=8, gather_quant=True)
    meshed.fit(Cui, show_progress=False)

    l1 = calculate_loss(Cui, single.user_factors, single.item_factors, 0.01)
    l2 = calculate_loss(Cui, meshed.user_factors, meshed.item_factors, 0.01)
    assert abs(l1 - l2) / abs(l1) < 0.02
    ids1, _ = single.recommend(np.arange(40), Cui[:40], N=10)
    ids2, _ = meshed.recommend(np.arange(40), Cui[:40], N=10)
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(ids1, ids2)])
    assert overlap > 0.8, overlap
