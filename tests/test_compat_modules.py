"""The reference's ``implicit.cpu.*`` / ``implicit.gpu.*`` module layout
(/root/reference/implicit/cpu/__init__.py, gpu/__init__.py) resolves here to
the unified TPU-native classes, so direct-submodule imports keep working."""

import numpy as np
from scipy.sparse import csr_matrix


def test_cpu_gpu_submodules_are_unified_classes():
    import implicit_tpu.cpu.als
    import implicit_tpu.cpu.bpr
    import implicit_tpu.cpu.lmf
    import implicit_tpu.cpu.matrix_factorization_base
    import implicit_tpu.gpu.als
    import implicit_tpu.gpu.bpr
    from implicit_tpu.models.als import AlternatingLeastSquares
    from implicit_tpu.models.bpr import BayesianPersonalizedRanking
    from implicit_tpu.models.lmf import LogisticMatrixFactorization
    from implicit_tpu.models.mf_base import MatrixFactorizationBase

    assert implicit_tpu.cpu.als.AlternatingLeastSquares is AlternatingLeastSquares
    assert implicit_tpu.gpu.als.AlternatingLeastSquares is AlternatingLeastSquares
    assert implicit_tpu.cpu.bpr.BayesianPersonalizedRanking is BayesianPersonalizedRanking
    assert implicit_tpu.gpu.bpr.BayesianPersonalizedRanking is BayesianPersonalizedRanking
    assert implicit_tpu.cpu.lmf.LogisticMatrixFactorization is LogisticMatrixFactorization
    assert (implicit_tpu.cpu.matrix_factorization_base.MatrixFactorizationBase
            is MatrixFactorizationBase)


def test_gpu_flags():
    import implicit_tpu.gpu as gpu

    # no CUDA in this build, ever; the factories ignore use_gpu anyway
    assert gpu.HAS_CUDA is False
    assert isinstance(gpu.HAS_TPU, bool)


def test_cpu_topk_alias_matches_reference_signature():
    """implicit.cpu.topk.topk's calling convention
    (/root/reference/implicit/cpu/topk.pyx:15) works through the alias."""
    from implicit_tpu.cpu.topk import topk

    rng = np.random.default_rng(0)
    items = rng.standard_normal((50, 8), dtype=np.float32)
    query = rng.standard_normal((4, 8), dtype=np.float32)
    filter_query_items = csr_matrix(
        (np.ones(2, np.float32), ([0, 1], [3, 7])), shape=(4, 50))
    ids, scores = topk(items, query, 5,
                       filter_query_items=filter_query_items,
                       filter_items=np.array([11, 12]))
    assert ids.shape == (4, 5) and scores.shape == (4, 5)
    assert 3 not in ids[0] and 7 not in ids[1]
    assert not np.isin(ids, [11, 12]).any()
    # agreement with a dense argsort oracle on the unfiltered query rows
    expected = np.argsort(-(query[2] @ items.T))
    expected = expected[~np.isin(expected, [11, 12])][:5]
    assert set(ids[2]) == set(expected)


def test_factory_consumes_gpu_flag():
    """The reference's own factory pattern
    (use_gpu=implicit.gpu.HAS_CUDA, /root/reference/implicit/als.py:14)
    runs end-to-end against the alias flag."""
    import implicit_tpu.gpu as gpu
    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(1)
    ui = csr_matrix((rng.random(60) + 0.5,
                     (rng.integers(0, 12, 60), rng.integers(0, 9, 60))),
                    shape=(12, 9))
    model = AlternatingLeastSquares(factors=4, iterations=2,
                                    use_gpu=gpu.HAS_CUDA, random_state=0)
    model.fit(ui, show_progress=False)
    ids, _ = model.recommend(0, ui[0], N=3)
    assert len(ids) == 3


def test_cpu_als_solver_function_aliases():
    """The reference exposes module-level solvers from implicit.cpu.als
    (/root/reference/implicit/cpu/als.py:480-577) and implicit.cpu._als
    (_als.pyx:67,145,251); both alias paths resolve to working callables."""
    import implicit_tpu.cpu._als as _als
    import implicit_tpu.cpu.als as cpu_als

    rng = np.random.default_rng(3)
    Cui = csr_matrix((rng.random(80).astype(np.float32) * 3 + 1,
                      (rng.integers(0, 20, 80), rng.integers(0, 15, 80))),
                     shape=(20, 15))
    Cui.sum_duplicates()
    X = rng.standard_normal((20, 6)).astype(np.float64) * 0.01
    Y = rng.standard_normal((15, 6)).astype(np.float64) * 0.01

    for mod in (cpu_als, _als):
        Xs, Ys = X.copy(), Y.copy()
        mod.least_squares(Cui, Xs, Ys.copy(), 0.1)
        assert np.isfinite(Xs).all() and not np.allclose(Xs, X)
        Xc = X.copy()
        mod.least_squares_cg(Cui, Xc, Y.copy(), 0.1, cg_steps=3)
        assert np.isfinite(Xc).all()
        loss = mod.calculate_loss(Cui, X, Y, 0.1)
        assert np.isfinite(loss) and loss > 0

    # per-row surface only on cpu.als (matching the reference layout)
    A, b = cpu_als.user_linear_equation(Y, Y.T @ Y, Cui, 0, 0.1, 6)
    x = cpu_als.user_factor(Y, Y.T @ Y, Cui, 0, 0.1, 6)
    assert np.allclose(A @ x, b, atol=1e-8)
    xi = cpu_als.item_factor(X, X.T @ X, Cui, 1, 0.1, 6)
    assert np.isfinite(xi).all()
