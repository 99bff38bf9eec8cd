"""Head-to-head parity against the ACTUAL reference implementation.

The reference's compiled Cython kernels cannot be built in this environment
(no Cython, no network for build isolation), but the package ships pure-numpy
solvers (/root/reference/implicit/cpu/als.py:480-577) and
``AlternatingLeastSquares(use_native=False)`` runs ``fit()`` entirely through
them (solver dispatch at /root/reference/implicit/cpu/als.py:419-423). These
tests import the reference's OWN Python source from ``/root/reference`` —
with only its compiled extension modules stubbed — and run it against this
framework on identical data, hyperparameters and factor initialization.

This converts the "numerical parity with the reference" claim from asserted
(numpy oracles we wrote ourselves) to proven (the reference's code, executed
from its own tree). Scope: ALS only — BPR/LMF/KNN/evaluation exist solely as
compiled Cython in the reference, with no pure-Python fallback to run.

The reference's own acceptance gate for ALS is reconstruction of every cell
to 1e-3 (/root/reference/tests/als_test.py:146-186); we assert that for both
implementations plus direct factor agreement and same-data recommend/p@10
agreement.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
from scipy.sparse import csr_matrix, random as sparse_random

from implicit_tpu.als import AlternatingLeastSquares

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "implicit", "cpu")),
    reason="reference source tree not available",
)


def _numpy_topk(items, query, k, item_norms=None, filter_query_items=None,
                filter_items=None, num_threads=0):
    """Minimal numpy stand-in for the reference's compiled topk
    (/root/reference/implicit/cpu/topk.pyx:15-67): GEMM, -FLT_MAX filter
    sentinels, descending-sorted top-k. Lets the reference's recommend()
    run unmodified so serving semantics can be compared end-to-end."""
    if query.ndim == 1:
        query = query.reshape(1, -1)
    scores = query @ items.T
    if item_norms is not None:
        scores = scores / item_norms
    neg_max = -np.finfo(np.float32).max
    if filter_items is not None:
        scores[:, np.asarray(filter_items)] = neg_max
    if filter_query_items is not None:
        for r in range(scores.shape[0]):
            cols = filter_query_items.indices[
                filter_query_items.indptr[r]:filter_query_items.indptr[r + 1]]
            scores[r, cols] = neg_max
    k = min(k, scores.shape[1])
    ids = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
    row_scores = np.take_along_axis(scores, ids, axis=1)
    order = np.argsort(-row_scores, axis=1, kind="stable")
    return (np.take_along_axis(ids, order, axis=1).astype("int32"),
            np.take_along_axis(row_scores, order, axis=1))


def _load_reference_als():
    """Import the reference's Python layer from its source tree.

    Builds a fake ``implicit`` package skeleton (so the reference's relative
    imports resolve against /root/reference without executing the package
    ``__init__`` which pulls in compiled bpr/lmf/KNN modules), stubs the two
    compiled extension modules the ALS stack touches (``implicit.cpu._als``,
    ``implicit.cpu.topk``) and loads everything else verbatim.
    """
    if "implicit.cpu.als" in sys.modules:
        return sys.modules["implicit.cpu.als"]

    ref_pkg = os.path.join(REFERENCE_ROOT, "implicit")

    pkg = types.ModuleType("implicit")
    pkg.__path__ = [ref_pkg]
    cpu = types.ModuleType("implicit.cpu")
    cpu.__path__ = [os.path.join(ref_pkg, "cpu")]
    sys.modules["implicit"] = pkg
    sys.modules["implicit.cpu"] = cpu

    def _not_built(*_a, **_k):
        raise RuntimeError("compiled reference kernel not built in this environment")

    als_stub = types.ModuleType("implicit.cpu._als")
    als_stub.least_squares = _not_built
    als_stub.least_squares_cg = _not_built
    als_stub.calculate_loss = _not_built
    sys.modules["implicit.cpu._als"] = als_stub

    topk_stub = types.ModuleType("implicit.cpu.topk")
    topk_stub.topk = _numpy_topk
    sys.modules["implicit.cpu.topk"] = topk_stub

    for name, rel in [
        ("implicit.recommender_base", "recommender_base.py"),
        ("implicit.utils", "utils.py"),
        ("implicit.cpu.matrix_factorization_base", "cpu/matrix_factorization_base.py"),
        ("implicit.cpu.als", "cpu/als.py"),
    ]:
        spec = importlib.util.spec_from_file_location(name, os.path.join(ref_pkg, rel))
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)

    return sys.modules["implicit.cpu.als"]


def _paired_models(factors, regularization, use_cg, iterations, users, items,
                   seed=17, dtype=np.float64):
    """Reference and TPU models with identical hyperparameters and init."""
    ref_als = _load_reference_als()
    rng = np.random.default_rng(seed)
    X0 = (rng.random((users, factors)) * 0.01).astype(dtype)
    Y0 = (rng.random((items, factors)) * 0.01).astype(dtype)

    ref = ref_als.AlternatingLeastSquares(
        factors=factors, regularization=regularization, use_native=False,
        use_cg=use_cg, iterations=iterations, dtype=dtype)
    ref.user_factors = X0.copy()
    ref.item_factors = Y0.copy()

    ours = AlternatingLeastSquares(
        factors=factors, regularization=regularization, use_cg=use_cg,
        iterations=iterations, dtype=dtype)
    ours.user_factors = X0.copy()
    ours.item_factors = Y0.copy()
    return ref, ours


def _random_likes(users, items, density, seed):
    rng = np.random.default_rng(seed)
    m = sparse_random(users, items, density=density, random_state=rng,
                      data_rvs=lambda n: rng.integers(1, 10, n).astype(np.float64))
    m = csr_matrix(m)
    # no empty rows/cols: give every user and item at least one interaction
    diag = csr_matrix((np.ones(min(users, items)),
                       (np.arange(min(users, items)), np.arange(min(users, items)))),
                      shape=(users, items))
    return csr_matrix(m + diag)


@pytest.mark.parametrize("use_cg", [False, True], ids=["cholesky", "cg"])
def test_als_factors_match_reference(use_cg):
    """Same data, same init, same hyperparameters -> same factors.

    The CG path iterates 3 CG steps from the previous iterate exactly like
    the reference (/root/reference/implicit/cpu/als.py:528-577), so factor
    trajectories should agree to accumulation error; the Cholesky/solve path
    is a direct linear solve and should agree even tighter.
    """
    from jax import enable_x64

    likes = _random_likes(60, 40, 0.1, seed=3)
    ref, ours = _paired_models(factors=16, regularization=0.01, use_cg=use_cg,
                               iterations=8, users=60, items=40)
    ref.fit(likes, show_progress=False)
    with enable_x64():
        ours.fit(likes, show_progress=False)

    np.testing.assert_allclose(ours.user_factors, ref.user_factors,
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(ours.item_factors, ref.item_factors,
                               rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("use_cg", [False, True], ids=["cholesky", "cg"])
def test_als_reconstruction_reference_gate(use_cg):
    """Both implementations pass the reference's own 1e-3 reconstruction
    gate (/root/reference/tests/als_test.py:146-186) on the same input."""
    from jax import enable_x64

    counts = csr_matrix(np.array([
        [1, 0, 0, 1, 0, 0],
        [0, 1, 0, 0, 1, 0],
        [0, 0, 1, 0, 0, 1],
        [1, 1, 0, 0, 0, 0],
        [0, 0, 1, 1, 0, 0],
        [0, 1, 0, 0, 0, 1],
        [1, 0, 0, 0, 1, 1],
    ], dtype=np.float64))
    ref, ours = _paired_models(factors=6, regularization=0, use_cg=use_cg,
                               iterations=25, users=7, items=6, seed=9)
    ref.fit(counts * 2, show_progress=False)
    with enable_x64():
        ours.fit(counts * 2, show_progress=False)

    dense = counts.toarray()
    for model in (ref, ours):
        recon = model.user_factors @ model.item_factors.T
        assert np.allclose(recon, dense, atol=1e-3), (
            "failed reference reconstruction gate")


def test_als_recommend_agreement():
    """End-to-end recommend() head-to-head: the reference's serving stack
    (matrix_factorization_base.recommend over topk) and ours produce the
    same rankings from the same fit, including liked-item filtering."""
    from jax import enable_x64

    likes = _random_likes(80, 50, 0.08, seed=5)
    ref, ours = _paired_models(factors=16, regularization=0.01, use_cg=True,
                               iterations=10, users=80, items=50)
    ref.fit(likes, show_progress=False)
    with enable_x64():
        ours.fit(likes, show_progress=False)

    userids = np.arange(80)
    ref_ids, ref_scores = ref.recommend(userids, likes, N=10)
    our_ids, our_scores = ours.recommend(userids, likes, N=10)

    # scores agree numerically -> rankings agree except where scores tie
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-3, atol=1e-5)
    agree = (ref_ids == our_ids).mean()
    assert agree > 0.98, f"top-10 id agreement only {agree:.3f}"


def test_als_p10_parity_clustered():
    """Same-data ranking quality parity on a clustered synthetic set."""
    from jax import enable_x64

    from implicit_tpu.datasets.synthetic import get_synthetic_clustered
    from implicit_tpu.evaluation import ranking_metrics_at_k, train_test_split

    plays = get_synthetic_clustered(600, 200, groups=10, likes_per_user=15, seed=11)
    train, test = train_test_split(plays, 0.8, random_state=11)

    ref, ours = _paired_models(factors=32, regularization=0.01, use_cg=True,
                               iterations=15, users=600, items=200, seed=13)
    ref.fit(train, show_progress=False)
    with enable_x64():
        ours.fit(train, show_progress=False)

    # evaluate both through OUR metrics stack so the comparison isolates the
    # models (the reference's ranking_metrics_at_k is compiled-only)
    ref_p = ranking_metrics_at_k(ref, train, test, K=10, show_progress=False)["precision"]
    our_p = ranking_metrics_at_k(ours, train, test, K=10, show_progress=False)["precision"]
    assert abs(ref_p - our_p) < 0.02, (ref_p, our_p)


def _load_reference_nn():
    """Import the reference's nearest_neighbours module (pure Python apart
    from the compiled scorer/all_pairs_knn, which the weighting functions
    never touch) from its source tree."""
    if "implicit.nearest_neighbours" in sys.modules:
        return sys.modules["implicit.nearest_neighbours"]
    _load_reference_als()  # builds the package skeleton + utils
    nn_stub = types.ModuleType("implicit._nearest_neighbours")

    def _not_built(*_a, **_k):
        raise RuntimeError("compiled reference kernel not built in this environment")

    nn_stub.NearestNeighboursScorer = _not_built
    nn_stub.all_pairs_knn = _not_built
    sys.modules["implicit._nearest_neighbours"] = nn_stub
    rel = os.path.join(REFERENCE_ROOT, "implicit", "nearest_neighbours.py")
    spec = importlib.util.spec_from_file_location("implicit.nearest_neighbours", rel)
    module = importlib.util.module_from_spec(spec)
    sys.modules["implicit.nearest_neighbours"] = module
    spec.loader.exec_module(module)
    return module


@pytest.mark.parametrize("fn", ["bm25_weight", "tfidf_weight", "normalize"])
def test_weighting_parity(fn):
    """The KNN weighting transforms match the reference's own code
    elementwise (/root/reference/implicit/nearest_neighbours.py:222-258)."""
    import implicit_tpu.nearest_neighbours as ours_nn

    ref_nn = _load_reference_nn()
    likes = _random_likes(300, 120, density=0.05, seed=5).astype(np.float64)
    ref_out = csr_matrix(getattr(ref_nn, fn)(likes.copy())).toarray()
    our_out = csr_matrix(getattr(ours_nn, fn)(likes.copy())).toarray()
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-12, atol=1e-12)


def test_augment_inner_product_parity():
    """augment_inner_product_matrix matches the reference's transform
    (/root/reference/implicit/utils.py:86) — same max-norm scaling and the
    same extra-column geometry."""
    from implicit_tpu.utils import augment_inner_product_matrix

    _load_reference_als()
    ref_fn = sys.modules["implicit.utils"].augment_inner_product_matrix
    rng = np.random.default_rng(3)
    factors = rng.standard_normal((50, 8)).astype(np.float32)
    ref_norm, ref_aug = ref_fn(factors.copy())
    our_norm, our_aug = augment_inner_product_matrix(factors.copy())
    assert ref_norm == pytest.approx(our_norm)
    np.testing.assert_allclose(our_aug, ref_aug, rtol=1e-6, atol=1e-7)
