"""npz checkpoint compatibility with the reference's on-disk format.

The reference saves each model as a flat ``.npz`` of factor arrays plus
scalar hyperparameters (ALS: /root/reference/implicit/cpu/als.py:458-477,
BPR: /root/reference/implicit/cpu/bpr.pyx:228-244, LMF:
/root/reference/implicit/cpu/lmf.pyx:201-217, KNN similarity CSR:
/root/reference/implicit/nearest_neighbours.py:166-190) and loads via a
generic setattr loop (/root/reference/implicit/recommender_base.py:174-202).

These tests write files with exactly the reference's key layout (built here
by hand — the reference's compiled modules aren't importable in this image)
and assert our classes load them into working models, and that our own
``save`` emits a superset of the reference's keys so files travel the other
direction too.
"""

import io

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from implicit_tpu.bpr import BayesianPersonalizedRanking
from implicit_tpu.lmf import LogisticMatrixFactorization
from implicit_tpu.models.als import AlternatingLeastSquares as ALSModel
from implicit_tpu.models.bpr import BayesianPersonalizedRanking as BPRModel
from implicit_tpu.models.lmf import LogisticMatrixFactorization as LMFModel
from implicit_tpu.nearest_neighbours import BM25Recommender, ItemItemRecommender


def _likes():
    rng = np.random.RandomState(0)
    dense = (rng.rand(30, 20) < 0.3).astype(np.float32) * 5
    return csr_matrix(dense)


def _reference_als_npz(users=30, items=20, factors=8):
    """An npz byte-for-byte shaped like reference cpu ALS save()."""
    rng = np.random.RandomState(1)
    buf = io.BytesIO()
    np.savez(
        buf,
        user_factors=rng.rand(users, factors).astype(np.float32),
        item_factors=rng.rand(items, factors).astype(np.float32),
        regularization=0.01,
        factors=factors,
        num_threads=0,
        iterations=15,
        use_native=True,
        use_cg=True,
        cg_steps=3,
        calculate_training_loss=False,
        dtype="float32",
        alpha=1.0,
    )
    buf.seek(0)
    return buf


def test_load_reference_als_checkpoint():
    model = ALSModel.load(_reference_als_npz())
    assert model.factors == 8
    assert model.regularization == pytest.approx(0.01)
    assert model.iterations == 15
    assert model.dtype == np.float32
    assert model.user_factors.shape == (30, 8)

    # the loaded model serves: top-k over the restored factors
    likes = csr_matrix((30, 20), dtype=np.float32)
    ids, scores = model.recommend(3, likes[3], N=5)
    assert ids.shape == (5,)
    assert np.isfinite(scores).all()

    # and supports warm-start refit (fit skips init when factors exist)
    before = model.user_factors.copy()
    model.fit(_likes(), show_progress=False)
    assert model.user_factors.shape == before.shape


def test_load_reference_bpr_checkpoint():
    rng = np.random.RandomState(2)
    buf = io.BytesIO()
    np.savez(
        buf,
        user_factors=rng.rand(30, 9).astype(np.float32),  # factors+1 layout
        item_factors=rng.rand(20, 9).astype(np.float32),
        regularization=0.01,
        factors=8,
        learning_rate=0.01,
        verify_negative_samples=True,
        num_threads=0,
        iterations=100,
        dtype="float32",
    )
    buf.seek(0)
    model = BPRModel.load(buf)
    assert model.factors == 8
    assert model.verify_negative_samples is True
    assert model.user_factors.shape == (30, 9)
    ids, _ = model.recommend(0, csr_matrix((30, 20), dtype=np.float32)[0], N=4)
    assert ids.shape == (4,)


def test_load_reference_lmf_checkpoint():
    rng = np.random.RandomState(3)
    buf = io.BytesIO()
    np.savez(
        buf,
        user_factors=rng.rand(30, 10).astype(np.float32),  # factors+2 layout
        item_factors=rng.rand(20, 10).astype(np.float32),
        regularization=0.6,
        factors=8,
        learning_rate=1.0,
        neg_prop=30,
        num_threads=0,
        iterations=30,
        dtype="float32",
    )
    buf.seek(0)
    model = LMFModel.load(buf)
    assert model.factors == 8
    assert model.neg_prop == 30
    ids, _ = model.recommend(1, csr_matrix((30, 20), dtype=np.float32)[1], N=4)
    assert ids.shape == (4,)


def test_load_reference_knn_checkpoint():
    sim = csr_matrix(np.triu(np.random.RandomState(4).rand(20, 20), 1).astype(np.float32))
    buf = io.BytesIO()
    np.savez(buf, K=7, shape=sim.shape, data=sim.data, indptr=sim.indptr,
             indices=sim.indices)
    buf.seek(0)
    model = ItemItemRecommender.load(buf)
    assert model.K == 7
    assert (model.similarity != sim).nnz == 0
    likes = _likes()[:20]
    ids, _ = model.recommend(0, likes[0], N=3)
    assert ids.shape == (3,)


REFERENCE_SAVE_KEYS = {
    # /root/reference/implicit/cpu/als.py:459-473 (None-valued keys dropped)
    "als": {"user_factors", "item_factors", "regularization", "factors",
            "num_threads", "iterations", "use_native", "use_cg", "cg_steps",
            "calculate_training_loss", "dtype", "alpha"},
    # /root/reference/implicit/cpu/bpr.pyx:229-239
    "bpr": {"user_factors", "item_factors", "regularization", "factors",
            "learning_rate", "verify_negative_samples", "num_threads",
            "iterations", "dtype"},
    # /root/reference/implicit/cpu/lmf.pyx:202-212
    "lmf": {"user_factors", "item_factors", "regularization", "factors",
            "learning_rate", "neg_prop", "num_threads", "iterations", "dtype"},
    # /root/reference/implicit/nearest_neighbours.py:166-173
    "knn": {"K", "shape", "data", "indptr", "indices"},
}


def _saved_keys(model):
    buf = io.BytesIO()
    model.save(buf)
    buf.seek(0)
    with np.load(buf, allow_pickle=False) as data:
        return set(data.keys())


@pytest.mark.parametrize("name,make", [
    ("als", lambda: __import__("implicit_tpu.als", fromlist=["x"])
        .AlternatingLeastSquares(factors=8, iterations=2, random_state=0)),
    ("bpr", lambda: BayesianPersonalizedRanking(factors=8, iterations=2,
                                                random_state=0)),
    ("lmf", lambda: LogisticMatrixFactorization(factors=8, iterations=2,
                                                random_state=0)),
    ("knn", lambda: BM25Recommender(K=5)),
])
def test_our_save_covers_reference_keys(name, make):
    """A file we save carries every key the reference's save would."""
    model = make()
    model.fit(_likes(), show_progress=False)
    assert REFERENCE_SAVE_KEYS[name] <= _saved_keys(model)
