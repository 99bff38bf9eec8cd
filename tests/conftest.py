"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip logic is tested the JAX way — with
``--xla_force_host_platform_device_count`` — since real multi-chip hardware
isn't available in CI (the reference has no analogue: it is single-device by
design, see SURVEY.md §2.5).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# force the CPU backend even when an accelerator plugin (axon TPU) registered
# itself at interpreter startup and overrode JAX_PLATFORMS
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: re-runs of the suite skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from scipy.sparse import csr_matrix  # noqa: E402


def get_checkerboard(X):
    """Checkerboard likes matrix with the diagonal withheld.

    Even users like even items, odd users like odd items; the diagonal is
    withheld so the expected top-1 recommendation for user u is item u.
    """
    ret = np.zeros((X, X))
    for i in range(X):
        for j in range(i % 2, X, 2):
            ret[i, j] = 1.0
    return csr_matrix(ret - np.eye(X))


def make_als():
    from implicit_tpu.als import AlternatingLeastSquares

    return AlternatingLeastSquares(factors=32, regularization=0, random_state=23)


def make_als_cholesky():
    from implicit_tpu.als import AlternatingLeastSquares

    return AlternatingLeastSquares(factors=32, regularization=0, use_cg=False, random_state=23)


def make_als_f16():
    # 16-bit factor storage: bf16 solver math + bf16 serving GEMM — the
    # analogue of the reference mixin's fp16 GPU variant
    # (/root/reference/tests/als_test.py:24-34)
    from implicit_tpu.als import AlternatingLeastSquares

    return AlternatingLeastSquares(
        factors=32, regularization=0, dtype=np.float16, random_state=23
    )


def make_bpr():
    from implicit_tpu.bpr import BayesianPersonalizedRanking

    return BayesianPersonalizedRanking(
        factors=31, learning_rate=0.01, regularization=0, random_state=42
    )


def make_lmf():
    from implicit_tpu.lmf import LogisticMatrixFactorization

    return LogisticMatrixFactorization(factors=30, random_state=23)


def make_cosine():
    from implicit_tpu.nearest_neighbours import CosineRecommender

    return CosineRecommender(K=50)


def make_tfidf():
    from implicit_tpu.nearest_neighbours import TFIDFRecommender

    return TFIDFRecommender(K=50)


def make_bm25():
    from implicit_tpu.nearest_neighbours import BM25Recommender

    return BM25Recommender(K=50)


def make_ease():
    from implicit_tpu.ease import EASERecommender

    return EASERecommender(K=50, regularization=1.0)


MODEL_FACTORIES = {
    "als": make_als,
    "als_cholesky": make_als_cholesky,
    "als_f16": make_als_f16,
    "bpr": make_bpr,
    "lmf": make_lmf,
    "cosine": make_cosine,
    "tfidf": make_tfidf,
    "bm25": make_bm25,
    "ease": make_ease,
}


@pytest.fixture(params=sorted(MODEL_FACTORIES))
def model_factory(request):
    return MODEL_FACTORIES[request.param]
