"""EASE — a closed-form item-item model (beyond-reference capability).

Implements the "Embarrassingly Shallow Autoencoder" of Steck (WWW 2019):

    B = argmin ||X - X B||_F^2 + lam ||B||_F^2   s.t.  diag(B) = 0

whose exact solution is one (items x items) inverse:

    P = (X^T X + lam I)^{-1}
    B_{ij} = -P_{ij} / P_{jj}  (i != j),   diag(B) = 0

EASE is a widely used strong baseline for implicit feedback that the
reference has no equivalent of (its closest family is the heuristic
item-item KNN models, /root/reference/implicit/nearest_neighbours.py:10-258).

TPU-first by construction: training cost is one dense MXU gramian (from a
single COO upload, the machinery of nearest_neighbours' device KNN path)
plus one O(items^3) Cholesky solve — exactly the shapes the MXU is built
for. The learned weights are top-K sparsified per row into the standard
ItemItemRecommender similarity CSR, so EASE serves, saves, loads and
pickles through the exact same stack as Cosine/TFIDF/BM25.
"""

import numpy as np
import scipy.sparse as sp

from .nearest_neighbours import ItemItemRecommender, NearestNeighboursScorer
from .utils import check_csr

# the solve holds ~3 (items x items) f32 buffers (gramian, factorization,
# inverse) in HBM: cap the catalog so 3 * items^2 * 4B stays inside one chip
_EASE_MAX_ITEMS = 32_000


def ease_weights(user_items, regularization=250.0):
    """Returns the dense EASE weight matrix ``B`` as a device array.

    ``B[j, v]`` is liked-item ``j``'s contribution to candidate ``v``'s
    score; rows of ``B`` are the item-item "similarity" in the serving
    formulation ``scores = user_likes @ B``. ``diag(B)`` is zero (the EASE
    constraint).
    """
    import jax
    import jax.numpy as jnp

    from .nearest_neighbours import _dense_gramian_device

    user_items = check_csr(user_items)
    items = user_items.shape[1]
    if items > _EASE_MAX_ITEMS:
        raise ValueError(
            f"EASE inverts a dense {items}^2 matrix on device; catalogs over "
            f"{_EASE_MAX_ITEMS} items don't fit one chip's HBM. Restrict the "
            "catalog (items with interactions) or use the KNN/ALS families."
        )

    S = _dense_gramian_device(user_items)

    @jax.jit
    def solve(S, lam):
        n = S.shape[0]
        eye = jnp.eye(n, dtype=jnp.float32)
        c, low = jax.scipy.linalg.cho_factor(S + lam * eye)
        P = jax.scipy.linalg.cho_solve((c, low), eye)
        B = -P / jnp.diag(P)[None, :]
        idx = jnp.arange(n)
        return B.at[idx, idx].set(0.0)

    return solve(S, jnp.float32(regularization))


class EASERecommender(ItemItemRecommender):
    """Item-item recommender with exact closed-form EASE weights.

    Parameters
    ----------
    K : int, optional
        Neighbours stored per item after top-K sparsifying the learned
        dense weights (EASE-topK; keeps serving identical in cost and
        machinery to the KNN models).
    regularization : float, optional
        The L2 term ``lam``. Larger values shrink the weights toward
        pure popularity; the EASE paper uses 100-1000 on binarized data.
    binarize : bool, optional
        Treat any interaction as 1.0 (the paper's setting, default). Set
        False to use the matrix values (e.g. bm25-weighted) as-is.
    num_threads : int, optional
        API parity; ignored.
    """

    def __init__(self, K=100, regularization=250.0, binarize=True, num_threads=0):
        super().__init__(K=K, num_threads=num_threads)
        self.regularization = regularization
        self.binarize = binarize

    def fit(self, user_items, show_progress=True, callback=None):
        """Solves the EASE weights and stores the K-sparsified similarity."""
        import jax
        import jax.numpy as jnp

        if callback:
            raise NotImplementedError("callback isn't supported on EASERecommender.fit")

        user_items = check_csr(user_items)
        if self.binarize:
            user_items = user_items.copy()
            user_items.data = np.ones_like(user_items.data)

        B = ease_weights(user_items, self.regularization)
        items = user_items.shape[1]

        # serving parity with the KNN family: the stored similarity's
        # diagonal is the item's self-affinity (strictly above its row max,
        # so similar_items ranks the item itself first). It only affects
        # already-liked candidates, which recommend() filters by default —
        # the EASE objective's diag(B)=0 is untouched for everything else.
        idx = jnp.arange(items)
        B = B.at[idx, idx].set(jnp.maximum(jnp.max(B, axis=1), 0.0) + 1.0)

        from .nearest_neighbours import _dense_topk_to_coo

        # negatives are meaningful in EASE: keep everything the top-K selects
        self.similarity = sp.csr_matrix(
            _dense_topk_to_coo(B, int(self.K), keep="nonzero"))
        self.scorer = NearestNeighboursScorer(self.similarity)

    def _save_args(self):
        # save/load themselves are inherited: the base load restores every
        # non-matrix key generically
        return {
            "K": self.K,
            "regularization": self.regularization,
            "binarize": self.binarize,
        }
