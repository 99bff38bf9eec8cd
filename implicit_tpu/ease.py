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

        import functools

        @functools.partial(jax.jit, static_argnames=("k",))
        def topk_block(Bb, k):
            return jax.lax.top_k(Bb, k)

        k = int(min(self.K, items))
        row_block = max(8, min(items, (1 << 25) // max(items, 1)))
        pending = []
        for start in range(0, items, row_block):
            stop = min(start + row_block, items)
            pending.append((start, topk_block(B[start:stop], k)))

        triples = []
        for start, (vals, cols) in pending:
            vals = np.asarray(vals, dtype=np.float64)
            cols = np.asarray(cols)
            r, c = np.nonzero(vals != 0.0)  # negatives are meaningful in EASE
            triples.append(
                (r.astype(np.int32) + start, cols[r, c].astype(np.int32), vals[r, c])
            )

        rows = np.concatenate([t[0] for t in triples]) if triples else np.empty(0, np.int32)
        cols = np.concatenate([t[1] for t in triples]) if triples else np.empty(0, np.int32)
        vals = np.concatenate([t[2] for t in triples]) if triples else np.empty(0)
        self.similarity = sp.csr_matrix(
            sp.coo_matrix((vals, (rows, cols)), shape=(items, items))
        )
        self.scorer = NearestNeighboursScorer(self.similarity)

    def save(self, fileobj_or_path):
        args = {
            "K": self.K,
            "regularization": self.regularization,
            "binarize": self.binarize,
        }
        if self.similarity is not None:
            args.update(
                shape=self.similarity.shape,
                data=self.similarity.data,
                indptr=self.similarity.indptr,
                indices=self.similarity.indices,
            )
        np.savez(fileobj_or_path, **args)

    @classmethod
    def load(cls, fileobj_or_path):
        if isinstance(fileobj_or_path, str) and not fileobj_or_path.endswith(".npz"):
            fileobj_or_path = fileobj_or_path + ".npz"
        with np.load(fileobj_or_path, allow_pickle=False) as data:
            ret = cls()
            ret.K = int(data["K"])
            if "regularization" in data:
                ret.regularization = float(data["regularization"])
            if "binarize" in data:
                ret.binarize = bool(data["binarize"])
            if data.get("data") is not None:
                ret.similarity = sp.csr_matrix(
                    (data["data"], data["indices"], data["indptr"]),
                    shape=data["shape"],
                )
                ret.scorer = NearestNeighboursScorer(ret.similarity)
            return ret
