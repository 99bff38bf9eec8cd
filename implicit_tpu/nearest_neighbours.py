"""Item-item nearest-neighbour models (Cosine / TF-IDF / BM25).

Functional parity with /root/reference/implicit/nearest_neighbours.py:10-258
and its Cython kernels (implicit/_nearest_neighbours.pyx:43-171). Fitting
computes, for every item, the top-K most similar items under the weighted
inner product AᵀA; serving scores a user's liked-items row against the stored
similarity matrix.

The reference streams one sparse AᵀA row per OpenMP thread with a SMMP
accumulator. Here the similarity build runs as blocked sparse matmuls
(scipy's C spgemm over row blocks, memory-bounded by block sizing) with the
native per-row top-K selector from :mod:`implicit_tpu.native`. Like the
reference — which has no CUDA path for this model family — this fit is
host-side.
"""

import numpy as np
import scipy.sparse as sp

from .recommender_base import RecommenderBase
from .utils import _batch_call, check_csr

_NEG_MAX64 = -np.finfo(np.float64).max


# ---------------------------------------------------------------------------
# weighting transforms
# ---------------------------------------------------------------------------

def normalize(X):
    """L2-normalizes the rows of a sparse matrix."""
    X = sp.csr_matrix(X, copy=True)
    row_norm = np.sqrt(np.asarray(X.multiply(X).sum(axis=1)).ravel())
    scale = np.divide(1.0, row_norm, out=np.zeros_like(row_norm), where=row_norm > 0)
    return sp.diags(scale) @ X


def _idf(X):
    """log(N) - log1p(document frequency) per column, reference-compatible."""
    counts = np.bincount(X.tocoo().col, minlength=X.shape[1])
    return np.log(float(X.shape[0])) - np.log1p(counts)


def tfidf_weight(X):
    """Weights a sparse matrix by TF-IDF."""
    idf = _idf(X)
    X = sp.coo_matrix(X, copy=True)
    X.data = np.sqrt(X.data) * idf[X.col]
    return X


def bm25_weight(X, K1=100, B=0.8):
    """Weighs each row of a sparse matrix X by BM25 weighting."""
    idf = _idf(X)
    X = sp.coo_matrix(X, copy=True)

    row_sums = np.ravel(X.sum(axis=1))
    length_norm = (1.0 - B) + B * row_sums / row_sums.mean()

    X.data = X.data * (K1 + 1.0) / (K1 * length_norm[X.row] + X.data) * idf[X.col]
    return X


# ---------------------------------------------------------------------------
# similarity construction + scoring
# ---------------------------------------------------------------------------

def all_pairs_knn(user_items, K=100, show_progress=True, num_threads=0):
    """Returns the top K nearest neighbours for every item.

    ``user_items`` is the (weighted) users×items matrix; similarity is the
    inner product of item columns (rows of AᵀA), K-sparsified per row.
    Equivalent of /root/reference/implicit/_nearest_neighbours.pyx:113-171.
    """
    from . import native

    user_items = check_csr(user_items)
    n_items = user_items.shape[1]
    item_users = user_items.T.tocsr()
    item_users.sort_indices()

    # block rows so the intermediate spgemm product stays memory-bounded
    block = max(1, min(n_items, int(3.2e7 // max(n_items, 1)) or 1))

    triples = []
    for start in range(0, n_items, block):
        sim = (item_users[start : start + block] @ user_items).tocsr()
        r, c, v = native.topk_rows(
            sim.indptr, sim.indices, sim.data.astype(np.float64), K, row_offset=start
        )
        if len(r):
            triples.append((r, c, v))

    if not triples:
        return sp.coo_matrix((n_items, n_items), dtype=np.float64)

    rows = np.concatenate([t[0] for t in triples])
    cols = np.concatenate([t[1] for t in triples])
    vals = np.concatenate([t[2] for t in triples])
    return sp.coo_matrix((vals, (rows, cols)), shape=(n_items, n_items))


class NearestNeighboursScorer:
    """Scores a single user's liked-items row against a similarity CSR.

    Equivalent of the SMMP-based scorer at
    /root/reference/implicit/_nearest_neighbours.pyx:43-106.
    """

    def __init__(self, similarity):
        self.similarity = similarity.tocsr()

    def recommend(self, indptr, indices, data, K=10, remove_own_likes=True):
        likes = sp.csr_matrix((data, indices, indptr), shape=(1, self.similarity.shape[0]))
        scores = (likes @ self.similarity).toarray().ravel()
        if remove_own_likes:
            scores[indices] = 0

        candidates = np.flatnonzero(scores)
        if len(candidates) > K:
            keep = np.argpartition(scores[candidates], -K)[-K:]
            candidates = candidates[keep]
        best = candidates[np.argsort(scores[candidates])[::-1]]
        return best.astype(np.int32), scores[best]


# ---------------------------------------------------------------------------
# result post-processing shared by recommend / similar_items
# ---------------------------------------------------------------------------

def _drop_filtered(ids, scores, filter_items, limit=None):
    keep = np.isin(ids, filter_items, invert=True)
    ids, scores = ids[keep], scores[keep]
    if limit is not None:
        ids, scores = ids[:limit], scores[:limit]
    return ids, scores


def _restrict_to(ids, scores, items):
    """Keep only ids in ``items``; absent ones come back with -FLT_MAX scores."""
    keep = np.isin(ids, items)
    ids, scores = ids[keep], scores[keep]

    missing = items[np.isin(items, ids, invert=True)]
    if missing.size:
        ids = np.append(ids, missing)
        scores = np.append(scores, np.full(missing.size, _NEG_MAX64))
    return ids, scores


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

class ItemItemRecommender(RecommenderBase):
    """Base class for item-item nearest-neighbour recommender models.

    Parameters
    ----------
    K : int, optional
        Neighbours stored per item in the similarity matrix
    num_threads : int, optional
        API parity; ignored
    """

    def __init__(self, K=20, num_threads=0):
        self.similarity = None
        self.K = K
        self.num_threads = num_threads
        self.scorer = None

    def _weighted(self, counts):
        """Weighting transform applied before the similarity build."""
        return counts

    def fit(self, counts, show_progress=True, callback=None):
        """Computes and stores the K-sparsified item-item similarity matrix."""
        if callback:
            raise NotImplementedError("callback isn't supported on ItemItemRecommender.fit")

        weighted = self._weighted(counts)
        self.similarity = all_pairs_knn(
            weighted, self.K, show_progress=show_progress, num_threads=self.num_threads
        ).tocsr()
        self.scorer = NearestNeighboursScorer(self.similarity)

    def recommend(
        self,
        userid,
        user_items,
        N=10,
        filter_already_liked_items=True,
        filter_items=None,
        recalculate_user=False,
        items=None,
    ):
        if not isinstance(user_items, sp.csr_matrix):
            raise ValueError("user_items needs to be a CSR sparse matrix")

        if not np.isscalar(userid):
            if user_items.shape[0] != len(userid):
                raise ValueError("user_items must contain 1 row for every user in userids")
            return _batch_call(
                self.recommend,
                userid,
                user_items=user_items,
                N=N,
                score_dtype=np.float64,
                filter_already_liked_items=filter_already_liked_items,
                filter_items=filter_items,
                recalculate_user=recalculate_user,
                items=items,
            )

        if filter_items is not None and items is not None:
            raise ValueError("Can't specify both filter_items and items")

        # over-fetch when post-filtering; rank the whole catalog when items=
        fetch = N
        if filter_items is not None:
            fetch += len(filter_items)
        elif items is not None:
            items = np.array(items)
            fetch = self.similarity.shape[0]
            if items.max() >= fetch or items.min() < 0:
                raise IndexError("Some of selected itemids are not in the model")

        ids, scores = self.scorer.recommend(
            user_items.indptr,
            user_items.indices,
            user_items.data,
            K=fetch,
            remove_own_likes=filter_already_liked_items,
        )

        if filter_items is not None:
            ids, scores = _drop_filtered(ids, scores, filter_items, limit=fetch)
        elif items is not None:
            ids, scores = _restrict_to(ids, scores, items)
        return ids, scores

    recommend.__doc__ = RecommenderBase.recommend.__doc__

    def similar_items(
        self, itemid, N=10, recalculate_item=False, item_users=None, filter_items=None, items=None
    ):
        if recalculate_item:
            raise NotImplementedError("Recalculate_item isn't implemented")

        if not np.isscalar(itemid):
            return _batch_call(
                self.similar_items,
                itemid,
                N=N,
                score_dtype=np.float64,
                filter_items=filter_items,
                items=items,
            )

        if filter_items is not None and items is not None:
            raise ValueError("Can't specify both filter_items and items")

        if itemid >= self.similarity.shape[0]:
            return np.array([]), np.array([])

        row = self.similarity[itemid]
        ids, scores = row.indices, row.data

        if filter_items is not None:
            ids, scores = _drop_filtered(ids, scores, filter_items)
        elif items is not None:
            ids, scores = _restrict_to(ids, scores, items)

        order = np.argsort(scores)[::-1][:N]
        return ids[order], scores[order]

    similar_items.__doc__ = RecommenderBase.similar_items.__doc__

    def similar_users(self, userid, N=10, filter_users=None, users=None):
        raise NotImplementedError("similar_users isn't implemented for item-item recommenders")

    # -- persistence --------------------------------------------------------

    def __getstate__(self):
        state = self.__dict__.copy()
        del state["scorer"]  # holds no state beyond the similarity matrix
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.scorer = (
            NearestNeighboursScorer(self.similarity) if self.similarity is not None else None
        )

    def save(self, fileobj_or_path):
        args = {"K": self.K}
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
            ret.K = data["K"]
            if data.get("data") is not None:
                ret.similarity = sp.csr_matrix(
                    (data["data"], data["indices"], data["indptr"]), shape=data["shape"]
                )
                ret.scorer = NearestNeighboursScorer(ret.similarity)
            return ret


class CosineRecommender(ItemItemRecommender):
    """An Item-Item Recommender on Cosine distances between items."""

    def _weighted(self, counts):
        # cosine similarity = dot product of column-normalized vectors
        return normalize(counts.T).T


class TFIDFRecommender(ItemItemRecommender):
    """An Item-Item Recommender on TF-IDF distances between items."""

    def _weighted(self, counts):
        return normalize(tfidf_weight(counts.T)).T


class BM25Recommender(ItemItemRecommender):
    """An Item-Item Recommender on BM25 distance between items."""

    def __init__(self, K=20, K1=1.2, B=0.75, num_threads=0):
        super().__init__(K, num_threads)
        self.K1 = K1
        self.B = B

    def _weighted(self, counts):
        return bm25_weight(counts.T, self.K1, self.B).T
