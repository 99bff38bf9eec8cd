"""Faiss-backed approximate serving (see /root/reference/implicit/ann/faiss.py:18-285).

Requires the optional ``faiss`` package. Builds IVFFlat inner-product indexes:
one over the raw item factors for recommend, one over an L2-normalized copy
for similar_items (cosine).
"""

import logging

import numpy as np
from scipy.sparse import csr_matrix

from ..recommender_base import RecommenderBase
from ..utils import _batch_call, _filter_items_from_results

log = logging.getLogger("implicit_tpu")


class FaissModel(RecommenderBase):
    """Speeds up inference of a matrix factorization model with Faiss indexes.

    Parameters
    ----------
    model : MatrixFactorizationBase
    nlist : int, optional — number of IVF cells
    nprobe : int, optional — cells to probe at query time
    use_gpu : bool, optional — use faiss GPU indexes if available
    approximate_similar_items / approximate_recommend : bool, optional
    """

    def __init__(
        self,
        model,
        approximate_similar_items=True,
        approximate_recommend=True,
        nlist=400,
        nprobe=20,
        use_gpu=False,
    ):
        self.model = model
        self.similar_items_index = None
        self.recommend_index = None

        self.approximate_similar_items = approximate_similar_items
        self.approximate_recommend = approximate_recommend
        self.nlist = nlist
        self.nprobe = nprobe
        self.use_gpu = use_gpu

    def fit(self, Cui, show_progress=True, callback=None):
        import faiss  # delayed: optional dependency

        self.model.fit(Cui, show_progress, callback)
        item_factors = np.ascontiguousarray(self.model.item_factors, dtype=np.float32)
        n_items, factors = item_factors.shape

        nlist = min(self.nlist, max(1, n_items // 39))

        if self.approximate_recommend:
            log.debug("Building faiss recommendation index")
            quantizer = faiss.IndexFlat(factors)
            index = faiss.IndexIVFFlat(quantizer, factors, nlist, faiss.METRIC_INNER_PRODUCT)
            index.train(item_factors)
            index.add(item_factors)
            index.nprobe = self.nprobe
            self.recommend_index = index

        if self.approximate_similar_items:
            log.debug("Building faiss similar items index")
            norms = np.linalg.norm(item_factors, axis=1)
            norms[norms == 0] = 1e-10
            normalized = (item_factors.T / norms).T.astype(np.float32)
            quantizer = faiss.IndexFlat(factors)
            index = faiss.IndexIVFFlat(quantizer, factors, nlist, faiss.METRIC_INNER_PRODUCT)
            index.train(normalized)
            index.add(normalized)
            index.nprobe = self.nprobe
            self.similar_items_index = index

    def similar_items(
        self, itemid, N=10, recalculate_item=False, item_users=None, filter_items=None, items=None
    ):
        if items is not None and self.approximate_similar_items:
            raise NotImplementedError("using an items filter isn't supported with ANN lookup")

        if not self.approximate_similar_items:
            return self.model.similar_items(
                itemid, N, recalculate_item=recalculate_item, item_users=item_users,
                filter_items=filter_items, items=items,
            )

        if not np.isscalar(itemid):
            return _batch_call(
                self.similar_items, itemid, N=N, recalculate_item=recalculate_item,
                item_users=item_users, filter_items=filter_items,
            )

        factor = np.asarray(self.model._item_factor(itemid, item_users, recalculate_item))
        if len(np.shape(factor)) != 1:
            factor = np.squeeze(factor)
        norm = np.linalg.norm(factor)
        norm = norm if norm != 0 else 1e-10
        factor = np.ascontiguousarray(factor / norm, dtype=np.float32).reshape(1, -1)

        count = N
        if filter_items is not None:
            count += len(filter_items)

        scores, ids = self.similar_items_index.search(factor, count)
        ids, scores = ids[0], scores[0]

        if filter_items is not None:
            ids, scores = _filter_items_from_results(itemid, ids, scores, filter_items, N)

        return ids, scores

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
        if (filter_already_liked_items or recalculate_user) and not isinstance(
            user_items, csr_matrix
        ):
            raise ValueError("user_items needs to be a CSR sparse matrix")

        if items is not None and self.approximate_recommend:
            raise NotImplementedError("using a 'items' list with ANN search isn't supported")

        if not self.approximate_recommend:
            return self.model.recommend(
                userid, user_items, N=N,
                filter_already_liked_items=filter_already_liked_items,
                filter_items=filter_items, recalculate_user=recalculate_user, items=items,
            )

        if not np.isscalar(userid):
            return _batch_call(
                self.recommend, userid, user_items=user_items, N=N,
                filter_already_liked_items=filter_already_liked_items,
                filter_items=filter_items, recalculate_user=recalculate_user, items=items,
            )

        user = np.asarray(self.model._user_factor(userid, user_items, recalculate_user))

        count = N
        if filter_items is not None:
            count += len(filter_items)
            filter_items = np.array(filter_items)

        if filter_already_liked_items:
            user_likes = user_items[0].indices
            filter_items = (
                np.append(filter_items, user_likes) if filter_items is not None else user_likes
            )
            count += len(user_likes)

        query = np.ascontiguousarray(user, dtype=np.float32).reshape(1, -1)
        scores, ids = self.recommend_index.search(query, count)
        ids, scores = ids[0], scores[0]

        if filter_items is not None:
            ids, scores = _filter_items_from_results(userid, ids, scores, filter_items, N)

        return ids, scores

    def similar_users(self, userid, N=10, filter_users=None, users=None):
        raise NotImplementedError(
            "similar_users isn't implemented with Faiss (call self.model.similar_users instead)"
        )

    def save(self, file):
        raise NotImplementedError(".save isn't implemented for Faiss yet")

    @classmethod
    def load(cls, file):
        raise NotImplementedError(".load isn't implemented for Faiss yet")
