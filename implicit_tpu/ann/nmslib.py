"""NMSLib-backed approximate serving (see /root/reference/implicit/ann/nmslib.py:14-243).

Requires the optional ``nmslib`` package. Builds HNSW cosine indexes over the
item factors (zero-norm rows dropped) and the inner-product-augmented factors.
"""

import logging

import numpy as np
from scipy.sparse import csr_matrix

from ..recommender_base import RecommenderBase
from ..utils import _batch_call, _filter_items_from_results, augment_inner_product_matrix

log = logging.getLogger("implicit_tpu")


class NMSLibModel(RecommenderBase):
    """Speeds up inference of a matrix factorization model with NMSLib indexes.

    Parameters
    ----------
    model : MatrixFactorizationBase
    method : str, optional — the NMSLib method ('hnsw' by default)
    index_params : dict, optional — passed to createIndex
    query_params : dict, optional — passed to setQueryTimeParams
    approximate_similar_items / approximate_recommend : bool, optional
    """

    def __init__(
        self,
        model,
        approximate_similar_items=True,
        approximate_recommend=True,
        method="hnsw",
        index_params=None,
        query_params=None,
    ):
        self.model = model
        if index_params is None:
            index_params = {"M": 16, "post": 0, "efConstruction": 400}
        if query_params is None:
            query_params = {"ef": 90}

        self.similar_items_index = None
        self.recommend_index = None
        self.max_norm = None

        self.approximate_similar_items = approximate_similar_items
        self.approximate_recommend = approximate_recommend
        self.method = method
        self.index_params = index_params
        self.query_params = query_params

    def fit(self, Cui, show_progress=True, callback=None):
        import nmslib  # delayed: optional dependency

        self.model.fit(Cui, show_progress, callback)
        item_factors = np.asarray(self.model.item_factors, dtype=np.float32)

        if self.approximate_similar_items:
            log.debug("Building nmslib similar items index")
            self.similar_items_index = nmslib.init(method=self.method, space="cosinesimil")

            # nmslib hangs on zero-norm vectors: index only nonzero rows
            norms = np.linalg.norm(item_factors, axis=1)
            ids = np.arange(item_factors.shape[0])[norms > 0]
            self.similar_items_index.addDataPointBatch(item_factors[norms > 0], ids=ids)
            self.similar_items_index.createIndex(self.index_params, print_progress=show_progress)
            self.similar_items_index.setQueryTimeParams(self.query_params)

        if self.approximate_recommend:
            log.debug("Building nmslib recommendation index")
            self.max_norm, extra = augment_inner_product_matrix(item_factors)
            self.recommend_index = nmslib.init(method=self.method, space="cosinesimil")
            self.recommend_index.addDataPointBatch(extra)
            self.recommend_index.createIndex(self.index_params, print_progress=show_progress)
            self.recommend_index.setQueryTimeParams(self.query_params)

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

        count = N
        if filter_items is not None:
            count += len(filter_items)

        ids, scores = self.similar_items_index.knnQuery(factor, count)
        ids, scores = np.array(ids), np.array(scores)

        if filter_items is not None:
            ids, scores = _filter_items_from_results(itemid, ids, scores, filter_items, N)

        return ids, 1.0 - scores

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

        query = np.append(user, 0)
        ids, scores = self.recommend_index.knnQuery(query, count)
        ids, scores = np.array(ids), np.array(scores)

        if filter_items is not None:
            ids, scores = _filter_items_from_results(userid, ids, scores, filter_items, N)

        # cosine distance -> rescaled inner product
        scaling = self.max_norm * np.linalg.norm(query)
        scores = scaling * (1.0 - scores)
        return ids, scores

    def similar_users(self, userid, N=10, filter_users=None, users=None):
        raise NotImplementedError(
            "similar_users isn't implemented with NMSLib (call self.model.similar_users instead)"
        )

    def save(self, file):
        raise NotImplementedError(".save isn't implemented for NMSLib yet")

    @classmethod
    def load(cls, file):
        raise NotImplementedError(".load isn't implemented for NMSLib yet")
