"""Annoy-backed approximate serving (see /root/reference/implicit/ann/annoy.py:14-240).

Requires the optional ``annoy`` package. Builds two angular indexes over the
item factors at fit time: one in cosine space for similar_items, one over the
inner-product-augmented factors (the "Xbox" transformation) for recommend.
"""

import logging

import numpy as np
from scipy.sparse import csr_matrix

from ..recommender_base import RecommenderBase
from ..utils import _batch_call, _filter_items_from_results, augment_inner_product_matrix

log = logging.getLogger("implicit_tpu")


class AnnoyModel(RecommenderBase):
    """Speeds up inference of a matrix factorization model with Annoy indexes.

    Parameters
    ----------
    model : MatrixFactorizationBase
        The trained factorization model supplying the factors
    n_trees : int, optional
        Trees in the Annoy index (more = higher precision)
    search_k : int, optional
        Nodes to inspect at query time (-1 = auto)
    approximate_similar_items : bool, optional
    approximate_recommend : bool, optional
    """

    def __init__(
        self,
        model,
        approximate_similar_items=True,
        approximate_recommend=True,
        n_trees=50,
        search_k=-1,
    ):
        self.model = model
        self.similar_items_index = None
        self.recommend_index = None
        self.max_norm = None
        self.approximate_similar_items = approximate_similar_items
        self.approximate_recommend = approximate_recommend
        self.n_trees = n_trees
        self.search_k = search_k

    def fit(self, Cui, show_progress=True, callback=None):
        import annoy  # delayed: optional dependency

        self.model.fit(Cui, show_progress, callback)
        item_factors = np.asarray(self.model.item_factors, dtype=np.float32)

        if self.approximate_similar_items:
            log.debug("Building annoy similar items index")
            self.similar_items_index = annoy.AnnoyIndex(item_factors.shape[1], "angular")
            for i, row in enumerate(item_factors):
                self.similar_items_index.add_item(i, row)
            self.similar_items_index.build(self.n_trees)

        if self.approximate_recommend:
            log.debug("Building annoy recommendation index")
            self.max_norm, extra = augment_inner_product_matrix(item_factors)
            self.recommend_index = annoy.AnnoyIndex(extra.shape[1], "angular")
            for i, row in enumerate(extra):
                self.recommend_index.add_item(i, row)
            self.recommend_index.build(self.n_trees)

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

        ids, scores = self.similar_items_index.get_nns_by_vector(
            factor, N, search_k=self.search_k, include_distances=True
        )
        ids, scores = np.array(ids), np.array(scores)

        if filter_items is not None:
            ids, scores = _filter_items_from_results(itemid, ids, scores, filter_items, N)

        # angular distance -> cosine similarity
        return ids, 1 - (scores**2) / 2

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

        # over-fetch so post-filtering still leaves N results
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
        ids, scores = self.recommend_index.get_nns_by_vector(
            query, count, include_distances=True, search_k=self.search_k
        )
        ids, scores = np.array(ids), np.array(scores)

        if filter_items is not None:
            ids, scores = _filter_items_from_results(userid, ids, scores, filter_items, N)

        # euclidean -> cosine -> rescale back to inner product
        scaling = self.max_norm * np.linalg.norm(query)
        scores = scaling * (1 - (scores**2) / 2)
        return ids, scores

    def similar_users(self, userid, N=10, filter_users=None, users=None):
        raise NotImplementedError(
            "similar_users isn't implemented with Annoy (call self.model.similar_users instead)"
        )

    def save(self, file):
        raise NotImplementedError(".save isn't implemented for Annoy yet")

    @classmethod
    def load(cls, file):
        raise NotImplementedError(".load isn't implemented for Annoy yet")
