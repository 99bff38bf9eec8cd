"""TPU-native IVF approximate serving — no external ANN library.

The reference delegates approximate serving to host-side libraries (Annoy /
NMSLib) or to Faiss's GPU IVF indexes
(/root/reference/implicit/ann/faiss.py:62-137: ``GpuIndexIVFFlat`` over the
inner-product-augmented factors). This module is the TPU-first equivalent of
that Faiss-GPU path: an inverted-file flat index built *and* served on the
accelerator.

Build: spherical k-means over the (normalized or inner-product-augmented)
item factors runs as jitted MXU assignment + scatter-add centroid updates;
items are then reordered cluster-contiguously so a cluster is one
``dynamic_slice`` at query time.

Query: score the probe vector against all centroids (one small MXU matmul),
take the top ``n_probe`` clusters, slice their item blocks out of the
reordered factor table (bulk DMA, no per-item gathers), score exactly, and
``top_k`` the concatenation. Everything after the centroid argsort is exact,
so recall is governed only by how many clusters are probed — the same
contract as IVF-flat.

Both serving spaces use the same machinery, mirroring the reference ANN
wrappers: cosine for ``similar_items`` (factors L2-normalized) and inner
product for ``recommend`` (the "Xbox" augmentation from
``utils.augment_inner_product_matrix`` turns MIP search into cosine search).

Honesty note (measured, 1M x 64 items, single query, v5e): the exact
brute-force path is ~32ms end-to-end — transport round-trip dominated,
~1-2ms of device compute — while the IVF probe costs ~56ms at recall 0.9.
The MXU makes dense scoring so cheap that approximate search only pays off
when the factor table cannot stay device-resident or queries are batched
against very large catalogs; this index exists for drop-in parity with
``FaissAlternatingLeastSquares(use_gpu=True)`` and for those regimes, not
as the default serving path.
"""

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix

from ..ops import topk as _topk_ops
from ..utils import augment_inner_product_matrix, check_random_state
from .base import ANNWrapperBase

log = logging.getLogger("implicit_tpu")


def _inner_model_class(name):
    """Resolves a saved inner-model class name back to its class."""
    from ..models.als import AlternatingLeastSquares
    from ..models.bpr import BayesianPersonalizedRanking
    from ..models.lmf import LogisticMatrixFactorization

    classes = {
        cls.__name__: cls
        for cls in (AlternatingLeastSquares, BayesianPersonalizedRanking,
                    LogisticMatrixFactorization)
    }
    if name not in classes:
        raise ValueError(f"unknown inner model class {name!r} in saved index")
    return classes[name]


def _trim_rows(ids, scores, row_filters, N):
    """Per-row filter + trim of over-fetched batch results.

    Rows shorter than N pad with id -1 / score -FLT_MAX (the _batch_call
    contract, utils.py:96-105).
    """
    B = len(ids)
    out_i = np.full((B, N), -1, np.int32)
    out_s = np.full((B, N), -np.finfo(np.float32).max, np.float32)
    for r in range(B):
        keep = ids[r] >= 0
        f = row_filters[r]
        if f is not None and len(f):
            keep &= ~np.isin(ids[r], f)
        sel = np.nonzero(keep)[0][:N]
        out_i[r, : len(sel)] = ids[r][sel]
        out_s[r, : len(sel)] = scores[r][sel]
    return out_i, out_s


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_run(X, key, k, iters):
    """Jitted spherical k-means (module-level: repeat builds hit the cache).

    Assignment runs over row blocks (scanned) so the (n, k) score matrix is
    never materialized — a 5M x 2k catalog would otherwise demand ~44GB for
    one argmax pass. Block size keeps the per-block score tile near 512MB;
    small catalogs stay a single block (identical program to the unblocked
    original). Padding rows are zero: they score 0 everywhere and add zero
    vectors to whichever cluster argmax picks.
    """
    n, f = X.shape
    init = jax.random.choice(key, n, (k,), replace=False)
    C = X[init]

    block = max(1, min(n, (1 << 27) // max(k, 1)))
    nb = -(-n // block)
    pad = nb * block - n
    Xb = (jnp.pad(X, ((0, pad), (0, 0))) if pad else X).reshape(nb, block, f)

    def assign_block(xb, C):
        return jnp.argmax(
            jnp.dot(xb, C.T, preferred_element_type=jnp.float32), axis=1
        )

    def step(C, _):
        def blk(sums, xb):
            a = assign_block(xb, C)
            return sums.at[a].add(xb), None

        sums, _ = jax.lax.scan(blk, jnp.zeros_like(C), Xb)
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        C = jnp.where(norms > 1e-12, sums / jnp.maximum(norms, 1e-12), C)
        return C, None

    C, _ = jax.lax.scan(step, C, None, length=iters)
    assign = jax.lax.map(lambda xb: assign_block(xb, C), Xb).reshape(-1)[:n]
    return C, assign


def _kmeans(points, n_clusters, iters, seed):
    """Spherical k-means on device; returns (n_clusters, F) unit centroids.

    ``points`` must be L2-normalized rows. Empty clusters keep their previous
    centroid (no NaNs, no host round-trips mid-loop).
    """
    return _kmeans_run(points, jax.random.PRNGKey(seed), n_clusters, iters)


def _ivf_search_body(points, ids, centroids, starts, counts, q, k, p, cap):
    qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    _, clusters = jax.lax.top_k(
        jnp.dot(centroids, qn, preferred_element_type=jnp.float32), p
    )

    def probe(c):
        s = starts[c]
        block = jax.lax.dynamic_slice(points, (s, 0), (cap, points.shape[1]))
        bids = jax.lax.dynamic_slice(ids, (s,), (cap,))
        scores = jnp.dot(block, q, preferred_element_type=jnp.float32)
        valid = jnp.arange(cap, dtype=jnp.int32) < counts[c]
        return jnp.where(valid, scores, -jnp.inf), jnp.where(valid, bids, -1)

    scores, bids = jax.vmap(probe)(clusters)
    vals, idx = jax.lax.top_k(scores.reshape(-1), k)
    return bids.reshape(-1)[idx], vals


@functools.partial(jax.jit, static_argnames=("k", "p", "cap"))
def _ivf_search(points, ids, centroids, starts, counts, q, k, p, cap):
    """Jitted probed-cluster search (module-level so the jit cache persists
    across calls — a per-call inner function would retrace every query)."""
    return _ivf_search_body(points, ids, centroids, starts, counts, q, k, p, cap)


@functools.partial(jax.jit, static_argnames=("k", "p", "cap"))
def _ivf_search_many(points, ids, centroids, starts, counts, Q, k, p, cap):
    """Batched probed-cluster search: vmap of the scalar body over queries."""
    return jax.vmap(
        lambda q: _ivf_search_body(points, ids, centroids, starts, counts,
                                   q, k, p, cap)
    )(Q)


class _IVFIndex:
    """One searchable space: reordered points + centroids + cluster extents.

    Scores are plain dot products against the stored points — callers pick
    the metric by pre-transforming points and queries (L2-normalized for
    cosine; inner-product-augmented for MIP). Cluster assignment always uses
    the normalized directions (spherical k-means).
    """

    def __init__(self, points, n_clusters, kmeans_iters, seed):
        n, f = points.shape
        norms = np.linalg.norm(points, axis=1)
        normalized = points / np.maximum(norms[:, None], 1e-12)

        C, assign = _kmeans(jnp.asarray(normalized), n_clusters, kmeans_iters, seed)
        assign = np.asarray(assign)

        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=n_clusters)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        self.cap = int(counts.max()) if n else 1

        # cluster-contiguous layout padded by one cap of zero rows so every
        # dynamic_slice window is in bounds; zero rows score 0 and are masked
        self.points = jnp.asarray(
            np.concatenate([points[order], np.zeros((self.cap, f), np.float32)])
        )
        self.ids = jnp.asarray(
            np.concatenate([order.astype(np.int32), np.full(self.cap, -1, np.int32)])
        )
        self.centroids = C
        self.starts = jnp.asarray(starts.astype(np.int32))
        self.counts = jnp.asarray(counts.astype(np.int32))
        self.n = n

    def to_arrays(self, prefix):
        """Flattens the index into host arrays for npz persistence.

        The index is fully self-describing — reordered points, the id
        permutation, centroids and cluster extents — so unlike the
        host-library ANN indexes (the reference wrappers raise
        NotImplementedError on save, /root/reference/implicit/ann/annoy.py:229-240)
        it round-trips losslessly.
        """
        return {
            prefix + "points": np.asarray(self.points),
            prefix + "ids": np.asarray(self.ids),
            prefix + "centroids": np.asarray(self.centroids),
            prefix + "starts": np.asarray(self.starts),
            prefix + "counts": np.asarray(self.counts),
            prefix + "n": self.n,
            prefix + "cap": self.cap,
        }

    @classmethod
    def from_arrays(cls, data, prefix):
        """Rebuilds an index from :meth:`to_arrays` output (uploads once)."""
        index = cls.__new__(cls)
        index.points = jnp.asarray(data[prefix + "points"])
        index.ids = jnp.asarray(data[prefix + "ids"])
        index.centroids = jnp.asarray(data[prefix + "centroids"])
        index.starts = jnp.asarray(data[prefix + "starts"])
        index.counts = jnp.asarray(data[prefix + "counts"])
        index.n = int(data[prefix + "n"])
        index.cap = int(data[prefix + "cap"])
        return index

    def search(self, query, count, n_probe):
        """Exact scores within the ``n_probe`` best clusters -> (ids, scores).

        Returns at most ``min(count, n_probe * max cluster size)`` results —
        like any IVF, candidates outside the probed clusters are unseen (the
        wrapper's exact-fallback/oversampling handles small-N accuracy).
        """
        count = min(count, self.n)
        n_probe = min(n_probe, self.centroids.shape[0])
        # bucket the top-k width to a pow2 so per-user over-fetch variation
        # (count = N + len(liked) + filters) doesn't recompile per query,
        # and clamp to the number of candidate scores actually probed
        k = min(count, n_probe * self.cap)
        k_padded = min(1 << max(int(np.ceil(np.log2(max(k, 1)))), 0),
                       n_probe * self.cap)
        k_padded = max(k_padded, k)
        ids, vals = _ivf_search(
            self.points, self.ids, self.centroids, self.starts, self.counts,
            jnp.asarray(query, dtype=jnp.float32), k_padded, n_probe, self.cap,
        )
        ids = np.asarray(ids)[:k]
        vals = np.asarray(vals)[:k]
        keep = ids >= 0
        return ids[keep], vals[keep]

    def _k_padded(self, count, n_probe):
        count = min(count, self.n)
        n_probe = min(n_probe, self.centroids.shape[0])
        k = min(count, n_probe * self.cap)
        k_padded = min(1 << max(int(np.ceil(np.log2(max(k, 1)))), 0),
                       n_probe * self.cap)
        return max(k_padded, k), n_probe

    def search_batch(self, queries, count, n_probe, chunk=None):
        """Batched search -> (B, k) ids / scores, short rows padded with -1.

        Queries run through a vmapped kernel in memory-bounded chunks (each
        in-flight query holds (n_probe, cap, F) probe blocks); chunk results
        are all enqueued before any fetch so transport round trips overlap.
        ``chunk`` defaults to a memory budget: each in-flight query gathers
        an (n_probe, cap, F) probe block, so a fixed chunk could demand many
        GB on skewed large catalogs (big ``cap``) with wide probes.
        """
        queries = jnp.asarray(queries, dtype=jnp.float32)
        B = queries.shape[0]
        k, n_probe = self._k_padded(count, n_probe)
        if chunk is None:
            per_query = max(n_probe * self.cap * self.points.shape[1], 1)
            chunk = max(_topk_ops._score_budget_elements() // per_query, 1)
            chunk = min(1 << int(np.log2(chunk)), 256)  # pow2 keeps jit cache warm
        pending = []
        for s0 in range(0, B, chunk):
            q = queries[s0 : s0 + chunk]
            if q.shape[0] < chunk:  # fixed chunk shape keeps the jit cache warm
                q = jnp.pad(q, ((0, chunk - q.shape[0]), (0, 0)))
            pending.append(_ivf_search_many(
                self.points, self.ids, self.centroids, self.starts,
                self.counts, q, k, n_probe, self.cap,
            ))
        ids = np.concatenate([np.asarray(i) for i, _ in pending])[:B]
        vals = np.concatenate([np.asarray(v) for _, v in pending])[:B]
        return ids, vals


class TPUIVFModel(ANNWrapperBase):
    """Approximate serving of a factorization model through on-device IVF.

    Parameters
    ----------
    model : MatrixFactorizationBase
        The trained factorization model supplying the factors
    n_clusters : int, optional
        Inverted lists (default ~2*sqrt(items), the usual IVF sizing)
    n_probe : int, optional
        Clusters searched per query (default n_clusters/8; raise for recall)
    kmeans_iters : int, optional
    random_state : int or None, optional
    approximate_similar_items / approximate_recommend : bool, optional
    """

    def __init__(
        self,
        model,
        approximate_similar_items=True,
        approximate_recommend=True,
        n_clusters=None,
        n_probe=None,
        kmeans_iters=15,
        random_state=None,
    ):
        super().__init__(model, approximate_similar_items, approximate_recommend)
        self.n_clusters = n_clusters
        self.n_probe = n_probe
        self.kmeans_iters = kmeans_iters
        self.random_state = random_state

    def _build_indexes(self, item_factors):
        n = item_factors.shape[0]
        k = self.n_clusters or max(1, min(n, int(2 * np.sqrt(n))))
        k = min(k, n)
        self._probe = self.n_probe or max(1, k // 8)
        rs = check_random_state(self.random_state)
        seed = int(rs.integers(0, 2**31))

        log.debug("Building TPU IVF indexes: %d clusters over %d items", k, n)
        factors = np.asarray(item_factors, dtype=np.float32)
        # each index builds only when its flag asks for it — the k-means
        # build is the dominant construction cost (the host-library wrappers
        # do the same, e.g. /root/reference/implicit/ann/annoy.py:58-92)
        self.similar_items_index = None
        self.recommend_index = None
        if self.approximate_similar_items:
            # cosine space: store normalized points, query normalized ->
            # scores ARE cosine similarities
            norms = np.maximum(
                np.linalg.norm(factors, axis=1, keepdims=True), 1e-12)
            self.similar_items_index = _IVFIndex(
                factors / norms, k, self.kmeans_iters, seed
            )
        if self.approximate_recommend:
            # inner-product space: the "Xbox" augmentation adds one column
            # making all rows equal-norm, so cosine clustering == MIP
            # clustering, and a (user, 0) query's dot with an augmented row
            # is the raw inner product
            extra = augment_inner_product_matrix(factors)[1]
            self.recommend_index = _IVFIndex(
                extra, k, self.kmeans_iters, seed + 1)

    def save(self, fileobj_or_path):
        """Round-trips the wrapper AND its indexes to one ``.npz``.

        Goes beyond reference parity: the host-library wrappers can't
        serialize their index state (the reference raises
        NotImplementedError, /root/reference/implicit/ann/annoy.py:229-240),
        but the TPU-native IVF index is plain arrays. The inner model's own
        npz fields are nested under a ``model__`` prefix.
        """
        if (getattr(self, "similar_items_index", None) is None
                and getattr(self, "recommend_index", None) is None):
            raise ValueError("cannot save an unfitted index — call fit first")
        import io

        buf = io.BytesIO()
        self.model.save(buf)
        buf.seek(0)
        args = {}
        with np.load(buf, allow_pickle=True) as inner:
            for key, value in inner.items():
                if value.dtype == object:
                    # e.g. a Generator random_state: pickled object arrays
                    # would make the file unreadable under allow_pickle=False,
                    # and post-fit state doesn't need the seed
                    continue
                args["model__" + key] = value
        if self.similar_items_index is not None:
            args.update(self.similar_items_index.to_arrays("sim__"))
        if self.recommend_index is not None:
            args.update(self.recommend_index.to_arrays("rec__"))
        args["model_class"] = type(self.model).__name__
        args["approximate_similar_items"] = self.approximate_similar_items
        args["approximate_recommend"] = self.approximate_recommend
        args["kmeans_iters"] = self.kmeans_iters
        args["probe"] = self._probe
        for key in ("n_clusters", "n_probe"):
            value = getattr(self, key)
            if value is not None:
                args[key] = value
        # only an int random_state persists: Generator/RandomState objects
        # would silently pickle into the npz and break allow_pickle=False
        # loading — and the seed only matters for the (already-done) build
        if isinstance(self.random_state, (int, np.integer)):
            args["random_state"] = int(self.random_state)
        np.savez(fileobj_or_path, **args)

    @classmethod
    def load(cls, fileobj_or_path):
        if isinstance(fileobj_or_path, str) and not fileobj_or_path.endswith(".npz"):
            fileobj_or_path = fileobj_or_path + ".npz"
        with np.load(fileobj_or_path, allow_pickle=False) as data:
            inner = _inner_model_class(str(data["model_class"]))()
            for key, value in data.items():
                if not key.startswith("model__"):
                    continue
                name = key[len("model__"):]
                if name == "dtype":
                    value = np.dtype(str(value))
                elif value.shape == ():
                    value = value.item()
                setattr(inner, name, value)

            ret = cls(
                inner,
                approximate_similar_items=bool(data["approximate_similar_items"]),
                approximate_recommend=bool(data["approximate_recommend"]),
                n_clusters=int(data["n_clusters"]) if "n_clusters" in data else None,
                n_probe=int(data["n_probe"]) if "n_probe" in data else None,
                kmeans_iters=int(data["kmeans_iters"]),
                random_state=int(data["random_state"]) if "random_state" in data else None,
            )
            ret._probe = int(data["probe"])
            ret.similar_items_index = (
                _IVFIndex.from_arrays(data, "sim__")
                if "sim__centroids" in data else None)
            ret.recommend_index = (
                _IVFIndex.from_arrays(data, "rec__")
                if "rec__centroids" in data else None)
        return ret

    def _query_similar(self, factor, count):
        q = factor / max(float(np.linalg.norm(factor)), 1e-12)
        return self.similar_items_index.search(q, count, self._probe)

    def _query_recommend(self, user_factor, count):
        query = np.append(user_factor.astype(np.float32), 0.0)
        return self.recommend_index.search(query, count, self._probe)

    # ---- native batched serving ----------------------------------------
    # The wrapper base falls back to one scalar ANN query per id
    # (utils._batch_call) — fine for host libraries with microsecond
    # lookups, but each scalar device query pays a transport round trip.
    # Arrays instead run through one vmapped search per chunk.

    def similar_items(
        self, itemid, N=10, recalculate_item=False, item_users=None,
        filter_items=None, items=None,
    ):
        if (
            np.isscalar(itemid) or not self.approximate_similar_items
            or recalculate_item or items is not None
        ):
            return super().similar_items(
                itemid, N, recalculate_item=recalculate_item,
                item_users=item_users, filter_items=filter_items, items=items,
            )
        itemids = np.asarray(itemid)
        factors = np.asarray(self.model.item_factors, dtype=np.float32)[itemids]
        norms = np.maximum(np.linalg.norm(factors, axis=1, keepdims=True), 1e-12)
        count = N + (len(filter_items) if filter_items is not None else 0)
        ids, scores = self.similar_items_index.search_batch(
            factors / norms, count, self._probe
        )
        filters = None if filter_items is None else np.asarray(filter_items)
        return _trim_rows(ids, scores, [filters] * len(itemids), N)

    def recommend(
        self, userid, user_items, N=10, filter_already_liked_items=True,
        filter_items=None, recalculate_user=False, items=None,
    ):
        if (
            np.isscalar(userid) or not self.approximate_recommend
            or recalculate_user or items is not None
        ):
            return super().recommend(
                userid, user_items, N=N,
                filter_already_liked_items=filter_already_liked_items,
                filter_items=filter_items, recalculate_user=recalculate_user,
                items=items,
            )
        if filter_already_liked_items and not isinstance(user_items, csr_matrix):
            raise ValueError("user_items needs to be a CSR sparse matrix")

        userids = np.asarray(userid)
        base = np.asarray(filter_items) if filter_items is not None else None
        row_filters = []
        count = N
        for r in range(len(userids)):
            f = base
            if filter_already_liked_items:
                liked = user_items[r].indices
                f = liked if f is None else np.append(f, liked)
            row_filters.append(f)
            if f is not None:
                count = max(count, N + len(f))

        user = np.asarray(self.model.user_factors, dtype=np.float32)[userids]
        queries = np.concatenate(
            [user, np.zeros((len(userids), 1), np.float32)], axis=1
        )
        ids, scores = self.recommend_index.search_batch(queries, count, self._probe)
        return _trim_rows(ids, scores, row_filters, N)
