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

from ..utils import augment_inner_product_matrix, check_random_state
from .base import ANNWrapperBase

log = logging.getLogger("implicit_tpu")


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_run(X, key, k, iters):
    """Jitted spherical k-means (module-level: repeat builds hit the cache)."""
    n = X.shape[0]
    init = jax.random.choice(key, n, (k,), replace=False)
    C = X[init]

    def step(C, _):
        assign = jnp.argmax(
            jnp.dot(X, C.T, preferred_element_type=jnp.float32), axis=1
        )
        sums = jnp.zeros_like(C).at[assign].add(X)
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        C = jnp.where(norms > 1e-12, sums / jnp.maximum(norms, 1e-12), C)
        return C, None

    C, _ = jax.lax.scan(step, C, None, length=iters)
    assign = jnp.argmax(jnp.dot(X, C.T, preferred_element_type=jnp.float32), axis=1)
    return C, assign


def _kmeans(points, n_clusters, iters, seed):
    """Spherical k-means on device; returns (n_clusters, F) unit centroids.

    ``points`` must be L2-normalized rows. Empty clusters keep their previous
    centroid (no NaNs, no host round-trips mid-loop).
    """
    return _kmeans_run(points, jax.random.PRNGKey(seed), n_clusters, iters)


@functools.partial(jax.jit, static_argnames=("k", "p", "cap"))
def _ivf_search(points, ids, centroids, starts, counts, q, k, p, cap):
    """Jitted probed-cluster search (module-level so the jit cache persists
    across calls — a per-call inner function would retrace every query)."""
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
        # cosine space: store normalized points, query normalized -> scores
        # ARE cosine similarities
        norms = np.maximum(np.linalg.norm(factors, axis=1, keepdims=True), 1e-12)
        self.similar_items_index = _IVFIndex(
            factors / norms, k, self.kmeans_iters, seed
        )
        # inner-product space: the "Xbox" augmentation adds one column making
        # all rows equal-norm, so cosine clustering == MIP clustering, and a
        # (user, 0) query's dot with an augmented row is the raw inner product
        extra = augment_inner_product_matrix(factors)[1]
        self.recommend_index = _IVFIndex(extra, k, self.kmeans_iters, seed + 1)

    def _query_similar(self, factor, count):
        q = factor / max(float(np.linalg.norm(factor)), 1e-12)
        return self.similar_items_index.search(q, count, self._probe)

    def _query_recommend(self, user_factor, count):
        query = np.append(user_factor.astype(np.float32), 0.0)
        return self.recommend_index.search(query, count, self._probe)
