"""Shared serving logic for matrix-factorization models.

Functional parity with the reference MF base classes
(/root/reference/implicit/cpu/matrix_factorization_base.py:12-264 and
implicit/gpu/matrix_factorization_base.py:12-259): recommend / similar_users /
similar_items with filter_items / items= subsetting semantics, norm caches and
recalculate hooks — all routed through the single device top-k engine in
:mod:`implicit_tpu.ops.topk`. Scalar queries are the batch path plus a squeeze
at the edge, so batch == scalar consistency holds by construction.

Factor matrices live on the host as numpy arrays (the public API contract);
a device-resident copy is cached per matrix so repeated serving calls don't
re-upload — assignment to ``user_factors`` / ``item_factors`` invalidates the
cache.
"""

import numpy as np
from scipy.sparse import csr_matrix

from ..ops.topk import (
    shard_items_for_topk, topk, topk_async, topk_streaming,
)
from ..recommender_base import RecommenderBase


class _StreamTable:
    """Marker for a factor table served via ops.topk.topk_streaming: the
    host array stays host-resident and row blocks stream per call. Chosen
    automatically when the table wouldn't fit the device memory budget.
    ``mesh`` composes the two scale mechanisms: each streamed block is
    row-sharded across the mesh (ops.topk._topk_core_block_sharded)."""

    def __init__(self, array, mesh=None):
        self.array = array
        self.mesh = mesh

    def stream_kwargs(self):
        return {} if self.mesh is None else {"mesh": self.mesh}


class _ReadyFuture:
    """TopkFuture-shaped wrapper for already-computed streaming results."""

    def __init__(self, ids, scores):
        self._out = (ids, scores)

    def result(self):
        return self._out


def _stream_threshold_bytes():
    """Tables above this byte size serve via streaming instead of residency.

    Mirrors the resident path's working-set budget (half of free HBM capped
    at 4GB, ops.topk._score_budget_elements): a table bigger than the score
    budget would crowd out the score matrices it serves, and one bigger
    than HBM cannot upload at all.
    """
    from ..ops.topk import _score_budget_elements

    return 4 * _score_budget_elements()


def _validate_subset(subset, total, what):
    """Normalize an items=/users= restriction array, bounds-checked."""
    subset = np.array(subset)
    if subset.max() >= total or subset.min() < 0:
        raise IndexError(f"Some {what} in the parameter are not in the model")
    return subset


def _validate_user_items(userid, user_items):
    """The recommend() contract checks on a per-user interaction matrix."""
    if not isinstance(user_items, csr_matrix):
        raise ValueError("user_items needs to be a CSR sparse matrix")
    count = 1 if np.isscalar(userid) else len(userid)
    if user_items.shape[0] != count:
        raise ValueError("user_items must contain 1 row for every user in userids")


def _post_recommend(ids, scores, scalar, items):
    """Shared recommend post-processing: scalar squeeze + items= remap.

    The single source for this logic — the async path's post_fn and the
    streaming-table generators both call it, so their results agree by
    construction."""
    if scalar:
        ids, scores = ids[0], scores[0]
    if items is not None:
        ids = items[ids]
    return ids, scores


def _post_similar(ids, scores, query_norm, scalar, subset):
    """Shared similar_* post-processing: norm divide (sentinel-guarded),
    subset remap (-1 preserved), scalar squeeze."""
    if scalar:
        ids, scores = ids[0], scores[0]
        norm = query_norm
    else:
        norm = query_norm[:, None]
    # -FLT_MAX padding entries stay sentinels (dividing them overflows)
    np.divide(scores, norm, out=scores, where=ids >= 0)
    if subset is not None:
        # topk pads short result rows with id -1; keep the sentinel rather
        # than letting it wrap to the subset's last element
        ids = np.where(ids >= 0, subset[ids], -1)
    return ids, scores


# bound on buffered query rows per table pass of the one-pass pipelined
# streaming path: host/device memory stays ~rows x (F + k) while table
# passes drop to ceil(total_rows / this) instead of one per batch
_STREAM_PASS_ROWS = 65536


def _pipeline(dispatches, max_in_flight):
    """Drains an iterator of ``(future, post_fn)`` pairs through a bounded
    in-flight window, yielding ``post_fn(*future.result())`` in input order
    — the shared engine of every ``*_pipelined`` serving generator."""
    from collections import deque

    window = deque()
    for future, post in dispatches:
        window.append((future, post))
        if len(window) >= max_in_flight:
            f, p = window.popleft()
            yield p(*f.result())
    while window:
        f, p = window.popleft()
        yield p(*f.result())


def _filter_items_from_sparse_matrix(items, query_items):
    """Remaps ids in query_items down to their positions in the sorted items filter."""
    filter_query_items = query_items.tocoo()

    positions = np.searchsorted(items, filter_query_items.col)
    positions = np.clip(positions, 0, len(items) - 1)

    filter_query_items.data[items[positions] != filter_query_items.col] = 0
    filter_query_items.col = positions
    filter_query_items.eliminate_zeros()
    return filter_query_items.tocsr()


class MatrixFactorizationBase(RecommenderBase):
    """Common recommend/similar_* functionality on top of factor matrices.

    Attributes
    ----------
    item_factors : ndarray — latent factors for each item
    user_factors : ndarray — latent factors for each user
    """

    def __init__(self, num_threads=0):
        self._item_factors = None
        self._user_factors = None
        self._user_norms, self._item_norms = None, None
        self._item_factors_dev = None
        self._user_factors_dev = None
        self._mesh_serving_cache = {}
        self.num_threads = num_threads

    # -- factor storage + device cache --------------------------------------

    @property
    def user_factors(self):
        return self._user_factors

    @user_factors.setter
    def user_factors(self, value):
        self._user_factors = value
        self._user_factors_dev = None
        self._drop_mesh_cache("user")

    @property
    def item_factors(self):
        return self._item_factors

    @item_factors.setter
    def item_factors(self, value):
        self._item_factors = value
        self._item_factors_dev = None
        self._drop_mesh_cache("item")

    def _serving_dtype(self):
        """Scoring dtype for the device factor tables.

        Models with 16-bit factor storage (``dtype=float16``) serve in
        bfloat16 — the TPU analogue of the reference GPU's fp16 serving
        (fp16 GEMM with f32 accumulation, knn.cu:133-142): half the table
        HBM/upload bytes and the MXU's fast input path, with scores still
        accumulated and returned in float32. Everything else serves float32.
        """
        import jax.numpy as jnp

        dt = getattr(self, "dtype", None)
        if dt is not None and np.dtype(dt).itemsize == 2:
            return jnp.bfloat16
        return jnp.float32

    def _table_streams(self, factors, n_shards=1):
        """True when ``factors`` is too large for device residency.

        ``n_shards`` scales the budget for mesh serving: a row-sharded
        table only needs 1/D of its bytes resident per chip, so a mesh
        multiplies the resident capacity before streaming kicks in."""
        if factors is None:
            return False
        itemsize = 2 if self._serving_dtype() != np.float32 else 4
        bytes_per_shard = factors.shape[0] * factors.shape[1] * itemsize // max(n_shards, 1)
        return bytes_per_shard > _stream_threshold_bytes()

    def _user_factors_on_device(self):
        if self._user_factors_dev is None:
            import jax.numpy as jnp

            self._user_factors_dev = jnp.asarray(
                self._user_factors, dtype=self._serving_dtype())
        return self._user_factors_dev

    def _item_factors_on_device(self):
        if self._item_factors_dev is None:
            import jax.numpy as jnp

            self._item_factors_dev = jnp.asarray(
                self._item_factors, dtype=self._serving_dtype())
        return self._item_factors_dev

    def __getstate__(self):
        # device arrays aren't picklable; drop the caches
        state = self.__dict__.copy()
        state["_item_factors_dev"] = None
        state["_user_factors_dev"] = None
        state["_mesh_serving_cache"] = {}
        # a jax Mesh holds device handles and isn't picklable; degrade to
        # its device count (restores as an equivalent local 1-D mesh)
        mesh = state.get("mesh")
        if mesh is not None and not isinstance(mesh, int):
            state["mesh"] = int(np.prod(list(mesh.shape.values())))
        return state

    # -- multi-chip serving -------------------------------------------------

    def _serving_mesh(self):
        """The resolved jax Mesh used for serving, or None (single device).

        Models trained with ``mesh=`` serve through the same mesh: recommend
        and similar_* score item-sharded with an ICI candidate merge
        (ops.topk mesh path) instead of on one chip.
        """
        mesh = getattr(self, "mesh", None)
        if mesh is None:
            return None
        if isinstance(mesh, int):
            cache = self._mesh_cache_dict()
            key = ("mesh", mesh)
            if key not in cache:
                from ..parallel import create_mesh

                cache[key] = create_mesh(mesh)
            return cache[key]
        return mesh

    def _mesh_cache_dict(self):
        # defensive: subclasses may hit factor setters before __init__ ran,
        # and npz load builds instances via __new__
        cache = getattr(self, "_mesh_serving_cache", None)
        if cache is None:
            cache = self._mesh_serving_cache = {}
        return cache

    def _drop_mesh_cache(self, which):
        cache = getattr(self, "_mesh_serving_cache", None)
        if cache:
            for key in [k for k in cache if k[0] == which]:
                del cache[key]

    def _factors_on_mesh(self, which, mesh):
        """Cached padded+sharded factor table (+norms) for mesh serving.

        Returns ``(factors_dev, norms_dev, count)`` where the table is
        row-sharded over the mesh and norms is the padded cosine-norm vector
        (always materialized: similar_* needs it, recommend ignores it).
        """
        cache = self._mesh_cache_dict()
        key = (which, mesh)
        if key not in cache:
            factors = self._user_factors if which == "user" else self._item_factors
            norms = self.user_norms if which == "user" else self.item_norms
            cache[key] = shard_items_for_topk(factors, norms, mesh,
                                              dtype=self._serving_dtype())
        return cache[key]

    # -- norms ---------------------------------------------------------------

    def _norms_of(self, factors):
        # norms must describe the table the GEMM actually scores: for 16-bit
        # serving, round through the serving dtype first (so cosine
        # self-similarity stays exactly 1), then accumulate in f32.
        # Blockwise so a memmapped beyond-RAM table never materializes whole
        # (the streaming-serving regime; dtype casts copy per block only).
        if factors.ndim == 1:
            factors = factors.reshape(1, -1)
        rounded = self._serving_dtype() if self._serving_dtype() != np.float32 else None
        n = factors.shape[0]
        norms = np.empty(n, dtype=np.float32)
        block = max(1, (1 << 26) // max(factors.shape[1], 1))
        for s in range(0, n, block):
            f = np.asarray(factors[s : s + block])
            if rounded is not None:
                f = f.astype(rounded)
            norms[s : s + block] = np.linalg.norm(
                f.astype(np.float32, copy=False), axis=-1)
        norms[norms == 0] = 1e-10  # avoid divide-by-zero in similarity scoring
        return norms

    @property
    def user_norms(self):
        if self._user_norms is None:
            self._user_norms = self._norms_of(self.user_factors)
        return self._user_norms

    @property
    def item_norms(self):
        if self._item_norms is None:
            self._item_norms = self._norms_of(self.item_factors)
        return self._item_norms

    # -- recalculate hooks (overridden by models that support fold-in) -------

    def recalculate_user(self, userid, user_items):
        raise NotImplementedError("recalculate_user is not supported with this model")

    def recalculate_item(self, itemid, item_users):
        raise NotImplementedError("recalculate_item is not supported with this model")

    def _user_factor(self, userid, user_items, recalculate_user=False):
        if recalculate_user:
            return self.recalculate_user(userid, user_items)
        if self._serving_mesh() is not None or self._table_streams(self._user_factors):
            # mesh serving replicates query chunks itself, and a
            # beyond-budget table must never upload whole: gather on host
            f = self._user_factors
            return f[userid : userid + 1] if np.isscalar(userid) else f[np.asarray(userid)]
        # gather stored factors on-device: no host round-trip for the queries
        dev = self._user_factors_on_device()
        return dev[userid : userid + 1] if np.isscalar(userid) else dev[np.asarray(userid)]

    def _item_factor(self, itemid, item_users, recalculate_item=False):
        if recalculate_item:
            return self.recalculate_item(itemid, item_users)
        if self._serving_mesh() is not None or self._table_streams(self._item_factors):
            f = self._item_factors
            return f[itemid : itemid + 1] if np.isscalar(itemid) else f[np.asarray(itemid)]
        dev = self._item_factors_on_device()
        return dev[itemid : itemid + 1] if np.isscalar(itemid) else dev[np.asarray(itemid)]

    # -- recommend -------------------------------------------------------------

    def _prep_recommend_items(self, items, filter_items, N, persistent=False):
        """Validates ``items=`` and resolves the scoring table.

        Returns ``(N, items, item_factors, topk_kwargs)``. With
        ``persistent=True`` (streaming callers) a subset table is uploaded /
        mesh-sharded once so every batch reuses the device copy; the
        default keeps the sync path's one-shot behavior.
        """
        mesh = self._serving_mesh()
        topk_kwargs = {}
        if items is not None:
            if filter_items:
                raise ValueError("Can't set both items and filter_items in recommend call")
            N = min(N, len(items))
            items = _validate_subset(items, self.item_factors.shape[0], "itemids")
            items.sort()
            # subset tables score in the model's serving dtype, exactly like
            # the full-catalog table (ops.topk's sniff then keeps it)
            item_factors = np.asarray(self.item_factors[items],
                                      dtype=self._serving_dtype())
            if mesh is not None:
                if persistent:
                    item_factors, _, count = shard_items_for_topk(
                        item_factors, None, mesh)
                    topk_kwargs = dict(mesh=mesh, n_items=count)
                else:
                    # one-off subset: topk pads+shards it per call
                    topk_kwargs = dict(mesh=mesh)
            elif self._table_streams(item_factors):
                item_factors = _StreamTable(item_factors)
            elif persistent:
                import jax.numpy as jnp

                item_factors = jnp.asarray(item_factors, dtype=self._serving_dtype())
        elif mesh is not None:
            if self._table_streams(self.item_factors, n_shards=mesh.size):
                # beyond even the MESH's pooled budget: stream blocks,
                # each row-sharded over the chips (scale x scale)
                item_factors = _StreamTable(self.item_factors, mesh=mesh)
            else:
                # multi-chip serving: cached item-sharded table, ICI merge
                item_factors, _, count = self._factors_on_mesh("item", mesh)
                topk_kwargs = dict(mesh=mesh, n_items=count)
        elif self._table_streams(self.item_factors):
            # beyond-budget catalog: the table stays on the host and serves
            # through ops.topk.topk_streaming (block uploads, exact results)
            item_factors = _StreamTable(self.item_factors)
        else:
            # the full-catalog path serves from the cached device copy
            item_factors = self._item_factors_on_device()
        return N, items, item_factors, topk_kwargs

    def _recommend_async(
        self,
        userid,
        user_items,
        N,
        filter_already_liked_items,
        filter_items,
        recalculate_user,
        items,
        prep=None,
    ):
        """Dispatch one recommend batch; returns ``(TopkFuture, post_fn)``.

        All host prep and device enqueueing happens here; ``post_fn(ids,
        scores)`` applies the scalar squeeze and items= remap after the
        future resolves. recommend == ``post_fn(*future.result())``.
        ``prep`` carries a hoisted ``_prep_recommend_items`` result
        (streaming callers prep once for the whole stream).
        """
        if filter_already_liked_items or recalculate_user:
            _validate_user_items(userid, user_items)

        user = self._user_factor(userid, user_items, recalculate_user)

        if prep is None:
            prep = self._prep_recommend_items(items, filter_items, N)
        N, items, item_factors, topk_kwargs = prep

        filter_query_items = None
        if filter_already_liked_items:
            filter_query_items = user_items
            if items is not None:
                filter_query_items = _filter_items_from_sparse_matrix(items, filter_query_items)

        if isinstance(item_factors, _StreamTable):
            future = _ReadyFuture(*topk_streaming(
                item_factors.array,
                np.asarray(user),
                N,
                filter_query_items=filter_query_items,
                filter_items=filter_items,
                **item_factors.stream_kwargs(),
            ))
        else:
            future = topk_async(
                item_factors,
                user,
                N,
                filter_query_items=filter_query_items,
                filter_items=filter_items,
                num_threads=self.num_threads,
                **topk_kwargs,
            )

        def post(ids, scores):
            return _post_recommend(ids, scores, np.isscalar(userid), items)

        return future, post

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
        future, post = self._recommend_async(
            userid, user_items, N, filter_already_liked_items, filter_items,
            recalculate_user, items,
        )
        return post(*future.result())

    recommend.__doc__ = RecommenderBase.recommend.__doc__

    def recommend_pipelined(
        self,
        batches,
        N=10,
        filter_already_liked_items=True,
        filter_items=None,
        recalculate_user=False,
        items=None,
        max_in_flight=3,
    ):
        """Streaming batched recommend: a generator over query batches that
        keeps up to ``max_in_flight`` batches dispatched to the device at
        once, yielding each batch's ``(ids, scores)`` in input order.

        Results are identical to calling :meth:`recommend` per batch; the
        difference is latency hiding — host-side prep, query upload, and the
        result download of one batch overlap the device compute of the
        others. In serving settings where batches are small and per-call
        dispatch/transport round trips dominate (the reference's analogue is
        the per-1000-user recommend loop its evaluator runs,
        /root/reference/implicit/evaluation.pyx:423-434), this recovers most
        of the throughput gap to one huge batch without its memory footprint.

        Parameters
        ----------
        batches : iterable of userids arrays, or of (userids, user_items)
            pairs when ``filter_already_liked_items`` / ``recalculate_user``
            need each batch's interaction rows. Consumed lazily.
        max_in_flight : int, optional
            Bound on concurrently dispatched batches (device memory grows
            linearly with it; ~3 hides one upload + one download leg).
        Other parameters are as in :meth:`recommend`.

        Yields
        ------
        (ids, scores) per input batch, in order.
        """
        if type(self).recommend is not MatrixFactorizationBase.recommend:
            # a subclass with its own recommend (e.g. custom scoring) must
            # not be silently bypassed by the async MF dispatch; degrade to
            # the per-batch synchronous path, same results, no pipelining
            def fallback():
                for entry in batches:
                    userid, user_items = entry if isinstance(entry, tuple) else (entry, None)
                    yield self.recommend(
                        userid, user_items, N=N,
                        filter_already_liked_items=filter_already_liked_items,
                        filter_items=filter_items,
                        recalculate_user=recalculate_user, items=items,
                    )

            return fallback()

        # argument validation + subset upload happen HERE, eagerly, not on
        # first next(): bad arguments raise at call time like recommend, and
        # an items= table crosses the transport once for the whole stream
        prep = self._prep_recommend_items(items, filter_items, N, persistent=True)
        if isinstance(prep[2], _StreamTable):
            # beyond-budget table: serve ALL batches in ONE pass over the
            # host table (topk_streaming chunks queries internally) instead
            # of re-streaming the whole table once per batch
            return self._recommend_stream_once(
                batches, prep, filter_already_liked_items, filter_items,
                recalculate_user)

        def dispatches():
            for entry in batches:
                userid, user_items = entry if isinstance(entry, tuple) else (entry, None)
                yield self._recommend_async(
                    userid, user_items, N, filter_already_liked_items,
                    filter_items, recalculate_user, items, prep=prep,
                )

        return _pipeline(dispatches(), max_in_flight)

    def _recommend_stream_once(self, batches, prep, filter_already_liked_items,
                               filter_items, recalculate_user):
        """Streaming-table recommend_pipelined: batches buffer lazily up to
        ``_STREAM_PASS_ROWS`` query rows, then each buffered group serves in
        ONE topk_streaming pass over the host table — table passes scale
        with total queries / pass size instead of one per batch, while
        host/device memory stays bounded by the pass size. Yields per-batch
        (ids, scores) identical to per-batch recommend."""
        N, items, item_factors, _ = prep
        n_cols = len(items) if items is not None else item_factors.array.shape[0]

        def flush(group):
            # group entries: (queries, filter_rows, filter_cols, n_rows, scalar)
            queries = np.concatenate([g[0] for g in group])
            fqi = None
            if filter_already_liked_items:
                rows, cols, offset = [], [], 0
                for _, fr, fc, n_rows, _ in group:
                    rows.append(fr + offset)
                    cols.append(fc)
                    offset += n_rows
                rows = np.concatenate(rows) if rows else np.empty(0, np.int64)
                cols = np.concatenate(cols) if cols else np.empty(0, np.int64)
                fqi = csr_matrix(
                    (np.ones(len(rows), dtype=np.float32), (rows, cols)),
                    shape=(offset, n_cols))
            all_ids, all_scores = topk_streaming(
                item_factors.array, queries, N,
                filter_query_items=fqi, filter_items=filter_items,
                **item_factors.stream_kwargs())
            offset = 0
            for _, _, _, n_rows, scalar in group:
                yield _post_recommend(
                    all_ids[offset : offset + n_rows],
                    all_scores[offset : offset + n_rows], scalar, items)
                offset += n_rows

        def gen():
            group, rows = [], 0
            for entry in batches:
                userid, user_items = entry if isinstance(entry, tuple) else (entry, None)
                if filter_already_liked_items or recalculate_user:
                    _validate_user_items(userid, user_items)
                u = np.asarray(
                    self._user_factor(userid, user_items, recalculate_user),
                    dtype=np.float32)
                if u.ndim == 1:  # scalar recalculate returns a single row
                    u = u.reshape(1, -1)
                fr = fc = None
                if filter_already_liked_items:
                    fq = user_items
                    if items is not None:
                        fq = _filter_items_from_sparse_matrix(items, fq)
                    coo = fq.tocoo()
                    # filter cols are global ids: batches may carry matrices
                    # of differing widths; out-of-catalog ids are no-ops
                    keep = coo.col < n_cols
                    fr = coo.row[keep].astype(np.int64)
                    fc = coo.col[keep].astype(np.int64)
                group.append((u, fr, fc, u.shape[0], np.isscalar(userid)))
                rows += u.shape[0]
                if rows >= _STREAM_PASS_ROWS:
                    yield from flush(group)
                    group, rows = [], 0
            if group:
                yield from flush(group)

        return gen()

    def recommend_all(
        self,
        user_items,
        N=10,
        recalculate_user=False,
        filter_already_liked_items=True,
        filter_items=None,
        users_items_offset=0,
    ):
        """Deprecated: recommend for every user; use recommend with an array instead."""
        import warnings

        from scipy.sparse import lil_matrix

        warnings.warn(
            "recommend_all is deprecated. Use recommend with an array of userids instead",
            DeprecationWarning,
        )

        userids = np.arange(user_items.shape[0]) + users_items_offset
        if users_items_offset:
            adjusted = lil_matrix(
                (user_items.shape[0] + users_items_offset, user_items.shape[1]),
                dtype=user_items.dtype,
            )
            adjusted[users_items_offset:] = user_items
            user_items = adjusted.tocsr()

        ids, _ = self.recommend(
            userids,
            user_items,
            N=N,
            filter_already_liked_items=filter_already_liked_items,
            filter_items=filter_items,
            recalculate_user=recalculate_user,
        )
        return ids

    # -- similarity lookups ------------------------------------------------------

    def _prep_similar_table(self, factors, norms, subset, which, persistent=False):
        """Resolves the candidate table for similar_* scoring.

        Returns ``(factors, norms, topk_kwargs)``: the subset gather, the
        mesh table swap, or the passed-through device table. With
        ``persistent=True`` (streaming callers) a subset is uploaded /
        mesh-sharded once so every batch reuses the device copy.
        """
        mesh = self._serving_mesh()
        topk_kwargs = {}
        if subset is not None:
            # keep the subset table in the serving dtype: norms were computed
            # from the rounded table, so an unrounded f32 subset would break
            # cosine self-similarity for 16-bit-storage models
            factors = np.asarray(factors[subset], dtype=self._serving_dtype())
            norms = norms[subset]
            if mesh is not None:
                if persistent:
                    factors, norms, count = shard_items_for_topk(
                        factors, norms, mesh)
                    topk_kwargs = dict(mesh=mesh, n_items=count)
                else:
                    topk_kwargs = dict(mesh=mesh)
            elif self._table_streams(factors):
                factors = _StreamTable(factors)
            elif persistent:
                import jax.numpy as jnp

                factors = jnp.asarray(np.asarray(factors), dtype=self._serving_dtype())
                norms = jnp.asarray(np.asarray(norms), dtype=jnp.float32)
        elif mesh is not None and which is not None:
            host = self.user_factors if which == "user" else self.item_factors
            if self._table_streams(host, n_shards=mesh.size):
                # beyond even the mesh's pooled budget: stream row-sharded
                # blocks (norms stay host-side for the streaming call)
                factors = _StreamTable(host, mesh=mesh)
            else:
                factors, norms, count = self._factors_on_mesh(which, mesh)
                topk_kwargs = dict(mesh=mesh, n_items=count)
        return factors, norms, topk_kwargs

    def _similar_async(self, query_factor, query_norm, factors, norms, N,
                       filter_ids, subset, which=None, prep=None):
        """Dispatch one similar_* batch; returns ``(TopkFuture, post_fn)``.

        Scores ``query_factor`` against ``factors`` normalized by ``norms``
        (cosine against the candidates), optionally restricted to ``subset``.
        ``post_fn`` divides by the query's own norm and remaps subset ids
        once the future resolves. With a serving mesh and no subset,
        ``which`` selects the cached mesh-sharded factor table. ``prep``
        carries a hoisted ``_prep_similar_table`` result (streaming callers
        prep once for the whole stream).
        """
        if prep is None:
            prep = self._prep_similar_table(factors, norms, subset, which)
        factors, norms, topk_kwargs = prep

        if isinstance(factors, _StreamTable):
            future = _ReadyFuture(*topk_streaming(
                factors.array,
                np.asarray(query_factor),
                N,
                item_norms=np.asarray(norms),
                filter_items=filter_ids,
                **factors.stream_kwargs(),
            ))
        else:
            future = topk_async(
                factors,
                query_factor,
                N,
                item_norms=norms,
                filter_items=filter_ids,
                num_threads=self.num_threads,
                **topk_kwargs,
            )

        def post(ids, scores):
            return _post_similar(ids, scores, query_norm,
                                 np.isscalar(query_norm), subset)

        return future, post

    def _similar_stream_once(self, batches, prep, N, filter_ids, subset, get_query):
        """Streaming-table similar_*_pipelined: batches buffer lazily up to
        ``_STREAM_PASS_ROWS`` query rows, each buffered group serving in one
        topk_streaming pass over the host table (see
        _recommend_stream_once). Yields per-batch results identical to
        per-batch similar_* calls."""
        factors, norms_table, _ = prep
        norms_np = np.asarray(norms_table)

        def flush(group):
            queries = np.concatenate([g[0] for g in group])
            all_ids, all_scores = topk_streaming(
                factors.array, queries, N,
                item_norms=norms_np, filter_items=filter_ids,
                **factors.stream_kwargs())
            offset = 0
            for _, qn, n_rows, scalar in group:
                ids = all_ids[offset : offset + n_rows]
                scores = all_scores[offset : offset + n_rows]
                offset += n_rows
                yield _post_similar(ids, scores,
                                    float(qn[0]) if scalar else qn,
                                    scalar, subset)

        def gen():
            group, rows = [], 0
            for b in batches:
                q, qn = get_query(b)
                q = np.asarray(q)
                scalar = q.ndim == 1
                if scalar:
                    q = q.reshape(1, -1)
                group.append((np.asarray(q, dtype=np.float32),
                              np.atleast_1d(qn), q.shape[0], scalar))
                rows += q.shape[0]
                if rows >= _STREAM_PASS_ROWS:
                    yield from flush(group)
                    group, rows = [], 0
            if group:
                yield from flush(group)

        return gen()

    def _similar(self, query_factor, query_norm, factors, norms, N, filter_ids, subset,
                 which=None):
        """Shared core of similar_users / similar_items."""
        future, post = self._similar_async(
            query_factor, query_norm, factors, norms, N, filter_ids, subset,
            which=which,
        )
        return post(*future.result())

    def similar_users(self, userid, N=10, filter_users=None, users=None):
        norms = self.user_norms
        if users is not None:
            if filter_users:
                raise ValueError("Can't set both users and filter_users in similar_users call")
            users = _validate_subset(users, self.user_factors.shape[0], "userids")
            factors = self.user_factors
        elif self._serving_mesh() is not None:
            factors = self.user_factors  # _similar swaps in the mesh table
        elif self._table_streams(self.user_factors):
            factors = _StreamTable(self.user_factors)
        else:
            factors = self._user_factors_on_device()

        return self._similar(
            self.user_factors[userid], norms[userid], factors, norms, N, filter_users,
            users, which="user"
        )

    similar_users.__doc__ = RecommenderBase.similar_users.__doc__

    def similar_users_pipelined(self, batches, N=10, filter_users=None,
                                users=None, max_in_flight=3):
        """Streaming batched similar_users: the user-side twin of
        :meth:`similar_items_pipelined` — a generator over userid batches,
        bounded in-flight window, results identical to per-batch calls."""
        if type(self).similar_users is not MatrixFactorizationBase.similar_users:
            def fallback():
                for userid in batches:
                    yield self.similar_users(userid, N=N, filter_users=filter_users,
                                             users=users)

            return fallback()

        # eager validation + one-time table prep (see recommend_pipelined)
        sub = None
        if users is not None:
            if filter_users:
                raise ValueError("Can't set both users and filter_users in similar_users call")
            sub = _validate_subset(np.array(users), self.user_factors.shape[0],
                                   "userids")
        norms = self.user_norms
        if sub is not None or self._serving_mesh() is not None:
            table = self.user_factors  # prep swaps in the subset / mesh table
        elif self._table_streams(self.user_factors):
            table = _StreamTable(self.user_factors)
        else:
            table = self._user_factors_on_device()
        prep = self._prep_similar_table(table, norms, sub, "user", persistent=True)
        if isinstance(prep[0], _StreamTable):
            # one pass over the host table for the whole stream
            return self._similar_stream_once(
                batches, prep, N, filter_users, sub,
                lambda b: (self.user_factors[b], norms[b]))

        def dispatches():
            for userid in batches:
                yield self._similar_async(
                    self.user_factors[userid], norms[userid], None, None, N,
                    filter_users, sub, which="user", prep=prep,
                )

        return _pipeline(dispatches(), max_in_flight)

    def similar_items(
        self, itemid, N=10, recalculate_item=False, item_users=None, filter_items=None, items=None
    ):
        factor = self._item_factor(itemid, item_users, recalculate_item)
        norms = self.item_norms

        if recalculate_item:
            # freshly solved factors aren't covered by the cached norms
            if np.isscalar(itemid):
                norm = np.linalg.norm(factor)
                norm = norm if norm != 0 else 1e-10
            else:
                norm = np.linalg.norm(factor, axis=1)
                norm[norm == 0] = 1e-10
        else:
            norm = norms[itemid]

        if items is not None:
            if filter_items:
                raise ValueError("Can't set both items and filter_items in similar_items call")
            items = _validate_subset(items, self.item_factors.shape[0], "itemids")
            factors = self.item_factors
        elif self._serving_mesh() is not None:
            factors = self.item_factors  # _similar swaps in the mesh table
        elif self._table_streams(self.item_factors):
            factors = _StreamTable(self.item_factors)
        else:
            factors = self._item_factors_on_device()

        return self._similar(factor, norm, factors, norms, N, filter_items, items,
                             which="item")

    similar_items.__doc__ = RecommenderBase.similar_items.__doc__

    def similar_items_pipelined(self, batches, N=10, filter_items=None,
                                items=None, max_in_flight=3):
        """Streaming batched similar_items: generator over itemid batches,
        keeping up to ``max_in_flight`` batches dispatched at once and
        yielding each batch's ``(ids, scores)`` in input order — results
        identical to per-batch :meth:`similar_items`, with host/transport
        legs overlapped (see :meth:`recommend_pipelined`). The bulk
        similar-items export over a whole catalog (the reference's
        examples/lastfm.py workload) is the intended consumer.
        ``recalculate_item`` is not supported here; use the synchronous call.
        """
        if type(self).similar_items is not MatrixFactorizationBase.similar_items:
            def fallback():
                for itemid in batches:
                    yield self.similar_items(itemid, N=N, filter_items=filter_items,
                                             items=items)

            return fallback()

        # eager validation + one-time table prep (see recommend_pipelined)
        sub = None
        if items is not None:
            if filter_items:
                raise ValueError("Can't set both items and filter_items in similar_items call")
            sub = _validate_subset(np.array(items), self.item_factors.shape[0],
                                   "itemids")
        norms = self.item_norms
        if sub is not None or self._serving_mesh() is not None:
            table = self.item_factors  # prep swaps in the subset / mesh table
        elif self._table_streams(self.item_factors):
            table = _StreamTable(self.item_factors)
        else:
            table = self._item_factors_on_device()
        prep = self._prep_similar_table(table, norms, sub, "item", persistent=True)
        if isinstance(prep[0], _StreamTable):
            # one pass over the host table for the whole stream
            return self._similar_stream_once(
                batches, prep, N, filter_items, sub,
                lambda b: (self.item_factors[b], norms[b]))

        def dispatches():
            for itemid in batches:
                factor = self._item_factor(itemid, None, False)
                yield self._similar_async(
                    factor, norms[itemid], None, None, N, filter_items, sub,
                    which="item", prep=prep,
                )

        return _pipeline(dispatches(), max_in_flight)

    # -- device conversion shims ---------------------------------------------

    def to_gpu(self):
        """Drop-in parity shim for the reference's CPU->GPU conversion
        (/root/reference/implicit/cpu/als.py:439, cpu/bpr.pyx:209). This
        build has a single device-native implementation — there is no
        CPU/GPU model split to convert between — so conversion is the
        identity."""
        return self

    def to_cpu(self):
        """Drop-in parity shim for the reference's GPU->CPU conversion
        (/root/reference/implicit/gpu/als.py:300, gpu/bpr.py:165). Factors
        already live as host numpy arrays here; the identity preserves the
        reference's ``model = model.to_cpu()`` idiom."""
        return self

    def _check_fit_errors(self):
        self._check_factors(self.user_factors, self.item_factors)
