"""Batched brute-force scored top-k with filtering — the serving engine.

TPU-native equivalent of the reference's three top-k implementations
(/root/reference/implicit/cpu/topk.pyx:15-67, implicit/cpu/select.h:12-40 and
implicit/gpu/knn.cu:131-265): one jitted XLA program computing

    scores = queries @ items.T        (MXU GEMM)
    scores /= item_norms              (optional)
    scores[filtered] = -FLT_MAX       (scatter masks)
    lax.top_k(scores, k)

Filter semantics match the reference: filtered entries are written with
``-FLT_MAX`` (not -inf) so they can still round out results when fewer than k
candidates survive. Queries are processed in memory-bounded chunks; shapes are
padded to a small set of buckets so the jit cache stays warm across calls.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_MAX = -float(np.finfo(np.float32).max)

# fallback bounds on the score-matrix working set per chunk (float32
# elements) when the backend doesn't report memory stats: 1GB on
# accelerators (remote transports often return no memory stats, and an
# undersized fallback splits serving batches into extra round trips);
# 256MB on plain CPU hosts, which may be small CI containers
_MAX_SCORE_ELEMENTS = 1 << 28
_MAX_SCORE_ELEMENTS_CPU = 1 << 26


@functools.lru_cache(maxsize=1)
def _score_budget_elements():
    """Float32 elements available for one chunk's score matrix.

    Sized from the device's live memory headroom — half of free HBM, capped
    at 4GB — the same policy as the reference GPU's temp-memory pool
    (/root/reference/implicit/gpu/knn.cu:56-75,169-173). Backends that don't
    expose memory stats fall back to a fixed working set.

    Cached per process: sampling live free-HBM on every call would let the
    derived chunk size drift between calls (e.g. after factor uploads),
    recompiling the chunk kernel mid-serving for no benefit.
    """
    try:
        stats = jax.local_devices()[0].memory_stats()
        free = stats["bytes_limit"] - stats["bytes_in_use"]
        budget_bytes = min(free // 2, 4 << 30)
        return max(budget_bytes // 4, 1 << 22)
    except Exception:
        if jax.default_backend() == "cpu":
            return _MAX_SCORE_ELEMENTS_CPU
        return _MAX_SCORE_ELEMENTS


def _pad_dim(n):
    """Bucket a dimension to limit jit-cache churn: pow2 up to 1024, then 1024-multiples."""
    if n <= 8:
        return 8
    if n <= 1024:
        return 1 << int(np.ceil(np.log2(n)))
    return -(-n // 1024) * 1024


@functools.cache
def _topk_core_sharded(mesh, axis_name="d"):
    """Item-sharded topk core over ``mesh`` — the multi-chip serving path.

    Each chip scores queries against its item shard, applies the filter
    sentinels locally (global ids are translated to shard coordinates, with
    out-of-shard ids routed to a dropped out-of-bounds slot), selects its
    local top-k, and the candidates ride ICI once (n_chips * k per query)
    for a final merge — the distributed replacement for the device-wide
    select of the reference GPU engine (knn.cu:244-250). Tie behavior is
    bit-identical to the single-device core: per-item dot products are
    computed with the same contraction (F is unsharded), and the merged
    top_k prefers earlier gather positions, i.e. lower global ids.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.jit, static_argnames=("k", "n_items", "use_norms", "use_qf", "use_if"))
    def run(items, queries, norms, qf_rows, qf_cols, filter_items, k, n_items,
            use_norms, use_qf, use_if):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(None, None), P(axis_name), P(None),
                      P(None), P(None)),
            out_specs=(P(None, None), P(None, None)),
            # outputs are value-identical on every chip after the all-gather
            # merge, but the varying-axes checker can't prove it
            check_vma=False,
        )
        def shard_fn(items_l, queries_r, norms_l, qf_rows_r, qf_cols_r, fi_r):
            n_local = items_l.shape[0]
            offset = jax.lax.axis_index(axis_name) * n_local
            # same dtype rule as _topk_core: bf16 tables score on the MXU's
            # bf16 path with f32 accumulation, f32 tables at HIGHEST
            scores = jnp.dot(queries_r.astype(items_l.dtype), items_l.T,
                             precision=(jax.lax.Precision.HIGHEST
                                        if items_l.dtype == jnp.float32 else None),
                             preferred_element_type=jnp.float32)
            if use_norms:
                scores = scores / norms_l[None, :]
            # rows past the true item count are shard-padding: mask them out
            gids = offset + jnp.arange(n_local, dtype=jnp.int32)
            scores = jnp.where(gids[None, :] < n_items, scores, NEG_MAX)
            if use_if:
                li = jnp.where((fi_r >= offset) & (fi_r < offset + n_local),
                               fi_r - offset, n_local)
                scores = scores.at[:, li].set(NEG_MAX, mode="drop")
            if use_qf:
                lc = jnp.where((qf_cols_r >= offset) & (qf_cols_r < offset + n_local),
                               qf_cols_r - offset, n_local)
                scores = scores.at[qf_rows_r, lc].set(NEG_MAX, mode="drop")
            k_local = min(k, n_local)
            vals, idx = jax.lax.top_k(scores, k_local)
            idx = idx + offset
            vals_g = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)
            idx_g = jax.lax.all_gather(idx, axis_name, axis=1, tiled=True)
            merged_vals, pos = jax.lax.top_k(vals_g, k)
            return merged_vals, jnp.take_along_axis(idx_g, pos, axis=1)

        return shard_fn(items, queries, norms, qf_rows, qf_cols, filter_items)

    return run


def _table_dtype(items):
    """Scoring dtype rule shared by every table-resolution path: 16-bit
    float tables serve in bfloat16 (see _topk_core), everything else f32."""
    if getattr(items, "dtype", None) in (jnp.bfloat16, np.float16):
        return jnp.bfloat16
    return np.float32


def shard_items_for_topk(items, item_norms, mesh, axis_name="d", dtype=None):
    """Pads and device-puts an item-factor table row-sharded over ``mesh``.

    Returns ``(items_dev, norms_dev, n_items)`` ready to pass to
    :func:`topk` with ``mesh=``/``n_items=``. Rows are padded to a multiple
    of the mesh size (padding is masked inside the sharded core); norms pad
    with 1. Callers serving repeatedly should cache the result — this is
    one host->device upload of the whole table. ``dtype`` is the scoring
    dtype of the table (bfloat16 halves the upload and scores on the MXU's
    bf16 path; see _topk_core); default follows the input's dtype — 16-bit
    floats serve bf16, everything else f32.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    items = np.asarray(items, dtype=dtype if dtype is not None else _table_dtype(items))
    n_items = items.shape[0]
    n_sh = mesh.shape[axis_name]
    padded_n = -(-max(n_items, 1) // n_sh) * n_sh
    if padded_n != n_items:
        items = np.pad(items, ((0, padded_n - n_items), (0, 0)))
    items_dev = jax.device_put(items, NamedSharding(mesh, P(axis_name, None)))
    if item_norms is not None:
        norms = np.ones(padded_n, dtype=np.float32)
        norms[:n_items] = np.asarray(item_norms, dtype=np.float32)
        norms_dev = jax.device_put(norms, NamedSharding(mesh, P(axis_name)))
    else:
        # unused by the core when use_norms=False; one element per shard
        norms_dev = jax.device_put(np.ones(n_sh, dtype=np.float32),
                                   NamedSharding(mesh, P(axis_name)))
    return items_dev, norms_dev, n_items


@functools.partial(jax.jit, static_argnames=("k", "use_norms", "use_qf", "use_if"))
@jax.named_scope("topk_score_select")
def _topk_core(items, queries, norms, qf_rows, qf_cols, filter_items, k, use_norms, use_qf, use_if):
    # queries follow the item table's dtype: a bf16 table (16-bit-storage
    # models, the reference GPU's fp16 serving — knn.cu:133-142 SgemmEx
    # fp16-in/f32-acc) runs the GEMM on the MXU's bf16 path with f32
    # accumulation; f32 tables keep the highest-precision f32 contraction
    scores = jnp.dot(
        queries.astype(items.dtype), items.T,
        precision=(jax.lax.Precision.HIGHEST if items.dtype == jnp.float32 else None),
        preferred_element_type=jnp.float32,
    )
    if use_norms:
        scores = scores / norms[None, :]
    if use_if:
        scores = scores.at[:, filter_items].set(NEG_MAX, mode="drop")
    if use_qf:
        scores = scores.at[qf_rows, qf_cols].set(NEG_MAX, mode="drop")
    # note: XLA's top_k over even 100k+ columns is a fast partial select on
    # TPU (~11ms for 1024x160k); blockwise two-stage variants measured slower
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "use_norms", "use_qf", "use_if"))
def _topk_core_block(items, queries, norms, qf_rows, qf_cols, filter_items,
                     n_valid, offset, k, use_norms, use_qf, use_if):
    """One streaming block's score + select (see :func:`topk_streaming`).

    Like :func:`_topk_core` but with validity masking for the padded tail
    of the final block and global ids out (``offset`` is the block's first
    global row). Filter ids arrive block-local (host pre-translates).
    """
    scores = jnp.dot(
        queries.astype(items.dtype), items.T,
        precision=(jax.lax.Precision.HIGHEST if items.dtype == jnp.float32 else None),
        preferred_element_type=jnp.float32,
    )
    if use_norms:
        scores = scores / norms[None, :]
    local = jnp.arange(items.shape[0], dtype=jnp.int32)
    scores = jnp.where(local[None, :] < n_valid, scores, NEG_MAX)
    if use_if:
        scores = scores.at[:, filter_items].set(NEG_MAX, mode="drop")
    if use_qf:
        scores = scores.at[qf_rows, qf_cols].set(NEG_MAX, mode="drop")
    vals, idx = jax.lax.top_k(scores, k)
    # padded-tail rows can only surface on all-sentinel ties; never leak an
    # out-of-catalog id for them
    ids = jnp.where(idx < n_valid, idx.astype(jnp.int32) + offset, -1)
    return vals, ids


@functools.cache
def _topk_core_block_sharded(mesh, axis_name="d"):
    """Item-sharded twin of :func:`_topk_core_block` for streaming over a
    mesh: each streamed block is row-sharded across the chips, every chip
    scores its slice of the block and selects a local top-k, and the
    candidates ride ICI once for the block's merge (the same ICI candidate
    merge as :func:`_topk_core_sharded`). Composes the two scale mechanisms
    — streaming (beyond-HBM tables) and sharding — that the reference's
    single-device engine (knn.cu:131-265) has no analogue for.

    Filter ids arrive block-local (the host pre-translates, exactly as in
    the single-device block core) and are mapped to shard coordinates
    inside the shard. Returns replicated (Q, k) global ids/scores with the
    padded tail of the final block masked and id -1 on sentinel-only rows.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.jit, static_argnames=("k", "use_norms", "use_qf", "use_if"))
    def run(block, queries, norms, qf_rows, qf_cols, filter_items, n_valid,
            offset, k, use_norms, use_qf, use_if):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(None, None), P(axis_name),
                      P(None), P(None), P(None), P(), P()),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def shard_fn(block_l, queries_r, norms_l, qf_rows_r, qf_cols_r,
                     fi_r, n_valid_r, offset_r):
            n_local = block_l.shape[0]
            loff = jax.lax.axis_index(axis_name) * n_local
            scores = jnp.dot(queries_r.astype(block_l.dtype), block_l.T,
                             precision=(jax.lax.Precision.HIGHEST
                                        if block_l.dtype == jnp.float32
                                        else None),
                             preferred_element_type=jnp.float32)
            if use_norms:
                scores = scores / norms_l[None, :]
            # block-local row ids of this shard's slice; mask the padded
            # tail of the final block
            blk_ids = loff + jnp.arange(n_local, dtype=jnp.int32)
            scores = jnp.where(blk_ids[None, :] < n_valid_r, scores, NEG_MAX)
            if use_if:
                li = jnp.where((fi_r >= loff) & (fi_r < loff + n_local),
                               fi_r - loff, n_local)
                scores = scores.at[:, li].set(NEG_MAX, mode="drop")
            if use_qf:
                lc = jnp.where((qf_cols_r >= loff) & (qf_cols_r < loff + n_local),
                               qf_cols_r - loff, n_local)
                scores = scores.at[qf_rows_r, lc].set(NEG_MAX, mode="drop")
            k_local = min(k, n_local)
            vals, idx = jax.lax.top_k(scores, k_local)
            blk_idx = idx + loff
            vals_g = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)
            idx_g = jax.lax.all_gather(blk_idx, axis_name, axis=1, tiled=True)
            merged_vals, pos = jax.lax.top_k(vals_g, k)
            merged_idx = jnp.take_along_axis(idx_g, pos, axis=1)
            # sentinel-only winners (padded tail / fully filtered) -> id -1
            ids = jnp.where(merged_idx < n_valid_r,
                            merged_idx + offset_r, -1)
            return merged_vals, ids

        return shard_fn(block, queries, norms, qf_rows, qf_cols,
                        filter_items, n_valid, offset)

    return run


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_merge(vals_a, ids_a, vals_b, ids_b, k):
    """Merges two (Q, k) candidate sets into the running top-k."""
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    merged_vals, pos = jax.lax.top_k(vals, k)
    return merged_vals, jnp.take_along_axis(ids, pos, axis=1)


def topk_streaming(items, query, k, item_norms=None, filter_query_items=None,
                   filter_items=None, block_rows=None, num_threads=0,
                   q_chunk_rows=None, mesh=None, axis_name="d"):
    """Exact top-k over an item table too large for device residency.

    The serving path for catalogs whose factor table outgrows HBM: ``items``
    stays on the host (numpy array or anything sliceable to one, e.g. a
    memmap); row blocks are uploaded with a bounded in-flight window
    (dispatches are async, so block ``b+1``'s upload overlaps block ``b``'s
    GEMM) and a running ``(Q, k)`` candidate set merges per block via
    concat + ``top_k``. Results are identical to :func:`topk` on a resident
    table — full filter semantics, -FLT_MAX sentinels, short-result padding.

    Device memory is bounded: ``block_rows`` defaults from the same live-HBM
    budget as resident serving, sized against BOTH the score matrix and the
    block's own ``(block_rows, F)`` buffer, and large query batches are
    processed in uniformly padded chunks (one compiled program, one table
    pass total — blocks stream in the outer loop, every query chunk scores
    each block while it is resident). 16-bit item tables stream and score
    in bfloat16.

    With ``mesh=`` the two scale mechanisms compose: each streamed block is
    row-sharded across the mesh (every chip holds and scores 1/D of the
    block, so the per-chip working set shrinks by D and the GEMMs run in
    parallel), local top-k candidates ride ICI once per block for the merge
    (:func:`_topk_core_block_sharded`), and the running candidate set stays
    replicated. Results are identical to the single-device streaming path.
    """
    query = np.asarray(query) if not isinstance(query, jax.Array) else query
    if query.ndim == 1:
        query = query.reshape(1, -1)
    q_rows, F = query.shape
    n_items = items.shape[0]
    if k <= 0:
        return (np.empty((q_rows, 0), dtype=np.int32),
                np.empty((q_rows, 0), dtype=np.float32))
    k_eff = max(1, min(int(k), n_items))

    table_dt = _table_dtype(items)
    budget = _score_budget_elements()

    if block_rows is None:
        # bound the score matrix (q_chunk x block) AND the block itself
        # (block x F) by the budget — the block upload is the whole point
        # of streaming, it must never approach the table size
        block_rows = max(1024, min(budget // max(min(q_rows, 8192), 1),
                                   budget // max(F, 1)))
    # each block's top_k must return k_eff candidates (no pad sentinels,
    # which would win -FLT_MAX ties against later blocks' real filtered ids)
    block_rows = int(min(max(_pad_dim(block_rows), _pad_dim(k_eff)),
                         _pad_dim(n_items)))

    D = 1
    rep_shd = blk_shd = nrm_shd = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        D = mesh.shape[axis_name]
        block_rows = -(-block_rows // D) * D  # even per-chip slices
        rep_shd = NamedSharding(mesh, P())
        blk_shd = NamedSharding(mesh, P(axis_name, None))
        nrm_shd = NamedSharding(mesh, P(axis_name))
        sharded_core = _topk_core_block_sharded(mesh, axis_name)

    # uniform padded query-chunk width: the block kernel compiles once per
    # (chunk, block) shape instead of once per caller batch size
    if q_chunk_rows is None:
        q_chunk_rows = budget // block_rows
    q_chunk = int(_pad_dim(max(8, min(q_rows, q_chunk_rows))))
    chunk_starts = list(range(0, q_rows, q_chunk))
    q_devs = []
    for c0 in chunk_starts:
        qc = np.zeros((q_chunk, F), dtype=np.float32)
        qc[: min(q_chunk, q_rows - c0)] = np.asarray(
            query[c0 : c0 + q_chunk], dtype=np.float32)
        q_devs.append(jnp.asarray(qc) if mesh is None
                      else jax.device_put(qc, rep_shd))

    fi = (np.asarray(filter_items, dtype=np.int64)
          if filter_items is not None and len(filter_items) > 0 else None)
    qf_row = qf_col = None
    if filter_query_items is not None:
        coo = filter_query_items.tocoo()
        order = np.argsort(coo.col, kind="stable")
        qf_row = coo.row[order].astype(np.int64)
        qf_col = coo.col[order].astype(np.int64)

    running = [None] * len(chunk_starts)  # (vals, ids) device pair per chunk
    pending = []  # bound in-flight blocks so uploads don't pile up

    for start in range(0, n_items, block_rows):
        stop = min(start + block_rows, n_items)
        rows_here = stop - start
        block = np.asarray(items[start:stop], dtype=table_dt)
        if rows_here < block_rows:
            block = np.concatenate(
                [block, np.zeros((block_rows - rows_here, F), dtype=table_dt)])
        block_dev = jax.device_put(block) if mesh is None else \
            jax.device_put(block, blk_shd)

        if item_norms is not None:
            nrm = np.ones(block_rows, dtype=np.float32)
            nrm[:rows_here] = np.asarray(item_norms[start:stop], dtype=np.float32)
            norms_dev = (jnp.asarray(nrm) if mesh is None
                         else jax.device_put(nrm, nrm_shd))
        elif mesh is None:
            norms_dev = jnp.zeros((1,), dtype=jnp.float32)
        else:
            # unused (use_norms False); one element per shard
            norms_dev = jax.device_put(np.zeros(D, dtype=np.float32), nrm_shd)

        if fi is not None:
            in_block = fi[(fi >= start) & (fi < stop)] - start
            use_if = len(in_block) > 0
            fi_local = np.full(_pad_dim(max(len(in_block), 1)), block_rows,
                               dtype=np.int32)
            fi_local[: len(in_block)] = in_block
            fi_dev = (jnp.asarray(fi_local) if mesh is None
                      else jax.device_put(fi_local, rep_shd))
        else:
            use_if = False
            fi_dev = jnp.zeros((1,), dtype=jnp.int32)
            if mesh is not None:
                fi_dev = jax.device_put(np.zeros(1, dtype=np.int32), rep_shd)

        if qf_col is not None:
            lo = np.searchsorted(qf_col, start)
            hi = np.searchsorted(qf_col, stop)
            blk_rows_g = qf_row[lo:hi]
            blk_cols_l = (qf_col[lo:hi] - start).astype(np.int32)
        else:
            blk_rows_g = blk_cols_l = None

        for ci, c0 in enumerate(chunk_starts):
            c1 = min(c0 + q_chunk, q_rows)
            if blk_rows_g is not None:
                m = (blk_rows_g >= c0) & (blk_rows_g < c1)
                rows_sel = (blk_rows_g[m] - c0).astype(np.int32)
                cols_sel = blk_cols_l[m]
                nnz = len(cols_sel)
                use_qf = nnz > 0
                padded_nnz = _pad_dim(max(nnz, 1))
                qf_rows_p = np.full(padded_nnz, q_chunk, dtype=np.int32)
                qf_cols_p = np.zeros(padded_nnz, dtype=np.int32)
                qf_rows_p[:nnz] = rows_sel
                qf_cols_p[:nnz] = cols_sel
                if mesh is None:
                    qf_rows_dev = jnp.asarray(qf_rows_p)
                    qf_cols_dev = jnp.asarray(qf_cols_p)
                else:
                    qf_rows_dev = jax.device_put(qf_rows_p, rep_shd)
                    qf_cols_dev = jax.device_put(qf_cols_p, rep_shd)
            else:
                use_qf = False
                qf_rows_dev = jnp.zeros((1,), dtype=jnp.int32)
                qf_cols_dev = jnp.zeros((1,), dtype=jnp.int32)
                if mesh is not None:
                    z = np.zeros(1, dtype=np.int32)
                    qf_rows_dev = jax.device_put(z, rep_shd)
                    qf_cols_dev = jax.device_put(z, rep_shd)

            if mesh is None:
                vals, ids = _topk_core_block(
                    block_dev, q_devs[ci], norms_dev, qf_rows_dev, qf_cols_dev,
                    fi_dev, jnp.int32(rows_here), jnp.int32(start),
                    k_eff, item_norms is not None, use_qf, use_if,
                )
            else:
                vals, ids = sharded_core(
                    block_dev, q_devs[ci], norms_dev, qf_rows_dev, qf_cols_dev,
                    fi_dev, jnp.int32(rows_here), jnp.int32(start),
                    k_eff, item_norms is not None, use_qf, use_if,
                )
            if running[ci] is None:
                running[ci] = (vals, ids)
            else:
                running[ci] = _topk_merge(
                    running[ci][0], running[ci][1], vals, ids, k_eff)

        # keep at most a couple of block uploads in flight
        pending.append(block_dev)
        if len(pending) > 2:
            pending.pop(0)
            running[0][0].block_until_ready()

    ids = np.empty((q_rows, k_eff), dtype=np.int32)
    vals = np.empty((q_rows, k_eff), dtype=np.float32)
    for ci, c0 in enumerate(chunk_starts):
        c1 = min(c0 + q_chunk, q_rows)
        ids[c0:c1] = np.asarray(running[ci][1])[: c1 - c0]
        vals[c0:c1] = np.asarray(running[ci][0])[: c1 - c0]
    if k_eff < k:
        pad = k - k_eff
        ids = np.concatenate(
            [ids, np.full((q_rows, pad), -1, dtype=np.int32)], axis=1)
        vals = np.concatenate(
            [vals, np.full((q_rows, pad), NEG_MAX, dtype=np.float32)], axis=1)
    return ids, vals


class TopkFuture:
    """Deferred top-k result: dispatched to the device, not yet fetched.

    Returned by :func:`topk_async`. Calling :meth:`result` drains the
    remaining device buffers to the host and returns the final
    ``(ids, distances)`` numpy arrays (identical to what :func:`topk` would
    have returned). Dispatches are asynchronous, so work enqueued by later
    calls overlaps this future's device compute — the building block for
    pipelined serving where per-call host/transport round trips dominate
    (see MatrixFactorizationBase.recommend_pipelined).
    """

    def __init__(self, pending, ids_out, scores_out, k, k_eff):
        self._pending = pending
        self._ids_out = ids_out
        self._scores_out = scores_out
        self._k = k
        self._k_eff = k_eff
        self._done = False

    def result(self):
        if not self._done:
            for s0, s1, rows_n, vals, idx in self._pending:
                self._ids_out[s0:s1] = np.asarray(idx)[:rows_n]
                self._scores_out[s0:s1] = np.asarray(vals)[:rows_n]
            self._pending = []
            if self._k_eff < self._k:
                q_rows = self._ids_out.shape[0]
                pad_ids = np.full((q_rows, self._k - self._k_eff), -1, dtype=np.int32)
                pad_scores = np.full(
                    (q_rows, self._k - self._k_eff), NEG_MAX,
                    dtype=self._scores_out.dtype)
                self._ids_out = np.concatenate([self._ids_out, pad_ids], axis=1)
                self._scores_out = np.concatenate([self._scores_out, pad_scores], axis=1)
            self._done = True
        return self._ids_out, self._scores_out


def topk(items, query, k, item_norms=None, filter_query_items=None, filter_items=None,
         num_threads=0, mesh=None, n_items=None):
    """Return the top ``k`` scoring item (ids, distances) for each query row.

    Parameters
    ----------
    items : (N, F) array or jax.Array — item factors. With ``mesh=`` this may
        be a pre-sharded padded table from :func:`shard_items_for_topk`
        (then ``n_items`` must give the true row count).
    query : (Q, F) or (F,) array — query factors
    k : int
    item_norms : (N,) array, optional — scores are divided by these. With a
        pre-sharded ``items`` this must be the padded norms array returned
        by :func:`shard_items_for_topk` (or None).
    filter_query_items : csr_matrix, optional — per-query items to exclude
    filter_items : array_like, optional — items to exclude for all queries
    num_threads : ignored (API parity; parallelism is the device's job)
    mesh : jax.sharding.Mesh, optional — serve item-sharded across the mesh:
        each chip scores its shard, candidates merge over ICI. Results are
        bit-identical to the single-device path.
    n_items : int, optional — true item count when ``items`` is pre-padded

    Returns
    -------
    (ids, distances) : (Q, k) int32 / float32 numpy arrays. If k exceeds the
    number of items, the tail is padded with id -1 / score -FLT_MAX.
    """
    return topk_async(
        items, query, k, item_norms=item_norms,
        filter_query_items=filter_query_items, filter_items=filter_items,
        num_threads=num_threads, mesh=mesh, n_items=n_items,
    ).result()


def topk_async(items, query, k, item_norms=None, filter_query_items=None,
               filter_items=None, num_threads=0, mesh=None, n_items=None):
    """Like :func:`topk` but returns a :class:`TopkFuture` without fetching.

    All device work is enqueued (chunk uploads, GEMM+select programs); the
    host-side result copy is deferred to ``.result()``. Within the call, a
    bounded in-flight window still drains early chunks into the output
    buffers so a huge query batch can't accumulate unbounded device memory.
    """
    query = np.asarray(query) if not isinstance(query, jax.Array) else query
    if query.ndim == 1:
        query = query.reshape(1, -1)

    q_rows = query.shape[0]
    use_mesh = mesh is not None
    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if isinstance(items, jax.Array) and n_items is not None:
            # pre-sharded by shard_items_for_topk (caller caches the upload)
            items_dev = items
            count = int(n_items)
            if item_norms is None:
                norms_dev = jax.device_put(
                    np.ones(mesh.shape["d"], dtype=np.float32),
                    NamedSharding(mesh, P("d")))
            elif isinstance(item_norms, jax.Array):
                norms_dev = item_norms
            else:
                padded_n = items.shape[0]
                nn = np.ones(padded_n, dtype=np.float32)
                nn[:count] = np.asarray(item_norms, dtype=np.float32)
                norms_dev = jax.device_put(nn, NamedSharding(mesh, P("d")))
        else:
            items_dev, norms_dev, count = shard_items_for_topk(
                np.asarray(items), item_norms, mesh)
        n_items = count
        query_replicated = NamedSharding(mesh, P())
    else:
        n_items = items.shape[0]
    if k <= 0:
        return TopkFuture([], np.empty((q_rows, 0), dtype=np.int32),
                          np.empty((q_rows, 0), dtype=np.float32), 0, 0)
    k_eff = max(1, min(int(k), n_items))

    out_dtype = np.float32
    ids_out = np.empty((q_rows, k_eff), dtype=np.int32)
    scores_out = np.empty((q_rows, k_eff), dtype=out_dtype)

    if not use_mesh:
        items_dev = jnp.asarray(items, dtype=_table_dtype(items))
        norms_dev = (
            jnp.asarray(item_norms, dtype=jnp.float32)
            if item_norms is not None
            else jnp.zeros((1,), dtype=jnp.float32)
        )

    if filter_items is not None and len(filter_items) > 0:
        fi = np.asarray(filter_items, dtype=np.int32)
        fi_padded = np.full(_pad_dim(len(fi)), fi[0], dtype=np.int32)
        fi_padded[: len(fi)] = fi
        fi_dev = jnp.asarray(fi_padded)
        use_if = True
    else:
        fi_dev = jnp.zeros((1,), dtype=jnp.int32)
        use_if = False

    chunk = max(8, min(q_rows, _score_budget_elements() // max(n_items, 1)))
    chunk = _pad_dim(chunk)

    query_on_device = isinstance(query, jax.Array)

    # pipeline chunk computations: dispatches are async, so fetching each
    # chunk before enqueueing the next would serialize transport round
    # trips; a bounded in-flight window keeps peak device memory at a few
    # chunks' buffers instead of the whole query's
    _MAX_IN_FLIGHT = 4
    pending = []

    def _drain(limit):
        while len(pending) > limit:
            s0, s1, rows_n, vals, idx = pending.pop(0)
            ids_out[s0:s1] = np.asarray(idx)[:rows_n]
            scores_out[s0:s1] = np.asarray(vals)[:rows_n]

    start = 0
    while start < q_rows:
        stop = min(start + chunk, q_rows)
        rows_here = stop - start
        padded_rows = _pad_dim(rows_here)

        if use_mesh:
            # replicate the chunk's queries across the mesh explicitly: a
            # committed single-device array can't mix with mesh-committed
            # items inside one program, but device_put reshards it directly
            # (no host round trip for device-resident queries)
            if query_on_device:
                q = query[start:stop].astype(jnp.float32)
                if rows_here < padded_rows:
                    q = jnp.pad(q, ((0, padded_rows - rows_here), (0, 0)))
                q_dev = jax.device_put(q, query_replicated)
            else:
                q_np = np.zeros((padded_rows, query.shape[1]), dtype=np.float32)
                q_np[:rows_here] = np.asarray(query[start:stop], dtype=np.float32)
                q_dev = jax.device_put(q_np, query_replicated)
        elif query_on_device:
            # stay on device: pad with zeros without a host round-trip
            q_dev = jnp.zeros((padded_rows, query.shape[1]), dtype=jnp.float32)
            q_dev = q_dev.at[:rows_here].set(query[start:stop].astype(jnp.float32))
        else:
            q_np = np.zeros((padded_rows, query.shape[1]), dtype=np.float32)
            q_np[:rows_here] = np.asarray(query[start:stop], dtype=np.float32)
            q_dev = jnp.asarray(q_np)

        if filter_query_items is not None:
            sub = filter_query_items[start:stop]
            counts = np.diff(sub.indptr)
            qf_rows = np.repeat(np.arange(rows_here, dtype=np.int32), counts)
            qf_cols = np.asarray(sub.indices, dtype=np.int32)
            nnz = len(qf_cols)
            padded_nnz = _pad_dim(max(nnz, 1))
            # pad with out-of-bounds rows so mode='drop' ignores them
            qf_rows_p = np.full(padded_nnz, padded_rows, dtype=np.int32)
            qf_cols_p = np.zeros(padded_nnz, dtype=np.int32)
            qf_rows_p[:nnz] = qf_rows
            qf_cols_p[:nnz] = qf_cols
            qf_rows_dev = jnp.asarray(qf_rows_p)
            qf_cols_dev = jnp.asarray(qf_cols_p)
            use_qf = True
        else:
            qf_rows_dev = jnp.zeros((1,), dtype=jnp.int32)
            qf_cols_dev = jnp.zeros((1,), dtype=jnp.int32)
            use_qf = False

        if use_mesh:
            vals, idx = _topk_core_sharded(mesh)(
                items_dev, q_dev, norms_dev, qf_rows_dev, qf_cols_dev, fi_dev,
                k_eff, n_items, item_norms is not None, use_qf, use_if,
            )
        else:
            vals, idx = _topk_core(
                items_dev,
                q_dev,
                norms_dev,
                qf_rows_dev,
                qf_cols_dev,
                fi_dev,
                k_eff,
                item_norms is not None,
                use_qf,
                use_if,
            )
        pending.append((start, stop, rows_here, vals, idx))
        _drain(_MAX_IN_FLIGHT - 1)
        start = stop

    return TopkFuture(pending, ids_out, scores_out, k, k_eff)
