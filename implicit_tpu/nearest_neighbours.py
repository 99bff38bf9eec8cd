"""Item-item nearest-neighbour models (Cosine / TF-IDF / BM25).

Functional parity with /root/reference/implicit/nearest_neighbours.py:10-258
and its Cython kernels (implicit/_nearest_neighbours.pyx:43-171). Fitting
computes, for every item, the top-K most similar items under the weighted
inner product AᵀA; serving scores a user's liked-items row against the stored
similarity matrix.

The reference streams one sparse AᵀA row per OpenMP thread with a SMMP
accumulator (and has no CUDA path for this family at all). Here the
similarity build dispatches by estimated cost between a fused native host
kernel (single-pass SMMP + top-K, OpenMP) and an accelerator path (dense
MXU gramian from one COO upload + device top-K) — the latter optionally
row-sharded over a device mesh (``mesh=``), which divides the flops and
per-chip HBM by the mesh size.
"""

import numpy as np
import scipy.sparse as sp

from .recommender_base import RecommenderBase
from .utils import _batch_call, _filter_items_from_results, check_csr

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

def _resolve_mesh(mesh):
    """``mesh=`` ctor/kwarg convention: an int builds a local 1-D mesh."""
    if mesh is None or not isinstance(mesh, int):
        return mesh
    from .parallel import create_mesh

    return create_mesh(mesh)


def all_pairs_knn(
    user_items, K=100, show_progress=True, num_threads=0, method="auto", mesh=None
):
    """Returns the top K nearest neighbours for every item.

    ``user_items`` is the (weighted) users×items matrix; similarity is the
    inner product of item columns (rows of AᵀA), K-sparsified per row.
    Equivalent of /root/reference/implicit/_nearest_neighbours.pyx:113-171.

    ``method`` selects the backend: "host" streams blocked sparse products
    through scipy's C spgemm (cost ∝ sum of squared user degrees — the
    output-sparsity-aware algorithm, right for huge power-law catalogs);
    "device" computes the dense gramian on the TPU MXU (cost ∝ items² x
    users — measured 1.6x the host at MovieLens-20M shape, growing with
    density since the host's pair-expansion work scales with squared user
    degree). "auto" picks by estimated cost.

    ``mesh`` (a jax Mesh or a device count) runs the device method
    multi-chip: the gramian's rows shard over the mesh, dividing both the
    MXU flops and the per-chip HBM footprint by the mesh size — the item
    cap rises by √D. The host method ignores it.
    """
    user_items = check_csr(user_items)
    mesh = _resolve_mesh(mesh)
    n_shards = mesh.size if mesh is not None else 1
    item_cap = int(_DEVICE_KNN_MAX_ITEMS * np.sqrt(n_shards))
    if method == "auto":
        method = ("device" if _device_knn_wins(user_items, n_shards, num_threads)
                  else "host")
    if method == "device":
        if user_items.shape[1] > item_cap:
            raise ValueError(
                f"method='device' holds a dense {user_items.shape[1]}^2 "
                f"similarity gramian in HBM; catalogs over "
                f"{item_cap} items must use method='host' "
                "(the output-sparsity-aware spgemm, which is also faster "
                "there: its cost scales with co-occurring pairs, not "
                "items^2 x users)"
            )
        if user_items.nnz >= 1 << 31:
            raise ValueError(
                "method='device' slices the COO stream with int32 offsets; "
                "matrices with >= 2^31 nonzeros must use method='host'"
            )
        if user_items.nnz and user_items.data.min() < 0:
            raise ValueError(
                "method='device' keeps only positive similarities (the dense "
                "gramian cannot distinguish no-co-occurrence from similarity "
                "0); matrices with negative weights must use method='host'"
            )
        return _all_pairs_knn_device(user_items, K, mesh=mesh)
    return _all_pairs_knn_host(user_items, K, num_threads)


def _all_pairs_knn_host(user_items, K, num_threads=0):
    """Fused AᵀA + top-K through the native SMMP kernel.

    One pass per item row with a dense per-thread accumulator — the sparse
    product is never materialized (native/packer.cpp:knn_all_pairs, the
    equivalent of /root/reference/implicit/_nearest_neighbours.pyx:113-171's
    prange loop; measured ~9x the blocked-scipy formulation single-core at
    last.fm shape). Falls back to blocked scipy spgemm + native per-row
    top-K when the native library isn't built.
    """
    from . import native

    n_items = user_items.shape[1]
    item_users = user_items.T.tocsr()
    item_users.sort_indices()

    fused = native.knn_all_pairs(item_users, user_items, K, num_threads)
    if fused is not None:
        rows, cols, vals = fused
        return sp.coo_matrix((vals, (rows, cols)), shape=(n_items, n_items))

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


# the dense device gramian holds an items x items f32 matrix: cap the
# catalog so it stays well inside HBM (36k^2 f32 = 5.2GB)
_DEVICE_KNN_MAX_ITEMS = 36_000
_DEVICE_KNN_DENSE_BYTES = 1 << 29  # densified-chunk budget (tests shrink it)


def _device_knn_wins(csr, n_shards=1, num_threads=0):
    """Estimated-cost dispatch between the host SMMP and the MXU gramian.

    Host cost ∝ Σ d_u² (the pair-expansion work of the SMMP-style
    accumulator): the fused native kernel runs ~145M pairs/s per core
    (measured 11.9s at last.fm shape single-core) across
    ``knn_effective_threads`` OpenMP workers; the blocked-scipy fallback
    (no compiler) measured ~40M pairs/s. Device cost ∝ I²·U MXU flops plus
    the one-time COO upload through the transport. A mesh divides the
    on-device terms by its size. Exact zero/negative similarity ties are
    only representable on the host path (the dense gramian cannot
    distinguish "no co-occurrence" from "similarity 0").
    """
    from . import native
    from .tpu import HAS_TPU

    if not HAS_TPU:
        return False
    users, items = csr.shape
    if items > _DEVICE_KNN_MAX_ITEMS * np.sqrt(n_shards) or items < 2 or csr.nnz == 0:
        return False
    if csr.nnz >= 1 << 31:  # device path slices the COO with int32 offsets
        return False
    if csr.data.min() < 0:
        return False
    if native.get_lib() is not None:
        host_rate = 145e6 * native.knn_effective_threads(items, num_threads)
    else:
        host_rate = 40e6  # blocked-scipy fallback pair rate
    degrees = np.diff(csr.indptr).astype(np.float64)
    host_s = float(degrees @ degrees) / host_rate
    device_s = (
        float(items) ** 2 * users * 2 / (20e12 * n_shards)  # 3-pass f32 MXU gramian
        + csr.nnz * 1.2e-8  # device scatter densification
        + csr.nnz * 12 / 40e6  # one whole-matrix COO upload (12B/entry)
        + float(items) ** 2 / (15e9 * n_shards)  # device top-k sweep (pipelined)
    )
    # small problems stay on the host: a first-time device fit also pays a
    # one-off XLA compile (tens of seconds) that only large fits amortize
    return host_s > 5.0 and device_s < host_s


def _gramian_coo_flats(csr):
    """Chunk layout + padded COO flats shared by the device gramian paths.

    One upload of the whole matrix as (uid, col, val) flats; each user
    chunk is then a fixed-size ``dynamic_slice`` of it (overrun into the
    next chunk and the tail padding land outside the chunk's local row
    range and are dropped by the scatter) — no per-chunk host packing or
    transfer. Returns ``(chunk, starts, cap, (uids, cols, vals))`` as host
    arrays; callers place them with their own sharding.

    Big densified chunks: every accumulate reads+writes the whole (I, I)
    gramian, so the chunk count — not the matmul — dominates HBM traffic;
    a 2GB densified slab still leaves the worst-case S plus headroom in HBM.
    """
    users, items = csr.shape
    if csr.nnz >= 1 << 31:
        # the jitted accumulate programs slice the flats with int32 offsets
        raise ValueError(
            "the device gramian slices its COO upload with int32 offsets; "
            f"matrices with >= 2**31 nonzeros are unsupported (got {csr.nnz:,}). "
            "Item-item KNN can use method='host'; EASE has no host path at "
            "this scale."
        )
    chunk = max(8, min(users, _DEVICE_KNN_DENSE_BYTES // max(items, 1)))
    indptr = csr.indptr
    starts = list(range(0, users, chunk))
    cap = max(
        int(indptr[min(s + chunk, users)] - indptr[s]) for s in starts
    ) if starts else 1
    cap = max(cap, 1)
    uids = np.repeat(np.arange(users, dtype=np.int32), np.diff(indptr))
    flats = (
        np.concatenate([uids, np.full(cap, users, np.int32)]),
        np.concatenate([csr.indices.astype(np.int32), np.zeros(cap, np.int32)]),
        np.concatenate([csr.data.astype(np.float32), np.zeros(cap, np.float32)]),
    )
    return chunk, starts, cap, flats


def _dense_gramian_device(user_items):
    """Dense item-item gramian ``AᵀA`` on the accelerator, as a device array.

    User rows are scatter-densified on device in chunks (from one COO
    upload, :func:`_gramian_coo_flats`) and accumulated as S += DᵀD MXU
    contractions in f32. Shared by the device KNN fit and the EASE solve
    (:mod:`implicit_tpu.ease`).
    """
    import functools

    import jax
    import jax.numpy as jnp

    csr = user_items.tocsr()
    users, items = csr.shape
    indptr = csr.indptr
    chunk, starts, cap, (uids, cols, vals) = _gramian_coo_flats(csr)
    d_uids = jnp.asarray(uids)
    d_cols = jnp.asarray(cols)
    d_vals = jnp.asarray(vals)

    @functools.partial(
        jax.jit, static_argnames=("cap", "n_rows", "n_items"), donate_argnums=(0,)
    )
    def accumulate(S, uids, cols, vals, lo, start, cap, n_rows, n_items):
        u = jax.lax.dynamic_slice(uids, (lo,), (cap,))
        c = jax.lax.dynamic_slice(cols, (lo,), (cap,))
        v = jax.lax.dynamic_slice(vals, (lo,), (cap,))
        local = u - start  # >= n_rows for entries past this chunk -> dropped
        D = jnp.zeros((n_rows, n_items), jnp.float32).at[local, c].add(
            v, mode="drop"
        )
        # HIGH (3-pass bf16, ~1e-6 relative) halves the MXU time of HIGHEST
        # while staying far inside the host path's f64-vs-f32 agreement
        return S + jax.lax.dot_general(
            D, D, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )

    S = jnp.zeros((items, items), jnp.float32)
    for start in starts:
        S = accumulate(
            S, d_uids, d_cols, d_vals, jnp.int32(indptr[start]),
            jnp.int32(start), cap, chunk, items,
        )
    return S


# jitted meshed-fit programs keyed by (kind, mesh, static shapes): closures
# rebuilt per call would re-trace/re-lower on every fit (same policy as
# _topk_core_block_sharded on the serving side). LRU-bounded: the keys carry
# data-dependent values (cap, chunk change with every new dataset), so an
# unbounded dict would grow compiled-program memory without limit in a
# long-lived service refitting on evolving matrices.
_MESHED_PROGRAMS = {}
_MESHED_PROGRAMS_CAP = 32


def _meshed_program(key, build):
    """Bounded LRU fetch-or-build for the jitted meshed-fit programs."""
    prog = _MESHED_PROGRAMS.pop(key, None)
    if prog is None:
        prog = build()
        while len(_MESHED_PROGRAMS) >= _MESHED_PROGRAMS_CAP:
            _MESHED_PROGRAMS.pop(next(iter(_MESHED_PROGRAMS)))
    _MESHED_PROGRAMS[key] = prog
    return prog


def _meshed_gramian_step(mesh, cap, chunk, block, items_pad, items):
    """Jitted sharded gramian-accumulate program, cached per (mesh, shapes)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    key = ("gramian", mesh, cap, chunk, block, items_pad, items)
    axis = mesh.axis_names[0]

    def acc(S_loc, uids, cols, vals, lo, start):
        u = jax.lax.dynamic_slice(uids, (lo,), (cap,))
        c = jax.lax.dynamic_slice(cols, (lo,), (cap,))
        v = jax.lax.dynamic_slice(vals, (lo,), (cap,))
        local = u - start  # >= chunk for entries past this chunk -> dropped
        # the column axis pads to items_pad so the row-block slice below
        # never clamps (dynamic_slice clamps out-of-range starts, which
        # would silently shift the last shard's rows)
        dense = jnp.zeros((chunk, items_pad), jnp.float32).at[local, c].add(
            v, mode="drop"
        )
        r0 = jax.lax.axis_index(axis) * block
        rows = jax.lax.dynamic_slice(dense, (0, r0), (chunk, block))
        return S_loc + jax.lax.dot_general(
            rows, dense[:, :items], (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )

    return _meshed_program(key, lambda: jax.jit(
        shard_map(
            acc, mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P(), P(), P()),
            out_specs=P(axis, None),
            check_vma=False,
        ),
        donate_argnums=(0,),
    ))


def _dense_gramian_meshed(user_items, mesh):
    """Row-sharded dense item gramian ``AᵀA`` over a device mesh.

    Chip ``c`` owns the contiguous row block ``[c·B, (c+1)·B)`` of ``S``:
    per user chunk every chip densifies the same (chunk, items) slab from
    one replicated COO upload (a cheap scatter) and contracts only its own
    row block on the MXU — the O(items²·users) flops divide by the mesh
    size and the per-chip ``S`` footprint drops to items²/D, which is what
    raises the device catalog cap by √D. No collective runs at all: the
    result stays row-sharded (every chip holds all columns of its rows) for
    the per-row top-K sparsification. The reference has no multi-device
    path for this family at all (its KNN fit is CPU-only,
    /root/reference/implicit/_nearest_neighbours.pyx:113-171).

    Returns ``(S, block)`` where ``S`` is the (D·block, items) sharded
    array, rows ≥ ``items`` zero padding.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    csr = user_items.tocsr()
    users, items = csr.shape
    axis = mesh.axis_names[0]
    D = mesh.shape[axis]
    block = max(1, -(-items // D))
    items_pad = D * block

    indptr = csr.indptr
    chunk, starts, cap, (uids, cols, vals) = _gramian_coo_flats(csr)
    rep = NamedSharding(mesh, P())
    d_uids = jax.device_put(uids, rep)
    d_cols = jax.device_put(cols, rep)
    d_vals = jax.device_put(vals, rep)

    step = _meshed_gramian_step(mesh, cap, chunk, block, items_pad, items)

    S = jnp.zeros(
        (items_pad, items), jnp.float32, device=NamedSharding(mesh, P(axis, None))
    )
    for start in starts:
        S = step(S, d_uids, d_cols, d_vals, jnp.int32(indptr[start]),
                 jnp.int32(start))
    return S, block


def _dense_topk_to_coo_meshed(S, items, K, mesh, keep="positive"):
    """K-sparsifies a row-sharded (D·block, items) device matrix into COO.

    Each chip runs ``lax.top_k`` over its own row block — columns are global
    on every chip, so no collective is needed; padding rows (≥ ``items``)
    drop on the host after one fetch. ``keep`` as in _dense_topk_to_coo.
    """
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    k = min(K, items)

    key = ("topk", mesh, k)
    tk = _meshed_program(key, lambda: jax.jit(
        shard_map(
            lambda Sb: tuple(jax.lax.top_k(Sb, k)), mesh=mesh,
            in_specs=P(axis, None), out_specs=(P(axis, None), P(axis, None)),
            check_vma=False,
        )
    ))
    vals, cols = tk(S)
    vals = np.asarray(vals, dtype=np.float64)[:items]
    cols = np.asarray(cols)[:items]
    r, c = np.nonzero(vals > 0 if keep == "positive" else vals != 0)
    return sp.coo_matrix(
        (vals[r, c], (r.astype(np.int32), cols[r, c].astype(np.int32))),
        shape=(items, items),
    )


def _dense_topk_to_coo(S, K, keep="positive"):
    """K-sparsifies a dense device (items x items) matrix into COO triples.

    Per-row lax.top_k over row blocks; ``keep`` selects which of the K
    values survive: "positive" (similarity gramians — only co-occurring
    pairs carry signal) or "nonzero" (signed weight matrices, e.g. EASE).
    Dispatches enqueue first, then fetch (a per-block fetch would serialize
    ~dozens of transport round trips).
    """
    import functools

    import jax

    items = S.shape[0]

    @functools.partial(jax.jit, static_argnames=("k",))
    def topk_block(Sb, k):
        return jax.lax.top_k(Sb, k)

    k = min(K, items)
    row_block = max(8, min(items, (1 << 25) // max(items, 1)))
    pending = []
    for start in range(0, items, row_block):
        stop = min(start + row_block, items)
        pending.append((start, topk_block(S[start:stop], k)))
    triples = []
    for start, (vals, cols) in pending:
        vals = np.asarray(vals, dtype=np.float64)
        cols = np.asarray(cols)
        r, c = np.nonzero(vals > 0 if keep == "positive" else vals != 0)
        triples.append(
            (r.astype(np.int32) + start, cols[r, c].astype(np.int32), vals[r, c]))

    rows = np.concatenate([t[0] for t in triples]) if triples else np.empty(0, np.int32)
    cols = np.concatenate([t[1] for t in triples]) if triples else np.empty(0, np.int32)
    vals = np.concatenate([t[2] for t in triples]) if triples else np.empty(0)
    return sp.coo_matrix((vals, (rows, cols)), shape=(items, items))


def _all_pairs_knn_device(user_items, K, mesh=None):
    """Exact AᵀA top-K on the accelerator: MXU gramian over densified chunks.

    The gramian comes from :func:`_dense_gramian_device` (or its mesh-
    sharded twin when ``mesh`` is given); sparsification from
    :func:`_dense_topk_to_coo`. Replaces the host path's pair-expansion
    with dense flops — the win condition is decided by
    :func:`_device_knn_wins`.
    """
    if mesh is not None:
        S, _ = _dense_gramian_meshed(user_items, mesh)
        return _dense_topk_to_coo_meshed(S, user_items.shape[1], K, mesh,
                                         keep="positive")
    return _dense_topk_to_coo(_dense_gramian_device(user_items), K,
                              keep="positive")


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


def _topk_rows_sorted(scores_csr, k):
    """Per-row top-k of a sparse score matrix, sorted descending, padded.

    Returns (B, k) int32 ids padded with -1 and (B, k) float64 scores padded
    with -FLT_MAX — the framework-wide batch padding convention.
    """
    from . import native

    n_rows = scores_csr.shape[0]
    ids = np.full((n_rows, k), -1, dtype=np.int32)
    out = np.full((n_rows, k), -np.finfo(np.float32).max, dtype=np.float64)
    r, c, v = native.topk_rows(
        scores_csr.indptr, scores_csr.indices, scores_csr.data.astype(np.float64), k
    )
    if len(r):
        order = np.lexsort((-v, r))  # group by row, descending score inside
        r, c, v = r[order], c[order], v[order]
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(np.bincount(r, minlength=n_rows), out=starts[1:])
        within = np.arange(len(r), dtype=np.int64) - starts[r]
        ids[r, within] = c
        out[r, within] = v
    return ids, out


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
        Threads for the native host similarity build (0 = all cores)
    mesh : jax.sharding.Mesh or int, optional
        Fit multi-chip: the device similarity build row-shards the dense
        gramian over the mesh, dividing the MXU flops and per-chip HBM by
        the mesh size (item cap rises by √D). Only affects fits that the
        cost model (or ``method='device'``) routes to the accelerator.
    """

    def __init__(self, K=20, num_threads=0, mesh=None):
        self.similarity = None
        self.K = K
        self.num_threads = num_threads
        self.mesh = mesh
        self.scorer = None

    def _weighted(self, counts):
        """Weighting transform applied before the similarity build."""
        return counts

    def fit(self, counts, show_progress=True, callback=None):
        """Computes and stores the K-sparsified item-item similarity matrix."""
        if callback:
            raise NotImplementedError("callback isn't supported on ItemItemRecommender.fit")

        # warn about the USER's input format here (the reference's check),
        # then convert the weighting transform's own coo/csc output silently
        # — all_pairs_knn's check_csr must not blame the caller for a format
        # this class produced itself
        counts = check_csr(counts)
        weighted = sp.csr_matrix(self._weighted(counts))
        self.similarity = all_pairs_knn(
            weighted, self.K, show_progress=show_progress,
            num_threads=self.num_threads, mesh=self.mesh,
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

        scalar = np.isscalar(userid)
        if not scalar and user_items.shape[0] != len(userid):
            raise ValueError("user_items must contain 1 row for every user in userids")
        if filter_items is not None and items is not None:
            raise ValueError("Can't specify both filter_items and items")

        if items is not None:
            if scalar:
                return self._recommend_restricted(
                    user_items, N, filter_already_liked_items, np.array(items)
                )
            # items= subsetting stays on the scalar path (rare, small subsets)
            return _batch_call(
                self.recommend,
                userid,
                user_items=user_items,
                N=N,
                score_dtype=np.float64,
                filter_already_liked_items=filter_already_liked_items,
                recalculate_user=recalculate_user,
                items=items,
            )

        # one sparse GEMM scores the whole batch; scalar queries run through
        # the same path as a 1-row batch so batch == scalar by construction
        ids, scores = self._recommend_batch(
            userid if not scalar else np.zeros(1),
            user_items,
            N,
            filter_already_liked_items,
            filter_items,
        )
        if scalar:
            ids, scores = ids[0], scores[0]
            valid = ids >= 0
            return ids[valid], scores[valid]
        return ids, scores

    recommend.__doc__ = RecommenderBase.recommend.__doc__

    def _recommend_batch(self, userids, user_items, N, filter_already_liked_items, filter_items):
        """All-users-at-once serving: one sparse GEMM + one top-K pass.

        The reference loops a scalar SMMP product per user
        (/root/reference/implicit/utils.py:106-136 and
        _nearest_neighbours.pyx:62-106); here the whole batch scores as
        ``likes @ similarity`` through scipy's C spgemm and the rows go
        through the native per-row top-K — evaluation over a KNN model no
        longer crawls one user at a time.
        """
        scores = (user_items @ self.similarity).tocsr()
        if filter_already_liked_items:
            # zeroed liked positions drop out of the candidate set entirely,
            # same as the scalar scorer's remove_own_likes
            mask = user_items.copy()
            mask.data = np.ones_like(mask.data)
            scores = scores - scores.multiply(mask)
            scores.eliminate_zeros()

        fetch = N + (len(filter_items) if filter_items is not None else 0)
        ids, out = _topk_rows_sorted(scores, fetch)
        if filter_items is not None:
            ids, out = _filter_items_from_results(userids, ids, out, filter_items, N)
        return ids[:, :N], out[:, :N]

    def _recommend_restricted(self, user_items, N, filter_already_liked_items, items):
        """Scalar ``items=`` ranking: score, restrict, pad absentees."""
        if items.max() >= self.similarity.shape[0] or items.min() < 0:
            raise IndexError("Some of selected itemids are not in the model")

        ids, scores = self.scorer.recommend(
            user_items.indptr,
            user_items.indices,
            user_items.data,
            K=self.similarity.shape[0],
            remove_own_likes=filter_already_liked_items,
        )
        ids, scores = _restrict_to(ids, scores, items)
        return ids, scores

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
            ids, scores = _restrict_to(ids, scores, np.asarray(items))

        order = np.argsort(scores)[::-1][:N]
        return ids[order], scores[order]

    similar_items.__doc__ = RecommenderBase.similar_items.__doc__

    def similar_users(self, userid, N=10, filter_users=None, users=None):
        raise NotImplementedError("similar_users isn't implemented for item-item recommenders")

    # -- persistence --------------------------------------------------------

    def __getstate__(self):
        state = self.__dict__.copy()
        del state["scorer"]  # holds no state beyond the similarity matrix
        # a live Mesh isn't picklable: degrade to its device count (restores
        # as an equivalent local 1-D mesh) — same contract as the MF models
        mesh = state.get("mesh")
        if mesh is not None and not isinstance(mesh, int):
            state["mesh"] = int(np.prod(list(mesh.shape.values())))
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.__dict__.setdefault("mesh", None)  # pickles from older versions
        self.scorer = (
            NearestNeighboursScorer(self.similarity) if self.similarity is not None else None
        )

    def _save_args(self):
        """Hyperparameters persisted alongside the similarity matrix.

        Subclasses with extra fit-relevant hyperparameters (e.g. EASE's
        regularization) extend this; ``load`` restores every non-matrix key
        generically, so overriding this one hook is the whole persistence
        contract.
        """
        return {"K": self.K}

    def save(self, fileobj_or_path):
        args = self._save_args()
        if self.similarity is not None:
            args.update(
                shape=self.similarity.shape,
                data=self.similarity.data,
                indptr=self.similarity.indptr,
                indices=self.similarity.indices,
            )
        np.savez(fileobj_or_path, **args)

    _MATRIX_KEYS = ("shape", "data", "indptr", "indices")

    @classmethod
    def load(cls, fileobj_or_path):
        if isinstance(fileobj_or_path, str) and not fileobj_or_path.endswith(".npz"):
            fileobj_or_path = fileobj_or_path + ".npz"

        with np.load(fileobj_or_path, allow_pickle=False) as data:
            ret = cls()
            for key in data.files:
                if key in cls._MATRIX_KEYS:
                    continue
                val = data[key]
                setattr(ret, key, val.item() if val.ndim == 0 else val)
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

    def __init__(self, K=20, K1=1.2, B=0.75, num_threads=0, mesh=None):
        super().__init__(K, num_threads, mesh=mesh)
        self.K1 = K1
        self.B = B

    def _save_args(self):
        # K1/B are fit-relevant: a loaded model's refit must weight the same
        return {**super()._save_args(), "K1": self.K1, "B": self.B}

    def _weighted(self, counts):
        return bm25_weight(counts.T, self.K1, self.B).T
