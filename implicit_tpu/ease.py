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


def _ease_max_items(n_shards=None):
    """Catalog cap. The plain solve (``n_shards=None``) holds 3 (items²)
    buffers; a mesh chip holds the replicated gramian + factorization plus
    1/D-sized column and row blocks, ~(2 + 3/D) items² — a √(3/(2+3/D))
    scaling that RAISES the cap for D ≥ 3 and LOWERS it for a 1-2 chip
    mesh, whose per-chip footprint exceeds the plain solve's (the mesh's
    real win is dividing the O(items³) inverse flops by D)."""
    if n_shards is None:
        return _EASE_MAX_ITEMS
    return int(_EASE_MAX_ITEMS * np.sqrt(3.0 / (2.0 + 3.0 / n_shards)))


def _resolve_ease_mesh(mesh):
    """Resolves the ``mesh=`` kwarg and degrades a size-1 mesh to the plain
    solve: one chip gains nothing from the sharded formulation but PAYS its
    higher per-chip footprint (2 + 3/D items² buffers vs 3), which would
    LOWER the catalog cap below the plain solve's."""
    from .nearest_neighbours import _resolve_mesh

    mesh = _resolve_mesh(mesh)
    if mesh is not None and mesh.size <= 1:
        return None
    return mesh


def _check_ease_cap(items, mesh):
    """Refuses catalogs whose dense solve can't fit HBM (one place: the
    plain and meshed fit entry points must agree on the cap model)."""
    cap = _ease_max_items(mesh.size if mesh is not None else None)
    if items > cap:
        where = "the mesh chips'" if mesh is not None else "one chip's"
        raise ValueError(
            f"EASE inverts a dense {items}^2 matrix on device; catalogs over "
            f"{cap} items don't fit {where} HBM. Restrict the catalog (items "
            "with interactions) or use the KNN/ALS families."
        )


def _ease_B_meshed(user_items, regularization, mesh, serve_diag=False):
    """Sharded closed-form EASE solve: each chip back-solves its own columns.

    The gramian arrives row-sharded from
    :func:`~implicit_tpu.nearest_neighbours._dense_gramian_meshed` (its
    build flops already divided by the mesh size). Each chip then
    all-gathers ``S`` once (items² bytes over ICI), Cholesky-factorizes the
    regularized matrix redundantly (O(items³/3) — small next to the
    inverse), and back-solves only its own block of identity columns, so
    the O(items³) inverse divides by the mesh size. ``P``'s symmetry turns
    the chip's column block of ``P`` into its row block of ``B``, which
    stays row-sharded for top-K sparsification; the only other collective
    is an all-gather of diag(P) (items floats).

    Returns the (D·block, items) row-sharded ``B`` (rows ≥ items are
    padding). With ``serve_diag`` the diagonal is set to the serving
    self-affinity (strictly above the row max) instead of the EASE zero.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .nearest_neighbours import _dense_gramian_meshed

    items = user_items.shape[1]
    axis = mesh.axis_names[0]

    S, block = _dense_gramian_meshed(user_items, mesh)

    def solve(S_loc, lam):
        S_full = jax.lax.all_gather(S_loc, axis, tiled=True)[:items]
        A = S_full + lam * jnp.eye(items, dtype=jnp.float32)
        c, low = jax.scipy.linalg.cho_factor(A)
        j = jax.lax.axis_index(axis) * block + jnp.arange(block)
        jc = jnp.minimum(j, items - 1)  # clamp padding rows (dropped later)
        eye_blk = (jnp.arange(items)[:, None] == j[None, :]).astype(jnp.float32)
        P_cols = jax.scipy.linalg.cho_solve((c, low), eye_blk)  # (items, block)
        arange_blk = jnp.arange(block)
        diag_loc = jnp.where(j < items, P_cols[jc, arange_blk], 1.0)
        diag = jax.lax.all_gather(diag_loc, axis, tiled=True)[:items]
        # P is symmetric (inverse of SPD): the chip's P columns ARE its B rows
        B_loc = -P_cols.T / diag[None, :]
        B_loc = B_loc.at[arange_blk, jc].set(0.0)
        if serve_diag:
            # serving parity with the KNN family (see EASERecommender.fit)
            B_loc = B_loc.at[arange_blk, jc].set(
                jnp.maximum(jnp.max(B_loc, axis=1), 0.0) + 1.0
            )
        return B_loc

    from .nearest_neighbours import _meshed_program

    key = ("ease", mesh, block, items, serve_diag)
    run = _meshed_program(key, lambda: jax.jit(
        shard_map(
            solve, mesh=mesh,
            in_specs=(P(axis, None), P()), out_specs=P(axis, None),
            check_vma=False,
        )
    ))
    return run(S, jnp.float32(regularization))


def ease_weights(user_items, regularization=250.0, mesh=None):
    """Returns the dense EASE weight matrix ``B`` as a device array.

    ``B[j, v]`` is liked-item ``j``'s contribution to candidate ``v``'s
    score; rows of ``B`` are the item-item "similarity" in the serving
    formulation ``scores = user_likes @ B``. ``diag(B)`` is zero (the EASE
    constraint). ``mesh`` (a jax Mesh or device count) runs the gramian
    build and the O(items³) inverse sharded over the chips.
    """
    import jax
    import jax.numpy as jnp

    from .nearest_neighbours import _dense_gramian_device

    user_items = check_csr(user_items)
    items = user_items.shape[1]
    mesh = _resolve_ease_mesh(mesh)
    _check_ease_cap(items, mesh)

    if mesh is not None:
        return _ease_B_meshed(user_items, regularization, mesh)[:items]

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
    mesh : jax.sharding.Mesh or int, optional
        Fit multi-chip: the gramian build and the O(items³) inverse shard
        over the mesh (each chip back-solves its own identity columns),
        dividing the dominant flops by the mesh size.
    """

    def __init__(
        self, K=100, regularization=250.0, binarize=True, num_threads=0, mesh=None
    ):
        super().__init__(K=K, num_threads=num_threads, mesh=mesh)
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

        items = user_items.shape[1]

        from .nearest_neighbours import (
            _dense_topk_to_coo,
            _dense_topk_to_coo_meshed,
        )

        mesh = _resolve_ease_mesh(self.mesh)
        if mesh is not None:
            _check_ease_cap(items, mesh)
            # diagonal handling (serve_diag) and top-K both run inside the
            # row shards; negatives are meaningful in EASE, keep them all
            B = _ease_B_meshed(user_items, self.regularization, mesh,
                               serve_diag=True)
            self.similarity = sp.csr_matrix(
                _dense_topk_to_coo_meshed(B, items, int(self.K), mesh,
                                          keep="nonzero"))
            self.scorer = NearestNeighboursScorer(self.similarity)
            return

        B = ease_weights(user_items, self.regularization)

        # serving parity with the KNN family: the stored similarity's
        # diagonal is the item's self-affinity (strictly above its row max,
        # so similar_items ranks the item itself first). It only affects
        # already-liked candidates, which recommend() filters by default —
        # the EASE objective's diag(B)=0 is untouched for everything else.
        idx = jnp.arange(items)
        B = B.at[idx, idx].set(jnp.maximum(jnp.max(B, axis=1), 0.0) + 1.0)

        # negatives are meaningful in EASE: keep everything the top-K selects
        self.similarity = sp.csr_matrix(
            _dense_topk_to_coo(B, int(self.K), keep="nonzero"))
        self.scorer = NearestNeighboursScorer(self.similarity)

    def _save_args(self):
        # save/load themselves are inherited: the base load restores every
        # non-matrix key generically
        return {
            "K": self.K,
            "regularization": self.regularization,
            "binarize": self.binarize,
        }
