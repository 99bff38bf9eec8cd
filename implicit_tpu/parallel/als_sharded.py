"""Row-sharded multi-chip ALS: each chip owns a slice of the factor rows.

The first multi-chip ALS layout (mesh.shard_buckets) sharded every chunk's
row axis and kept both factor matrices replicated, letting GSPMD insert the
collectives. That is correct but boxed out the Pallas solver kernels
(``pallas_call`` has no SPMD partitioning rule) and paid a psum of scattered
factor updates per class.

This layout shards the *solved side's rows* instead. Rows are dealt to chips
round-robin (row ``u`` lives on chip ``u % D`` at local index ``u // D`` —
strided assignment keeps the per-chip length distribution statistically
identical, so power-law catalogs stay load-balanced), and each half-iteration
under ``shard_map`` is then *fully local*: every chip solves only its own
rows and scatters into its own factor shard. The only communication is ONE
tiled all-gather of the opposite side's factor shard per half-iteration
(~U*F*4 bytes over ICI — milliseconds), after which the gathered table is an
ordinary local array, so every single-device solver formulation runs
unchanged inside the shard. This is the standard TPU recipe (shard the
updated state, all-gather the read-only operand) rather than a translation of
the reference's single-GPU design (/root/reference/implicit/gpu/als.cu:169,
"TODO: multi-gpu support").

On TPU the solve runs the same Pallas tile kernels as the single-device
path — measured at mesh=1 they are penalty-free inside shard_map (0.2751
s/iter vs 0.2750 outside, last.fm shape f=128 bf16,
benchmarks/round4_shardmap_probe.py), so a multi-chip mesh scales the FAST
formulation. The einsum formulation (0.371 s/iter, also layout-overhead-
free) remains as the off-TPU / f64 / ``use_pallas=False`` path.

Because the gathered table is laid out in shard order, class ``indices`` are
stored *pre-permuted* (global column id ``i`` -> ``(i % D) * block + i // D``)
at build time, so the device never pays a remap.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.als import _loss_chunk_terms, _solve_side_core


def _block(n_rows, D):
    """Rows per chip (ceil), at least 1 so every shard is non-empty."""
    return max(1, -(-n_rows // D))


def permute_rows(x, D, block):
    """Host factor matrix -> shard-order layout, zero-padded to D*block."""
    x = np.asarray(x)
    n = x.shape[0]
    out = np.zeros((D * block,) + x.shape[1:], dtype=x.dtype)
    u = np.arange(n)
    out[(u % D) * block + u // D] = x
    return out


def unpermute_rows(xp, D, block, n_rows):
    """Shard-order device layout -> canonical host row order."""
    u = np.arange(n_rows)
    return np.asarray(xp)[(u % D) * block + u // D]


class _ShardedClass:
    __slots__ = ("L", "C", "n_chunks", "rows", "indices", "data")

    def __init__(self, L, rows, indices, data):
        self.L = L
        _, self.n_chunks, self.C = rows.shape
        self.rows = rows          # (D, n, C) local row ids, sentinel = block
        self.indices = indices    # (D, n, C, L) pre-permuted column ids
        self.data = data          # (D, n, C, L)


@functools.lru_cache(maxsize=None)
def _build_sharded_pack(mesh, axis_name, n_classes, Ls, D, col_block):
    """Compiled per-chip packing program (cached per mesh/class structure).

    Each chip gathers its padded class tensors out of its own flat CSR
    slice — the sharded twin of sparse._get_pack_all — and applies the
    shard-order column permutation on device, so only the raw flats
    (~nnz*8 bytes total, sharded) cross the host->device transport instead
    of the fully padded class tensors.
    """
    from jax import shard_map

    a = axis_name
    cls_spec = (P(a, None, None), P(a, None, None))

    def run(flat_idx, flat_dat, indptr, rows_lens):
        flat_idx, flat_dat, indptr = flat_idx[0], flat_dat[0], indptr[0]
        out = []
        for (rows, lens), L in zip(rows_lens, Ls):
            _, n_chunks, C = rows.shape
            r = rows[0].reshape(-1)
            # sentinel rows (r == block) hit indptr's last entry and mask
            # out through lens == 0 (same trick as the single-device pack)
            starts = indptr[jnp.minimum(r, indptr.shape[0] - 1)]
            pos = starts[:, None] + jnp.arange(L, dtype=starts.dtype)[None, :]
            valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lens[0].reshape(-1, 1)
            pos = jnp.where(valid, pos, 0)
            gi = flat_idx[pos]
            # pre-permute column ids into the gathered table's shard order
            gi = (gi % D) * col_block + gi // D
            idx = jnp.where(valid, gi, 0)
            dat = jnp.where(valid, flat_dat[pos], jnp.zeros((), flat_dat.dtype))
            out.append((idx.reshape(1, n_chunks, C, L),
                        dat.reshape(1, n_chunks, C, L)))
        return tuple(out)

    return jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P(a, None), P(a, None), P(a, None),
                  tuple(cls_spec for _ in range(n_classes))),
        out_specs=tuple((P(a, None, None, None), P(a, None, None, None))
                        for _ in range(n_classes)),
        check_vma=False))


class RowShardedBuckets:
    """One training side, bucketed per chip and sharded over the mesh axis.

    ``classes`` hold LOCAL row ids (sentinel = ``block``, out of local range
    so scatters drop padding) and column indices already mapped into the
    opposite side's shard-order layout. ``empty_rows`` is a (D, max_empty)
    local-id table padded with the sentinel.

    With ``on_device_pack=True`` (default) only the raw CSR flats cross the
    transport, host-reordered into per-chip slices, and the padded class
    tensors are built by a sharded device program — the multi-chip twin of
    sparse.pack_pair_on_device (padded tensors carry up to ~30% padding, and
    the host packer's serial pack_ragged is the other cost it removes).
    Bit-identical to the host-packed builder.
    """

    def __init__(self, csr, mesh, axis_name="d", target_entries=1 << 23,
                 max_chunk_rows=65536, min_L=8, grid="pow2",
                 data_dtype=np.float32, on_device_pack=True):
        from .. import native

        if csr.nnz >= (1 << 31):
            # the device pack's per-chip flat positions are int32; a single
            # chip's slice must stay addressable (total can exceed 2^31
            # only if no chip's share does — conservatively fall back)
            on_device_pack = False

        D = mesh.shape[axis_name]
        n_rows, n_cols = csr.shape
        self.shape = csr.shape
        self.n_rows = n_rows
        self.nnz = csr.nnz
        self.D = D
        self.block = _block(n_rows, D)
        self.col_block = _block(n_cols, D)

        row_shd = NamedSharding(mesh, P(axis_name, None, None))
        ent_shd = NamedSharding(mesh, P(axis_name, None, None, None))

        indptr = np.asarray(csr.indptr)
        nnz_per_row = np.diff(indptr).astype(np.int64)
        csr_indices = np.asarray(csr.indices, dtype=np.int32)
        csr_data = np.asarray(csr.data, dtype=np.dtype(data_dtype))

        # empty rows, per owning chip, as a padded local-id table
        empties = np.where(nnz_per_row == 0)[0]
        per_chip = [empties[empties % D == k] // D for k in range(D)]
        max_e = max((len(e) for e in per_chip), default=0)
        if max_e:
            table = np.full((D, max_e), self.block, dtype=np.int32)
            for k, e in enumerate(per_chip):
                table[k, : len(e)] = e
            self.empty_rows = jax.device_put(
                table, NamedSharding(mesh, P(axis_name, None)))
        else:
            self.empty_rows = None

        # length class per row — the shared bucketing grid (sparse.py)
        from ..sparse import chunk_pieces, length_class_grid

        nonempty = np.where(nnz_per_row > 0)[0]
        self.classes = []
        if len(nonempty) == 0:
            return
        L_per_row = length_class_grid(nnz_per_row[nonempty], min_L, grid)

        piece_meta = []  # on-device-pack plan: (L, n_chunks, C, rows, lens)
        for L in np.unique(L_per_row):
            L = int(L)
            in_class = nonempty[L_per_row == L]
            sels = []
            for k in range(D):
                sel = in_class[in_class % D == k]
                # order by the first column's position IN THE GATHERED
                # (shard-order) table — consecutive chunk rows then gather
                # nearby factor rows, the host packer's locality trick;
                # sorting by the raw global id would interleave D distant
                # shard blocks instead
                first = csr_indices[indptr[sel]].astype(np.int64)
                key = (first % D) * self.col_block + first // D
                sel = sel[np.argsort(key, kind="stable")]
                sels.append(sel)
            count = max(len(s) for s in sels)
            packed = None
            if not on_device_pack:
                packed = []
                for sel in sels:
                    if len(sel):
                        pi, pd = native.pack_ragged(
                            indptr, csr_indices, csr_data, sel.astype(np.int32),
                            L, dtype=csr_data.dtype)
                        # pre-permute column ids into the gathered table's
                        # shard order; padding (id 0, data 0) stays in range
                        pi = (pi % D) * self.col_block + pi // D
                    else:
                        pi = pd = None
                    packed.append((pi, pd))

            # shared chunk layout incl. the tightly-sized remainder piece
            # (chips share the chunk structure: shorter chips pad with the
            # sentinel within each piece)
            for start, stop, n_chunks, C in chunk_pieces(
                    count, L, target_entries, max_chunk_rows):
                padded = n_chunks * C
                rows = np.full((D, padded), self.block, dtype=np.int32)
                lens = np.zeros((D, padded), dtype=np.int32)
                for k, sel in enumerate(sels):
                    here = max(0, min(stop, len(sel)) - start)
                    if not here:
                        continue
                    rows[k, :here] = (sel[start : start + here] // D).astype(np.int32)
                    lens[k, :here] = nnz_per_row[sel[start : start + here]]
                if on_device_pack:
                    piece_meta.append((L, n_chunks, C, rows, lens))
                    continue
                idx = np.zeros((D, padded, L), dtype=np.int32)
                dat = np.zeros((D, padded, L), dtype=csr_data.dtype)
                for k, (sel, (pi, pd)) in enumerate(zip(sels, packed)):
                    here = max(0, min(stop, len(sel)) - start)
                    if not here:
                        continue
                    idx[k, :here] = pi[start : start + here]
                    dat[k, :here] = pd[start : start + here]
                self.classes.append(_ShardedClass(
                    L,
                    jax.device_put(rows.reshape(D, n_chunks, C), row_shd),
                    jax.device_put(idx.reshape(D, n_chunks, C, L), ent_shd),
                    jax.device_put(dat.reshape(D, n_chunks, C, L), ent_shd),
                ))

        if on_device_pack and piece_meta:
            # ONE sharded upload of the raw flats, reordered per owning chip
            # (stable grouping by row residue keeps each chip's rows in
            # ascending order = its local CSR), then the device builds every
            # padded class tensor in one compiled sharded program
            owner = np.repeat(
                (np.arange(n_rows, dtype=np.int64) % D).astype(np.int32),
                nnz_per_row)
            order = np.argsort(owner, kind="stable")
            sorted_idx = csr_indices[order]
            sorted_dat = csr_data[order]
            nnz_chip = np.bincount(owner, minlength=D).astype(np.int64)
            max_nnz = max(int(nnz_chip.max()), 1)
            flat_idx = np.zeros((D, max_nnz), dtype=np.int32)
            flat_dat = np.zeros((D, max_nnz), dtype=csr_data.dtype)
            local_ip = np.zeros((D, self.block + 1), dtype=np.int32)
            off = 0
            for k in range(D):
                c = int(nnz_chip[k])
                flat_idx[k, :c] = sorted_idx[off : off + c]
                flat_dat[k, :c] = sorted_dat[off : off + c]
                off += c
                counts = nnz_per_row[k::D]
                local_ip[k, 1 : 1 + len(counts)] = np.cumsum(counts)
                local_ip[k, 1 + len(counts) :] = local_ip[k, len(counts)]

            flat_shd = NamedSharding(mesh, P(axis_name, None))
            d_idx = jax.device_put(flat_idx, flat_shd)
            d_dat = jax.device_put(flat_dat, flat_shd)
            d_ip = jax.device_put(local_ip, flat_shd)
            rows_devs = [
                jax.device_put(rows.reshape(D, n, C), row_shd)
                for (_, n, C, rows, _) in piece_meta
            ]
            lens_devs = [
                jax.device_put(lens.reshape(D, n, C), row_shd)
                for (_, n, C, _, lens) in piece_meta
            ]
            pack = _build_sharded_pack(
                mesh, axis_name, len(piece_meta),
                tuple(m[0] for m in piece_meta), D, self.col_block)
            packed_out = pack(d_idx, d_dat, d_ip,
                              tuple(zip(rows_devs, lens_devs)))
            for (L, _, _, _, _), rows_dev, (idx_dev, dat_dev) in zip(
                    piece_meta, rows_devs, packed_out):
                self.classes.append(_ShardedClass(L, rows_dev, idx_dev, dat_dev))


def _class_tuples(sharded):
    return tuple((c.rows, c.indices, c.data) for c in sharded.classes)


@functools.lru_cache(maxsize=None)
def _build_step(mesh, axis_name, uspec_key, ispec_key, use_cg,
                cg_steps, compute_dtype, use_pallas, gather_quant=(False, False)):
    """Compiled ONE-iteration shard_map step (cached per mesh / class
    structure / statics). A single-iteration program keeps the compile cost
    independent of the iteration count — ``fit`` enqueues it N times without
    host synchronization, so the per-call dispatch overhead pipelines away.

    ``uspec_key``/``ispec_key`` carry (n_classes, has_empty) so the in_specs
    pytree matches the argument structure exactly.
    """
    from jax import shard_map

    def spec(rank):
        return P(*((axis_name,) + (None,) * (rank - 1)))

    cls = (spec(3), spec(4), spec(4))
    nu, u_empty = uspec_key
    ni, i_empty = ispec_key
    in_specs = (
        spec(2), spec(2),
        tuple(cls for _ in range(nu)),
        spec(2) if u_empty else None,
        tuple(cls for _ in range(ni)),
        spec(2) if i_empty else None,
        P(),
    )

    cd = jnp.dtype(compute_dtype)

    def run(X, Y, uclasses, uempty, iclasses, iempty, reg):
        sq = lambda t: tuple((r[0], i[0], d[0]) for r, i, d in t)  # noqa: E731
        uc, ic = sq(uclasses), sq(iclasses)
        ue = None if uempty is None else uempty[0]
        ie = None if iempty is None else iempty[0]

        def gather_side(side, quant):
            """(compute-dtype gathered table, f32 regularized gramian).

            The gramian is a psum of per-chip local gramians — exactly the
            full-table gramian up to f32 summation order — so the big
            all-gather can move the table in the compute dtype directly
            (half the ICI bytes in 16-bit modes) instead of f32. With
            ``quant`` the shard quantizes its own rows first (per-row int8,
            identical to quantizing the gathered table — scales are
            row-local) and the all-gather moves int8 + scales: half the ICI
            bytes again, and the gathered table lands under the VMEM
            promotion boundary at twice the row count (ops.als NOTE).
            """
            local = jnp.dot(side.T, side,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            gram = jax.lax.psum(local, axis_name) + reg * jnp.eye(
                side.shape[1], dtype=jnp.float32)
            if quant:
                from ..ops.als import _quantize_table

                q, s = _quantize_table(side, compute_dtype)
                table = (
                    jax.lax.all_gather(q, axis_name, axis=0, tiled=True),
                    jax.lax.all_gather(s, axis_name, axis=0, tiled=True),
                )
            else:
                table = jax.lax.all_gather(side.astype(cd), axis_name, axis=0,
                                           tiled=True)
            return table, gram

        Yf, YtY = gather_side(Y, gather_quant[0])
        X = _solve_side_core(X, Yf, YtY, uc, ue, use_cg, cg_steps,
                             compute_dtype, use_pallas)
        Xf, XtX = gather_side(X, gather_quant[1])
        Y = _solve_side_core(Y, Xf, XtX, ic, ie, use_cg, cg_steps,
                             compute_dtype, use_pallas)
        return X, Y

    return jax.jit(
        shard_map(run, mesh=mesh, in_specs=in_specs,
                  out_specs=(spec(2), spec(2)), check_vma=False),
        donate_argnums=(0, 1),
    )


def fit(X, Y, user_sh, item_sh, mesh, reg, iterations, axis_name="d",
        use_cg=True, cg_steps=3, compute_dtype="float32", use_pallas=None,
        gather_quant=False):
    """``iterations`` full ALS iterations over the row-sharded layout.

    X/Y are shard-order factor matrices (permute_rows) placed with
    P(axis, None); returns updated arrays in the same layout/placement.
    All iterations are enqueued asynchronously (one compiled step, no host
    round-trip between them).
    """
    # Same default policy as the single-device path (ops.als.solve_side):
    # the Mosaic tile kernels run at FULL speed inside shard_map — measured
    # v5e, last.fm shape, f=128 bf16, mesh=1, device-resident donated
    # chains: shard_map Pallas 0.2751 s/iter == no-mesh Pallas 0.2750, vs
    # einsum 0.371 both inside and out (benchmarks/round4_shardmap_probe.py).
    # The round-3 "2.5x Mosaic-inside-shard_map penalty" (0.738 s/iter) was
    # a measurement artifact: the timed region re-uploaded factor tables
    # after each donated fit consumed them, and the einsum cell happened to
    # overlap uploads better. f64 falls back (kernels are f32/bf16-only).
    if jnp.dtype(compute_dtype) == jnp.float64:
        use_pallas = False
    elif use_pallas is None:
        from ..ops.als import PALLAS_IN_FIT, _on_tpu

        use_pallas = PALLAS_IN_FIT and _on_tpu(X)
    if not isinstance(gather_quant, (tuple, list)):
        gather_quant = (gather_quant, gather_quant)
    step = _build_step(
        mesh, axis_name,
        (len(user_sh.classes), user_sh.empty_rows is not None),
        (len(item_sh.classes), item_sh.empty_rows is not None),
        use_cg, cg_steps, jnp.dtype(compute_dtype).name,
        use_pallas, tuple(bool(g) for g in gather_quant),
    )
    uc, ue = _class_tuples(user_sh), user_sh.empty_rows
    ic, ie = _class_tuples(item_sh), item_sh.empty_rows
    reg = jnp.float32(reg)
    for _ in range(iterations):
        X, Y = step(X, Y, uc, ue, ic, ie, reg)
    return X, Y


@functools.lru_cache(maxsize=None)
def _build_loss(mesh, axis_name, n_classes):
    from jax import shard_map

    def spec(rank):
        return P(*((axis_name,) + (None,) * (rank - 1)))

    cls = (spec(3), spec(4), spec(4))

    def run(X, Y, classes):
        Yf = jax.lax.all_gather(Y, axis_name, axis=0, tiled=True)
        YtY = jnp.dot(Yf.T, Yf, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        loss = jnp.float32(0.0)
        conf = jnp.float32(0.0)
        for rows, idx, dat in classes:
            # per-chunk partials; device f32 sum (depth = n_chunks, small)
            l, c = _loss_chunk_terms(X, Yf, YtY, rows[0], idx[0], dat[0])
            loss, conf = loss + jnp.sum(l), conf + jnp.sum(c)
        return (jax.lax.psum(loss, axis_name)[None],
                jax.lax.psum(conf, axis_name)[None])

    return jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(spec(2), spec(2), tuple(cls for _ in range(n_classes))),
        out_specs=(P(), P()), check_vma=False))


def calculate_loss(user_sh, X, Y, reg, mesh, axis_name="d"):
    """Confidence-weighted MSE over the row-sharded layout (loss parity with
    ops.als.calculate_loss_bucketed)."""
    loss_fn = _build_loss(mesh, axis_name, len(user_sh.classes))
    loss, conf = loss_fn(X, Y, _class_tuples(user_sh))
    loss, conf = float(loss[0]), float(conf[0])
    loss += conf
    loss += float(reg) * (float(jnp.sum(X * X)) + float(jnp.sum(Y * Y)))
    users, items = user_sh.shape
    return loss / (conf + users * items - user_sh.nnz)
