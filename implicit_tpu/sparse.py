"""Bucketed, padded CSR tensors — the sparse substrate of the TPU build.

The reference implementation iterates ragged CSR rows with per-thread scalar
loops (/root/reference/implicit/cpu/_als.pyx:96-142). On TPU that shape of
computation is hostile to both XLA (dynamic trip counts) and the MXU (scalar
dots). Instead we re-pack the matrix once, on the host, into a small number of
*fixed-shape* dense tensors:

- rows are grouped into power-of-two length classes ``L`` (>= 8) by their nnz;
- each class is split into chunks of ``C`` rows (C chosen so C*L is roughly
  constant, bounding the working-set of a gathered factor block);
- a class is stored as stacked arrays ``rows (n, C)``, ``indices (n, C, L)``,
  ``data (n, C, L)`` padded with sentinel row id ``shape[0]`` (out-of-bounds,
  so scatters with mode='drop' ignore padding) and index 0 / value 0.

Every consumer then runs a ``lax.scan`` over the ``n`` chunks of each class:
a handful of compiled programs per dataset, all operating on large static
batched tensors. Padding entries carry confidence 0 and are masked
arithmetically inside the kernels.
"""

import numpy as np


def length_class_grid(nnz_per_row, min_L=8, grid="fine"):
    """Padded length L per row on the shared bucketing grid.

    grid="fine": eighth-power-of-two steps (8, 16, 24, 32, 40, 48, 56, 64,
    80, ...) — every step a multiple of the 8-sublane tile, <=1.17x ratio,
    ~7% average in-row padding. grid="pow2": powers of two only — ~4x fewer
    classes (so ~4x fewer compiled programs), ~30% padding. The single
    source of the grid for BucketedCSR and the row-sharded builder.
    """
    n = np.asarray(nnz_per_row, dtype=np.int64)
    p = (1 << np.ceil(np.log2(np.maximum(n, 1))).astype(np.int64))
    L_per_row = np.maximum(min_L, p)
    if grid != "pow2":
        for eighths in (7, 6, 5):
            cand = (eighths * p) // 8
            ok = (n <= cand) & (cand % 8 == 0) & (cand >= min_L)
            L_per_row = np.where(ok, cand, L_per_row)
    return L_per_row


def als_chunk_target(factors, compute_dtype="float32", block_bytes=4 << 30):
    """The ALS fit's target_entries policy for a factor width.

    Bounds the (C, L, F) gathered factor block a solver materializes to
    ``block_bytes`` of HBM. Within the bound, bigger chunks are faster at
    F<=128 (fewer serialized scan steps: 16M entries measured 7% faster
    than 2M at f=128 bf16, monotone through the sweep); the bound itself
    matters at wide F, where an over-sized block defeats double-buffering
    (see benchmarks/round5_chunk_sweep.py). One shared definition so the
    model fit and bench.py measure the same configuration.
    """
    import numpy as np

    itemsize = 2 if str(compute_dtype) in ("bfloat16", "float16") else 4
    return int(np.clip(block_bytes // (int(factors) * itemsize),
                       1 << 21, 1 << 24))


def chunk_pieces(count, L, target_entries, max_chunk_rows):
    """[(start, stop, n_chunks, C)] chunk layout for ``count`` rows of
    padded length L. C stays a multiple of the 8-row sublane tile; a
    partially-filled final chunk becomes its own tightly-sized piece, since
    sentinel padding rows still cost full gather/kernel work."""
    C = max(8, (min(max_chunk_rows, target_entries // L) // 8) * 8)
    full_chunks = count // C
    remainder = count - full_chunks * C
    pieces = []
    if full_chunks:
        pieces.append((0, full_chunks * C, full_chunks, C))
    if remainder:
        pieces.append((full_chunks * C, count, 1, max(8, -(-remainder // 8) * 8)))
    return pieces


class BucketClass:
    """All rows whose nnz fits one padded length L, stacked into chunks."""

    __slots__ = ("L", "C", "n_chunks", "rows", "indices", "data", "lengths")

    def __init__(self, L, C, rows, indices, data, lengths):
        self.L = L
        self.C = C
        self.n_chunks = rows.shape[0]
        self.rows = rows  # (n, C) int32, padded with sentinel (= n_rows)
        self.indices = indices  # (n, C, L) int32, padded with 0
        self.data = data  # (n, C, L) float32, padded with 0
        self.lengths = lengths  # (n, C) int32 actual nnz per row


class BucketedCSR:
    """Host-side bucketed representation of a scipy CSR matrix.

    Parameters
    ----------
    csr : scipy.sparse.csr_matrix
    target_entries : int
        Rough upper bound on C*L per chunk; with factor dimension f the
        gathered block a solver materializes is ~ target_entries * f floats
        (8M entries * f=128 bf16 = 2GB). Bigger chunks mean fewer serialized
        scan steps: 8M entries measured ~3% faster than 2M for the ALS fit
        at last.fm-360k scale.
    max_chunk_rows : int
        Upper bound on rows per chunk.
    """

    def __init__(self, csr, target_entries=1 << 23, max_chunk_rows=32768, min_L=8,
                 data_dtype=np.float32, grid="fine", metadata_only=False):
        n_rows = csr.shape[0]
        self.data_dtype = np.dtype(data_dtype)
        self.shape = csr.shape
        self.n_rows = n_rows
        self.nnz = csr.nnz
        self.sentinel = n_rows

        indptr = np.asarray(csr.indptr)
        nnz_per_row = np.diff(indptr).astype(np.int64)
        self.empty_rows = np.where(nnz_per_row == 0)[0].astype(np.int32)

        csr_indices = np.asarray(csr.indices, dtype=np.int32)
        csr_data = np.asarray(csr.data, dtype=self.data_dtype)

        nonempty = np.where(nnz_per_row > 0)[0]
        self.classes = []
        if len(nonempty) == 0:
            return

        # length class per row — see length_class_grid for the fine-vs-pow2
        # padding/compile-count trade. "fine" is right for ALS (padding
        # multiplies into the solver flops); "pow2" for the SGD models,
        # whose epochs are far cheaper than their compiles
        L_per_row = length_class_grid(nnz_per_row[nonempty], min_L, grid)

        for L in np.unique(L_per_row):
            L = int(L)
            sel = nonempty[L_per_row == L]
            # order rows by their first column id: consecutive rows then
            # gather nearby factor rows, improving HBM gather locality
            sel = sel[np.argsort(csr_indices[indptr[sel]], kind="stable")]
            lens = nnz_per_row[sel].astype(np.int32)
            count = len(sel)

            # chunk layout (shared helper): C a multiple of the 8-row
            # sublane tile (the Pallas solvers tile rows in groups of 8 and
            # LMF's pools reshape chunks into 8-row groups); remainder rows
            # get their own tightly-sized piece
            pieces = chunk_pieces(count, L, target_entries, max_chunk_rows)

            if not metadata_only:
                # ragged -> padded copy (native C++ packer, numpy fallback
                # inside)
                from . import native

                packed_idx, packed_dat = native.pack_ragged(
                    indptr, csr_indices, csr_data, sel.astype(np.int32), L,
                    dtype=self.data_dtype,
                )

            for start, stop, n_chunks, piece_C in pieces:
                piece_count = stop - start
                padded_rows = n_chunks * piece_C
                rows = np.full(padded_rows, self.sentinel, dtype=np.int32)
                rows[:piece_count] = sel[start:stop]
                lengths = np.zeros(padded_rows, dtype=np.int32)
                lengths[:piece_count] = lens[start:stop]
                if metadata_only:
                    # plan-only: rows/lengths describe the packing; the
                    # padded entry tensors are built on device from one COO
                    # upload (pack_pair_on_device)
                    idx = dat = None
                elif padded_rows > piece_count:
                    idx = np.zeros((padded_rows, L), dtype=np.int32)
                    dat = np.zeros((padded_rows, L), dtype=self.data_dtype)
                    idx[:piece_count] = packed_idx[start:stop]
                    dat[:piece_count] = packed_dat[start:stop]
                else:
                    idx = packed_idx[start:stop]
                    dat = packed_dat[start:stop]

                self.classes.append(
                    BucketClass(
                        L,
                        piece_C,
                        rows.reshape(n_chunks, piece_C),
                        None if idx is None else idx.reshape(n_chunks, piece_C, L),
                        None if dat is None else dat.reshape(n_chunks, piece_C, L),
                        lengths.reshape(n_chunks, piece_C),
                    )
                )

    @property
    def padded_entries(self):
        return sum(c.n_chunks * c.C * c.L for c in self.classes)

    def fill(self, csr):
        """Packs the padded entry tensors into a ``metadata_only`` plan.

        ``csr`` must be the matrix the plan was built from. Lets the
        ingest="auto" cold path reuse the plans it built for the warmth
        check instead of re-running the O(nnz) bucketing from scratch
        (each class piece's ``rows`` already records its row selection).
        """
        from . import native

        indptr = np.asarray(csr.indptr)
        csr_indices = np.asarray(csr.indices, dtype=np.int32)
        csr_data = np.asarray(csr.data, dtype=self.data_dtype)
        for cls in self.classes:
            if cls.indices is not None:
                continue  # already packed
            rows = cls.rows.reshape(-1)
            sel = rows[rows != self.sentinel]
            packed_idx, packed_dat = native.pack_ragged(
                indptr, csr_indices, csr_data, sel, cls.L,
                dtype=self.data_dtype,
            )
            padded_rows = rows.shape[0]
            if padded_rows > len(sel):
                idx = np.zeros((padded_rows, cls.L), dtype=np.int32)
                dat = np.zeros((padded_rows, cls.L), dtype=self.data_dtype)
                idx[: len(sel)] = packed_idx
                dat[: len(sel)] = packed_dat
            else:
                idx, dat = packed_idx, packed_dat
            cls.indices = idx.reshape(cls.n_chunks, cls.C, cls.L)
            cls.data = dat.reshape(cls.n_chunks, cls.C, cls.L)
        return self

    def to_device(self):
        """Uploads the chunk tensors to the default device once.

        Training loops must reuse the returned DeviceBuckets across
        iterations — re-uploading per iteration dominates runtime when the
        device sits behind a network transport.
        """
        return DeviceBuckets(self)


class DeviceBuckets:
    """Device-resident mirror of a BucketedCSR (see BucketedCSR.to_device)."""

    def __init__(self, bucketed):
        import jax.numpy as jnp

        self.shape = bucketed.shape
        self.n_rows = bucketed.n_rows
        self.nnz = bucketed.nnz
        self.sentinel = bucketed.sentinel
        self.empty_rows = (
            jnp.asarray(bucketed.empty_rows) if len(bucketed.empty_rows) else None
        )
        self.classes = [
            DeviceBucketClass(cls) for cls in bucketed.classes
        ]


class DeviceBucketClass:
    __slots__ = ("L", "C", "n_chunks", "rows", "indices", "data", "lengths")

    def __init__(self, cls):
        import jax.numpy as jnp

        self.L = cls.L
        self.C = cls.C
        self.n_chunks = cls.n_chunks
        self.rows = jnp.asarray(cls.rows)
        self.indices = jnp.asarray(cls.indices)
        self.data = jnp.asarray(cls.data)
        self.lengths = jnp.asarray(cls.lengths)


_pack_all_jit = None
_transpose_jit = None


def _get_pack_all():
    """Lazily-built jitted program that packs every class of one side."""
    global _pack_all_jit
    if _pack_all_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("Ls",))
        def _pack_all(flat_idx, flat_dat, indptr, rows_t, lens_t, Ls):
            out = []
            for rows, lens, L in zip(rows_t, lens_t, Ls):
                n_chunks, C = rows.shape
                r = rows.reshape(-1)
                # sentinel rows (r == n_rows) hit indptr's last entry and
                # mask out through lens == 0
                starts = indptr[jnp.minimum(r, indptr.shape[0] - 1)]
                pos = starts[:, None] + jnp.arange(L, dtype=starts.dtype)[None, :]
                valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lens.reshape(-1, 1)
                pos = jnp.where(valid, pos, 0)
                idx = jnp.where(valid, flat_idx[pos], 0)
                dat = jnp.where(valid, flat_dat[pos],
                                jnp.zeros((), flat_dat.dtype))
                out.append((idx.reshape(n_chunks, C, L),
                            dat.reshape(n_chunks, C, L)))
            return tuple(out)

        _pack_all_jit = _pack_all
    return _pack_all_jit


def _get_transpose_flats():
    """Lazily-built jitted derivation of the transposed side's flat arrays."""
    global _transpose_jit
    if _transpose_jit is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _transpose(cols, data, indptr_u):
            nnz = cols.shape[0]
            # COO row ids via cumsum over row-start markers (empty rows
            # stack markers at the same position; trailing empties scatter
            # out of bounds and drop)
            marks = jnp.zeros(nnz, jnp.int32).at[indptr_u[1:-1]].add(
                1, mode="drop")
            rows = jnp.cumsum(marks)
            # stable sort by column: within a column the row-major input
            # keeps rows ascending — exactly the CSR layout of the transpose
            order = jnp.argsort(cols, stable=True)
            return rows[order].astype(jnp.int32), data[order]

        _transpose_jit = _transpose
    return _transpose_jit


def _pack_side(plan, flat_indices, flat_data, indptr_dev):
    """DeviceBuckets for one side from device-resident flat CSR arrays."""
    import jax.numpy as jnp

    rows_t = tuple(jnp.asarray(c.rows) for c in plan.classes)
    lens_t = tuple(jnp.asarray(c.lengths) for c in plan.classes)
    Ls = tuple(c.L for c in plan.classes)
    packed = _get_pack_all()(flat_indices, flat_data, indptr_dev,
                             rows_t, lens_t, Ls)

    buckets = DeviceBuckets.__new__(DeviceBuckets)
    buckets.shape = plan.shape
    buckets.n_rows = plan.n_rows
    buckets.nnz = plan.nnz
    buckets.sentinel = plan.sentinel
    buckets.empty_rows = (
        jnp.asarray(plan.empty_rows) if len(plan.empty_rows) else None
    )
    buckets.classes = []
    for cls, rows_dev, lens_dev, (idx, dat) in zip(plan.classes, rows_t,
                                                   lens_t, packed):
        dev_cls = DeviceBucketClass.__new__(DeviceBucketClass)
        dev_cls.L, dev_cls.C, dev_cls.n_chunks = cls.L, cls.C, cls.n_chunks
        dev_cls.rows, dev_cls.lengths = rows_dev, lens_dev
        dev_cls.indices, dev_cls.data = idx, dat
        buckets.classes.append(dev_cls)
    return buckets


# device-pack warm registry: structure keys whose pack programs are known
# compiled (process-local; mirrored as marker files in the persistent
# compilation cache dir so warmth survives processes)
_device_pack_warm = set()


def _pack_structure_key(plan_u, plan_i):
    import hashlib

    def side(p):
        return (p.shape, p.nnz, p.data_dtype.name,
                tuple((c.L, c.n_chunks, c.C) for c in p.classes))

    return hashlib.sha1(
        repr((side(plan_u), side(plan_i))).encode()).hexdigest()[:16]


def _pack_marker_path(key):
    import os

    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return None
    # the marker mirrors persistent-cache entries whose keys include the
    # jax/XLA version and backend — tag it the same way, so a jax upgrade
    # (which misses the whole cache) also invalidates the warmth claim
    # instead of routing "auto" into a full cold device-pack compile
    tag = f"{jax.__version__}_{jax.default_backend()}"
    return os.path.join(cache_dir, f"implicit_tpu_packwarm_{tag}_{key}")


def _device_pack_is_warm(key):
    import os

    if key in _device_pack_warm:
        return True
    path = _pack_marker_path(key)
    return path is not None and os.path.exists(path)


def _mark_device_pack_warm(key):
    _device_pack_warm.add(key)
    path = _pack_marker_path(key)
    if path is not None:
        try:
            with open(path, "w"):
                pass
        except OSError:
            pass


def warm_device_pack(plan_u, plan_i, key, data_dtype):
    """AOT-compiles the device-pack programs for one structure and records
    the warm marker — subsequent ``mode="auto"`` fits of this structure
    take the low-upload device-pack path at full speed. Compiled
    executables land in the persistent cache, so warmth survives the
    process. Synchronous by design: a background-timer variant measured
    WORSE than no warming at all (294s vs 192s cold fit — its compile
    requests contend with the fit's own through the compile service)."""
    import jax

    nnz = plan_u.nnz
    flat_i = jax.ShapeDtypeStruct((nnz,), np.int32)
    flat_d = jax.ShapeDtypeStruct((nnz,), np.dtype(data_dtype))
    ip_u = jax.ShapeDtypeStruct((plan_u.n_rows + 1,), np.int32)
    ip_i = jax.ShapeDtypeStruct((plan_i.n_rows + 1,), np.int32)
    _get_transpose_flats().lower(flat_i, flat_d, ip_u).compile()
    for plan, ip in ((plan_u, ip_u), (plan_i, ip_i)):
        rows_t = tuple(jax.ShapeDtypeStruct(c.rows.shape, np.int32)
                       for c in plan.classes)
        lens_t = tuple(jax.ShapeDtypeStruct(c.lengths.shape, np.int32)
                       for c in plan.classes)
        Ls = tuple(c.L for c in plan.classes)
        _get_pack_all().lower(flat_i, flat_d, ip, rows_t, lens_t, Ls).compile()
    _mark_device_pack_warm(key)


def pack_pair_on_device(Cui, Ciu, target_entries=1 << 23, max_chunk_rows=32768,
                        grid="fine", data_dtype=np.float32, mode="auto"):
    """Both training sides from ONE raw-array upload + on-device packing.

    The padded (n_chunks, C, L) class tensors carry up to ~30% padding and
    were previously host-packed and uploaded per side (~2 * padded_entries
    * 8 bytes through the transport — the dominant wall-time cost of
    large-scale fits behind a slow link). Instead this uploads only the
    user side's raw ``indices``/``data`` (+ two indptr vectors), derives
    the item side's flat arrays on device (COO row ids by cumsum, a stable
    argsort by column — the same trick as the device KNN fit,
    nearest_neighbours.py), and builds every padded class tensor with
    gathers inside one jitted program per side. Output is numerically
    identical to ``BucketedCSR(...).to_device()`` for both sides.

    ``mode`` routes by compile warmth (the round-4 cold-fit fix): the
    device pack costs 4 extra compiled programs, each a compile-service
    round trip on a cold cache — measured 192s vs 48s END-TO-END cold fit
    at last.fm shape. ``"auto"`` host-packs unless the pack programs for
    this structure are known compiled (marker file in the persistent
    compile cache dir, written by any ``"device"`` run or by
    :func:`warm_device_pack`); ``"device"``/``"host"`` force a path.
    NOTE "auto" never compiles the pack programs itself — warmth only ever
    comes from a ``"device"`` run or an explicit :func:`warm_device_pack`
    call, so auto-only pipelines host-pack indefinitely (by design: paying
    the compile inside an auto fit is exactly the cold-fit wall this mode
    exists to avoid). Ingestion-bound production pipelines (repeated huge
    uploads behind a slow link) should run with ``ingest="device"`` on the
    model — the measured steady-state win is 2.06x ingestion wall at MSD
    scale.

    ``Ciu`` must be ``Cui.T.tocsr()`` (callers already have it — only its
    host metadata is read; its arrays are NOT uploaded).
    """
    import jax.numpy as jnp

    def host_pack():
        return (BucketedCSR(Cui, target_entries=target_entries,
                            max_chunk_rows=max_chunk_rows, grid=grid,
                            data_dtype=data_dtype).to_device(),
                BucketedCSR(Ciu, target_entries=target_entries,
                            max_chunk_rows=max_chunk_rows, grid=grid,
                            data_dtype=data_dtype).to_device())

    if mode not in ("auto", "host", "device"):
        # an unrecognized string would otherwise fall through to the forced
        # device pack — on a cold cache that is the 192s-vs-48s wall the
        # mode knob exists to avoid
        raise ValueError(f"mode must be 'auto', 'host' or 'device', got {mode!r}")

    if mode == "host":
        return host_pack()

    if Cui.nnz >= (1 << 31):
        # the device pack addresses flat positions in int32; fall back to
        # the host packer (which is int64 throughout) instead of wrapping
        return host_pack()

    plan_u = BucketedCSR(Cui, target_entries=target_entries,
                         max_chunk_rows=max_chunk_rows, grid=grid,
                         data_dtype=data_dtype, metadata_only=True)
    plan_i = BucketedCSR(Ciu, target_entries=target_entries,
                         max_chunk_rows=max_chunk_rows, grid=grid,
                         data_dtype=data_dtype, metadata_only=True)
    if Cui.nnz == 0:
        return plan_u.to_device(), plan_i.to_device()

    key = _pack_structure_key(plan_u, plan_i)
    if mode == "auto" and not _device_pack_is_warm(key):
        # reuse the plans built for the warmth check: fill() packs the
        # entry tensors into them without re-running the O(nnz) bucketing
        return plan_u.fill(Cui).to_device(), plan_i.fill(Ciu).to_device()

    cols = jnp.asarray(np.asarray(Cui.indices, dtype=np.int32))
    data = jnp.asarray(np.asarray(Cui.data, dtype=data_dtype))
    indptr_u = jnp.asarray(np.asarray(Cui.indptr, dtype=np.int32))
    indptr_i = jnp.asarray(np.asarray(Ciu.indptr, dtype=np.int32))

    item_cols, item_data = _get_transpose_flats()(cols, data, indptr_u)
    user_buckets = _pack_side(plan_u, cols, data, indptr_u)
    item_buckets = _pack_side(plan_i, item_cols, item_data, indptr_i)
    _mark_device_pack_warm(key)
    return user_buckets, item_buckets
