"""Device mesh setup and sharding placement helpers."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices=None, axis_name="d"):
    """Creates a 1-D device mesh over the first ``n_devices`` local devices.

    The TPU analogue of the reference's ``num_threads=0`` ("use all cores",
    /root/reference/implicit/cpu/bpr.pyx:181-183): by default all local
    devices participate.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        # fall back to the (possibly virtualized) host CPU backend — used to
        # validate multi-chip sharding without real multi-chip hardware.
        # Warn: e.g. a model pickled from an 8-chip mesh and restored on a
        # 1-chip host would otherwise silently run on host CPU
        import warnings

        from ..utils import ParameterWarning

        warnings.warn(
            f"requested a {n_devices}-device mesh but only "
            f"{len(devices)} accelerator device(s) are visible; falling "
            "back to (virtual) host CPU devices",
            ParameterWarning,
        )
        devices = jax.devices("cpu")
        if len(devices) < n_devices:
            # never truncate silently: a "mesh=8" model landing on a 1-device
            # mesh would quietly abandon the requested parallelism
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) exist on any backend; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} for a virtual CPU mesh, or pass "
                f"mesh<={len(devices)}"
            )
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


class ShardedBucketClass:
    __slots__ = ("L", "C", "n_chunks", "rows", "indices", "data", "lengths")

    def __init__(self, L, rows, indices, data, lengths):
        self.L = L
        self.n_chunks, self.C = rows.shape
        self.rows = rows
        self.indices = indices
        self.data = data
        self.lengths = lengths


class ShardedBuckets:
    """Mesh-sharded mirror of a BucketedCSR: drop-in for ops.als consumers."""

    def __init__(self, bucketed, mesh, axis_name="d"):
        n = mesh.shape[axis_name]
        row_sharding = NamedSharding(mesh, P(None, axis_name))
        entry_sharding = NamedSharding(mesh, P(None, axis_name, None))

        self.shape = bucketed.shape
        self.n_rows = bucketed.n_rows
        self.nnz = bucketed.nnz
        self.sentinel = bucketed.sentinel
        self.empty_rows = (
            jax.device_put(bucketed.empty_rows, NamedSharding(mesh, P()))
            if len(bucketed.empty_rows)
            else None
        )

        self.classes = []
        for cls in bucketed.classes:
            rows, idx, dat, lens = cls.rows, cls.indices, cls.data, cls.lengths
            C = rows.shape[1]
            if C % n:
                # pad with sentinel rows so every chip gets an equal slice
                pad = n - (C % n)
                rows = np.pad(rows, ((0, 0), (0, pad)), constant_values=bucketed.sentinel)
                idx = np.pad(idx, ((0, 0), (0, pad), (0, 0)))
                dat = np.pad(dat, ((0, 0), (0, pad), (0, 0)))
                lens = np.pad(lens, ((0, 0), (0, pad)))
            self.classes.append(
                ShardedBucketClass(
                    cls.L,
                    jax.device_put(rows, row_sharding),
                    jax.device_put(idx, entry_sharding),
                    jax.device_put(dat, entry_sharding),
                    jax.device_put(lens, row_sharding),
                )
            )


def shard_buckets(bucketed, mesh, axis_name="d"):
    """Device-puts a BucketedCSR's chunk tensors sharded over the row axis.

    Each (n_chunks, C, L) tensor is sharded on the C dimension so every chip
    solves an equal slice of each chunk's rows; XLA inserts the collectives
    for the replicated-factor gathers/scatters. Returns a ShardedBuckets
    usable anywhere a DeviceBuckets is (ops.als.fit / solve_side).
    """
    return ShardedBuckets(bucketed, mesh, axis_name)


def replicated(mesh, x):
    """Device-puts ``x`` replicated over the whole mesh.

    Host inputs go straight to the mesh devices — routing through
    ``jnp.asarray`` first would commit them to the *default* backend, which
    may be a different (or even unhealthy) accelerator client than the one
    the mesh lives on.
    """
    if not isinstance(x, (jax.Array, np.ndarray)):
        x = np.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, P()))
