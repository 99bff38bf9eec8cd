"""Multi-chip scaling: mesh construction, sharded solves and sharded top-k.

The reference is single-process/single-GPU by design (`// TODO: multi-gpu
support`, /root/reference/implicit/gpu/als.cu:169-170); its only parallelism
is OpenMP threads over matrix rows. Here the same row-parallelism maps onto a
``jax.sharding.Mesh``.

Two training layouts exist:

- **Row-sharded** (:mod:`.als_sharded` — the layout ``mesh=`` models use):
  both factor matrices row-shard across chips in a strided permutation, each
  chip packs and solves only its own rows' bucketed chunks with the Pallas
  kernels unchanged, and the only collective is one tiled all-gather of the
  opposite side's factors per half-iteration.
- **Replicated-factor** (:func:`shard_buckets`): chunk tensors shard on the
  row axis while factors stay replicated; XLA inserts an all-reduce of
  scattered factor updates per class. Simpler, more collective traffic —
  kept for ops-level consumers and the dryrun.

Serving (:func:`sharded_topk`, and ``recommend``/``similar_*`` on meshed
models) shards the item axis: per-chip score + select, one all-gather
candidate merge over ICI.
"""

from . import als_sharded
from .als_sharded import RowShardedBuckets
from .mesh import create_mesh, shard_buckets
from .topk_sharded import sharded_topk

__all__ = [
    "als_sharded", "create_mesh", "shard_buckets", "sharded_topk",
    "RowShardedBuckets",
]
