"""Multi-chip scaling: mesh construction, sharded solves and sharded top-k.

The reference is single-process/single-GPU by design (`// TODO: multi-gpu
support`, /root/reference/implicit/gpu/als.cu:169-170); its only parallelism
is OpenMP threads over matrix rows. Here the same row-parallelism maps onto a
``jax.sharding.Mesh``: bucketed CSR chunks shard across chips on the row axis,
factor matrices stay replicated (they are small relative to interactions), and
XLA inserts the ICI collectives — an all-reduce of scattered factor updates
per half-iteration and an all-gather merge for sharded top-k serving.
"""

from .mesh import create_mesh, shard_buckets
from .topk_sharded import sharded_topk

__all__ = ["create_mesh", "shard_buckets", "sharded_topk"]
