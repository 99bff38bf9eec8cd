"""implicit_tpu — TPU-native collaborative filtering for implicit feedback datasets.

A ground-up JAX/XLA/Pallas re-design of the capabilities of benfred/implicit
(reference: /root/reference/implicit/__init__.py:1-5): ALS, BPR, Logistic Matrix
Factorization and item-item nearest-neighbour models trained on sparse
user×item confidence matrices, with batched top-k serving, ranking-metric
evaluation, train/test splitting, ANN acceleration and save/load.

Instead of Cython/OpenMP and CUDA kernels, every hot path is a jit-compiled
XLA program (with Pallas kernels for fused ops) operating on bucketed, padded
CSR tensors so the MXU sees large, static-shaped batched matmuls. Multi-chip
scaling goes through ``jax.sharding`` meshes rather than threads.
"""

from . import als, approximate_als, bpr, ease, lmf, nearest_neighbours
# the reference binds implicit.cpu/implicit.gpu as import side effects of
# its factories (/root/reference/implicit/als.py:3-4), so user code reads
# e.g. ``implicit.gpu.HAS_CUDA`` after a bare ``import implicit`` — keep
# that working through the drop-in alias packages
from . import cpu, gpu

__version__ = "0.4.0"

__all__ = [
    "als", "approximate_als", "bpr", "cpu", "ease", "gpu",
    "lmf", "nearest_neighbours", "__version__",
]
