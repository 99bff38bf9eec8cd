"""Optional approximate-nearest-neighbour serving accelerators.

Each wrapper takes a trained matrix-factorization model and swaps the
brute-force top-k serving path for an ANN index (Annoy / NMSLib / Faiss, or
the on-device TPU IVF index in .ivf).
Note that on TPU the exact path (``implicit_tpu.ops.topk``) is a single fused
GEMM+top-k and is usually fast enough that ANN is unnecessary; these wrappers
exist for drop-in compatibility with the reference library
(/root/reference/implicit/ann/).
"""
