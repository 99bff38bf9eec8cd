"""Factories combining ALS training with ANN serving accelerators.

API parity with /root/reference/implicit/approximate_als.py:10-77. Note that
the exact TPU top-k path is a single fused GEMM + top-k and is typically fast
enough to serve without ANN; these exist for drop-in compatibility.
"""

from . import als


def NMSLibAlternatingLeastSquares(
    *args,
    approximate_similar_items=True,
    approximate_recommend=True,
    method="hnsw",
    index_params=None,
    query_params=None,
    use_gpu=None,
    **kwargs,
):
    """ALS model whose serving is accelerated by an NMSLib HNSW index."""
    # import lazily: the ann extras are optional dependencies
    from .ann.nmslib import NMSLibModel

    als_model = als.AlternatingLeastSquares(*args, **kwargs)
    return NMSLibModel(
        als_model,
        approximate_similar_items=approximate_similar_items,
        approximate_recommend=approximate_recommend,
        method=method,
        index_params=index_params,
        query_params=query_params,
    )


def AnnoyAlternatingLeastSquares(
    *args,
    approximate_similar_items=True,
    approximate_recommend=True,
    n_trees=50,
    search_k=-1,
    use_gpu=None,
    **kwargs,
):
    """ALS model whose serving is accelerated by Annoy indexes."""
    from .ann.annoy import AnnoyModel

    als_model = als.AlternatingLeastSquares(*args, **kwargs)
    return AnnoyModel(
        als_model,
        approximate_similar_items=approximate_similar_items,
        approximate_recommend=approximate_recommend,
        n_trees=n_trees,
        search_k=search_k,
    )


def FaissAlternatingLeastSquares(
    *args,
    approximate_similar_items=True,
    approximate_recommend=True,
    nlist=400,
    nprobe=20,
    use_gpu=False,
    **kwargs,
):
    """ALS model whose serving is accelerated by Faiss IVF indexes."""
    from .ann.faiss import FaissModel

    als_model = als.AlternatingLeastSquares(*args, **kwargs)
    return FaissModel(
        als_model,
        approximate_similar_items=approximate_similar_items,
        approximate_recommend=approximate_recommend,
        nlist=nlist,
        nprobe=nprobe,
        use_gpu=use_gpu,
    )


def TPUIVFAlternatingLeastSquares(
    *args,
    approximate_similar_items=True,
    approximate_recommend=True,
    n_clusters=None,
    n_probe=None,
    kmeans_iters=15,
    **kwargs,
):
    """ALS model served by an on-device IVF index — no external ANN library.

    The TPU-native counterpart of ``FaissAlternatingLeastSquares(use_gpu=True)``
    (/root/reference/implicit/ann/faiss.py:62-137): inverted lists are built
    by spherical k-means on the accelerator and queried as probed-cluster
    block matmuls (see implicit_tpu.ann.ivf).
    """
    from .ann.ivf import TPUIVFModel

    als_model = als.AlternatingLeastSquares(*args, **kwargs)
    return TPUIVFModel(
        als_model,
        approximate_similar_items=approximate_similar_items,
        approximate_recommend=approximate_recommend,
        n_clusters=n_clusters,
        n_probe=n_probe,
        kmeans_iters=kmeans_iters,
        # seed the index build alongside the model (deterministic refits)
        random_state=kwargs.get("random_state"),
    )
