"""Factory for Alternating Least Squares models.

API parity with /root/reference/implicit/als.py:7-80. The reference dispatches
between CPU (Cython) and GPU (CUDA) implementations here; this build has a
single device-native implementation, so the factory simply forwards (the
``use_gpu`` flag is accepted for drop-in compatibility).
"""

import numpy as np

from .models.als import AlternatingLeastSquares as _AlternatingLeastSquares


def AlternatingLeastSquares(
    factors=100,
    regularization=0.01,
    alpha=1.0,
    dtype=np.float32,
    use_native=True,
    use_cg=True,
    use_gpu=None,
    iterations=15,
    calculate_training_loss=False,
    num_threads=0,
    random_state=None,
    mesh=None,
    grid="auto",
    ingest="auto",
    gather_quant=False,
):
    """Alternating Least Squares.

    A recommendation model based on the algorithms described in the paper
    'Collaborative Filtering for Implicit Feedback Datasets' with performance
    optimizations described in 'Applications of the Conjugate Gradient Method
    for Implicit Feedback Collaborative Filtering.'

    Parameters
    ----------
    factors : int, optional
        The number of latent factors to compute
    regularization : float, optional
        The regularization factor to use
    alpha : float, optional
        The weight to give to positive examples
    dtype : data-type, optional
        Storage dtype of the factors
    use_native : bool, optional
        Accepted for API parity with the reference
    use_cg : bool, optional
        Use the faster conjugate-gradient solver
    use_gpu : bool, optional
        Accepted for API parity; compute always runs on the JAX default device
    iterations : int, optional
        The number of ALS iterations to use when fitting data
    calculate_training_loss : bool, optional
        Whether to log out the training loss at each iteration
    num_threads : int, optional
        Accepted for API parity
    random_state : int, RandomState, Generator or None, optional
        The random state for seeding the initial item and user factors
    mesh : jax.sharding.Mesh or int, optional
        Train data-parallel across a device mesh (int = 1-D mesh over that
        many local devices)
    grid : {"auto", "pow2", "fine"}, optional
        Row-length bucketing grid: "pow2" (the default) compiles several
        times faster on a fresh shape; "fine" buys the best steady-state
        s/iter at a larger one-time compile (see models.als)
    ingest : {"auto", "host", "device"}, optional
        Interaction-upload route: "auto" host-packs until the on-device
        pack programs are compile-warm (fastest first fit), then switches
        to the single-COO-upload device pack; "device" forces it (2x
        measured ingestion wall at 50M-nnz scale once compiled, fewer
        bytes over the transport); "host" always packs on the host
    gather_quant : {False, True, "auto"}, optional
        Gather the fixed-side factor block from an int8 per-row-scaled
        table copy during solves. Wide tables (factors >= 192 at
        last.fm-scale row counts) outgrow the VMEM promotion boundary and
        gather at the slow HBM per-index rate; int8 halves the table back
        under it. "auto" applies it per side only for 16-bit compute
        (dtype=float16) tables past the boundary; f32 models are never
        silently requantized. See ops.als._quantize_table for the
        precision contract.

    Returns
    -------
    AlternatingLeastSquares
    """
    return _AlternatingLeastSquares(
        factors=factors,
        regularization=regularization,
        alpha=alpha,
        dtype=dtype,
        use_native=use_native,
        use_cg=use_cg,
        iterations=iterations,
        calculate_training_loss=calculate_training_loss,
        num_threads=num_threads,
        random_state=random_state,
        mesh=mesh,
        grid=grid,
        ingest=ingest,
        gather_quant=gather_quant,
    )
