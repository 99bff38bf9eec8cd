"""Factory for Logistic Matrix Factorization models.

API parity with /root/reference/implicit/lmf.py:6-67 (the reference raises
NotImplementedError for its GPU path; this build trains on-device).
"""

import numpy as np

from .models.lmf import LogisticMatrixFactorization as _LogisticMatrixFactorization


def LogisticMatrixFactorization(
    factors=30,
    learning_rate=1.00,
    regularization=0.6,
    dtype=np.float32,
    iterations=30,
    neg_prop=30,
    use_gpu=None,
    num_threads=0,
    random_state=None,
    mesh=None,
    ingest="auto",
):
    """Logistic Matrix Factorization.

    A collaborative filtering recommender model that learns a probabilistic
    distribution of whether a user likes an item, per 'Logistic Matrix
    Factorization for Implicit Feedback Data'.

    Parameters
    ----------
    factors : int, optional
        The number of latent factors to compute
    learning_rate : float, optional
        The learning rate to apply for updates during training
    regularization : float, optional
        The regularization factor to use
    dtype : data-type, optional
        Storage dtype of the factors
    iterations : int, optional
        The number of training epochs to use when fitting the data
    neg_prop : int, optional
        The proportion of negative samples per observed interaction
    use_gpu : bool, optional
        Accepted for API parity; compute always runs on the JAX default device
    num_threads : int, optional
        Accepted for API parity
    random_state : int, RandomState, Generator or None, optional
        The random state for seeding the initial item and user factors

    Returns
    -------
    LogisticMatrixFactorization
    """
    return _LogisticMatrixFactorization(
        factors=factors,
        learning_rate=learning_rate,
        regularization=regularization,
        dtype=dtype,
        iterations=iterations,
        neg_prop=neg_prop,
        num_threads=num_threads,
        random_state=random_state,
        mesh=mesh,
        ingest=ingest,
    )
