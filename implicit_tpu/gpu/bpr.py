"""Alias of the reference's ``implicit.gpu.bpr``
(/root/reference/implicit/gpu/bpr.py)."""

from ..models.bpr import BayesianPersonalizedRanking  # noqa: F401
