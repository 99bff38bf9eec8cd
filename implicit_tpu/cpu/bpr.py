"""Alias of the reference's ``implicit.cpu.bpr`` module
(/root/reference/implicit/cpu/bpr.pyx)."""

from ..models.bpr import BayesianPersonalizedRanking  # noqa: F401
