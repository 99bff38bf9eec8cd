"""Alias of the reference's ``implicit.cpu.lmf`` module
(/root/reference/implicit/cpu/lmf.pyx)."""

from ..models.lmf import LogisticMatrixFactorization  # noqa: F401
