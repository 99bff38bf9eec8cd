"""Alias of the reference's ``implicit.cpu.matrix_factorization_base``
(/root/reference/implicit/cpu/matrix_factorization_base.py)."""

from ..models.mf_base import MatrixFactorizationBase  # noqa: F401
