"""Alias of the reference's ``implicit.gpu.matrix_factorization_base``
(/root/reference/implicit/gpu/matrix_factorization_base.py)."""

from ..models.mf_base import MatrixFactorizationBase  # noqa: F401
