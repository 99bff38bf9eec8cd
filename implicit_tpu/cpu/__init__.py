"""Drop-in alias of the reference's ``implicit.cpu`` package layout.

The reference splits every model into per-device implementations —
``implicit.cpu.*`` (Cython+OpenMP, /root/reference/implicit/cpu/__init__.py)
and ``implicit.gpu.*`` (CUDA, /root/reference/implicit/gpu/__init__.py) —
and user code frequently imports the concrete classes from those paths
directly (the reference's own factories do:
/root/reference/implicit/als.py:3-4). This build has a single TPU-native
implementation of each model, so this package and :mod:`implicit_tpu.gpu`
re-export the SAME unified classes under the reference's module layout;
``implicit_tpu.cpu.als.AlternatingLeastSquares`` is
``implicit_tpu.models.als.AlternatingLeastSquares``.
"""

from . import als, bpr, lmf, matrix_factorization_base, topk  # noqa: F401
