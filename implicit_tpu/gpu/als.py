"""Alias of the reference's ``implicit.gpu.als``
(/root/reference/implicit/gpu/als.py) — the same unified TPU-native class
as :mod:`implicit_tpu.cpu.als`; bf16 compute mode (``dtype=np.float16``)
is the analogue of the reference GPU's fp16 factors."""

from ..models.als import AlternatingLeastSquares  # noqa: F401
