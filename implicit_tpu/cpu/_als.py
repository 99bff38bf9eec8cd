"""Alias of /root/reference/implicit/cpu/_als.pyx's public surface.

The reference compiles this module from Cython (`_als.pyx:67,145,251`
exposes ``least_squares``, ``least_squares_cg``, ``calculate_loss``).
User code importing the kernel path directly (``from implicit.cpu import
_als``) gets the same callables here; the heavy lifting in this package
happens on-device (`ops/als.py`), these are the host-numpy oracles with
identical semantics.
"""

from ..models.als import (  # noqa: F401
    calculate_loss,
    least_squares,
    least_squares_cg,
)
