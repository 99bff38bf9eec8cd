"""Drop-in alias of the reference's ``implicit.gpu`` package layout.

``HAS_CUDA`` mirrors the reference's availability flag
(/root/reference/implicit/gpu/__init__.py:5-18): user code commonly passes
``use_gpu=implicit.gpu.HAS_CUDA`` into the factories. There is no CUDA in
this build, so it is honestly ``False`` — and harmlessly so, because the
factories accept ``use_gpu`` for compatibility and run the same unified
TPU-native model either way. Code that wants the real capability signal
should read ``HAS_TPU`` (computed lazily so importing this module never
forces JAX backend initialization).

The model submodules (``als``/``bpr``/``matrix_factorization_base``)
re-export the same unified classes as :mod:`implicit_tpu.cpu` — see that
package's docstring for the rationale.
"""

from . import als, bpr, matrix_factorization_base  # noqa: F401

HAS_CUDA = False


def __getattr__(name):
    if name == "HAS_TPU":
        import jax

        try:
            return any(d.platform not in ("cpu", "host")
                       for d in jax.devices())
        except RuntimeError:
            return False
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
