"""Device availability introspection.

The analogue of the reference's ``implicit.gpu`` gating module
(/root/reference/implicit/gpu/__init__.py:5-31, which sets HAS_CUDA by
probing the CUDA extension): ``HAS_TPU`` reports whether an accelerator
backend is live, and ``device_count()`` how many chips participate.
"""

import logging

log = logging.getLogger("implicit_tpu")


def _probe():
    try:
        import jax

        devices = jax.devices()
        platform = devices[0].platform if devices else "none"
        return platform not in ("cpu", "none"), len(devices)
    except Exception as exc:  # pragma: no cover - environment-dependent
        log.debug("no accelerator backend available: %s", exc)
        return False, 0


HAS_TPU, _n_devices = _probe()


def device_count():
    """Number of devices visible to the default backend."""
    return _n_devices
