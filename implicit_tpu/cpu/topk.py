"""Alias of the reference's ``implicit.cpu.topk`` kernel module
(/root/reference/implicit/cpu/topk.pyx:15) — same signature, device-native
implementation (see ops/topk.py for the design)."""

from ..ops.topk import topk  # noqa: F401
