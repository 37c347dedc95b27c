"""Backend gating shared by the Pallas-kernel availability checks.

``jax.default_backend()`` reports the PROCESS-level default platform,
not where a computation will execute: a solve traced under
``jax.default_device(cpu_device)`` (the api's final exact-IEEE-f64
rescue tier) would otherwise still select the TPU Pallas kernels and
fail at execution ("Only interpret mode is supported on CPU backend").
``force_cpu()`` scopes an override the ``*_available()`` gates consult
at trace time."""

from __future__ import annotations

import contextlib

import jax

_FORCE_CPU = False


@contextlib.contextmanager
def force_cpu():
    """Within this context every kernel availability gate reports
    False, so traces build the pure-XLA (CPU-safe) paths."""
    global _FORCE_CPU
    prev = _FORCE_CPU
    _FORCE_CPU = True
    try:
        yield
    finally:
        _FORCE_CPU = prev


def tpu_kernels_on() -> bool:
    if _FORCE_CPU:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
