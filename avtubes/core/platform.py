"""The one place that answers "which backend is compute actually on?".

This environment's axon TPU plugin ignores ``JAX_PLATFORMS=cpu``; tests and
the multichip dryrun force CPU by pinning ``jax_default_device`` instead.
Every platform probe must therefore consult the pinned default device FIRST
and only fall back to ``jax.default_backend()`` — four modules used to
carry private copies of this logic (ops/stft, ops/correlation, core/mesh
twice); they all call these helpers now so a fix lands once.
"""

from __future__ import annotations

import jax


def default_platform() -> str:
    """Platform of the effective default device ('tpu', 'cpu', ...)."""
    default = jax.config.jax_default_device
    if default is None:
        return jax.default_backend()
    if isinstance(default, str):  # jax accepts a platform name here too
        return default
    return default.platform


def on_tpu() -> bool:
    return default_platform() == "tpu"


def default_devices() -> list:
    """All devices of the effective default platform."""
    return jax.devices(default_platform())
