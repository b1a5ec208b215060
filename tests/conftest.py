"""Test configuration: run everything on CPU with 8 virtual devices.

Note: in this environment the TPU ("axon") PJRT plugin ignores
JAX_PLATFORMS=cpu, so we force CPU via jax_default_device instead and
build multi-device meshes explicitly from jax.devices("cpu").
The XLA flag must be set before jax initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_default_matmul_precision", "float32")


def cpu_mesh(shape, axis_names):
    """Build a Mesh over virtual CPU devices (test helper)."""
    import numpy as np
    from jax.sharding import Mesh

    n = int(np.prod(shape))
    devs = np.array(jax.devices("cpu")[:n]).reshape(shape)
    return Mesh(devs, axis_names)
