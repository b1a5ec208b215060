"""Device mesh and sharding helpers.

Parallelism design (SURVEY §2.10): the workload is data-parallel — the
(b·t) frame-batch axis shards across a 1-D 'data' mesh; parameters and
optimizer state are replicated; XLA emits psum for the gradient
all-reduce and the all-gather implied by the cross-batch similarity
matmul (global negative pool).  DCN would only carry multi-host input
sharding; everything here rides ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_names=(DATA_AXIS,), shape=None) -> Mesh:
    """Mesh over the given (default: all) devices; 1-D 'data' axis by default.

    When jax_default_device is pinned (tests force CPU this way — the axon
    plugin ignores JAX_PLATFORMS), the mesh follows that platform so compute
    and data never straddle the host<->TPU tunnel.
    """
    if devices is None:
        from avtubes.core.platform import default_devices

        devices = default_devices()
    devices = np.asarray(devices)
    if shape is not None:
        devices = devices.reshape(shape)
    return Mesh(devices, axis_names)


def make_data_mesh(batch_size: int, devices=None) -> Mesh:
    """1-D data mesh over the most devices that evenly divide batch_size.

    batch_size is the PER-PROCESS batch (what the local loader feeds).
    Multi-process, the mesh must hold devices from EVERY process — a
    front-slice like devices[:n] would leave peer processes with zero
    addressable shards (their `replicate`/`shard_batch` would fail) — so
    the same number of devices is taken from each process, in process
    order (the layout `make_array_from_process_local_data` expects).
    """
    if devices is None:
        from avtubes.core.platform import default_devices

        devices = default_devices()
    if jax.process_count() > 1:
        by_proc: dict[int, list] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        per = min(len(v) for v in by_proc.values())
        while per > 1 and batch_size % per:
            per -= 1
        chosen = [d for pid in sorted(by_proc) for d in by_proc[pid][:per]]
        return make_mesh(chosen)
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in `tree` with its leading axis sharded over 'data'.

    Single-process: a plain device_put.  Multi-process (multi-host pods):
    each process passes its LOCAL slice of the global batch (the loader
    already reads a per-process dataset shard, `load_split(shard=...)`) and
    the result is the global array assembled across processes — this
    process's slice lands on its addressable devices, no cross-host copy.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    """Replicate every array across the mesh (params/opt state).  Multi-
    process: every process must hold the same host value (same-seed init or
    restored checkpoint — both true here)."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
