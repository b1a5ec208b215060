"""Multi-host (multi-process) JAX wiring.

The reference is strictly single-node (`nn.DataParallel`,
`/root/reference/train_hardway.py:91`); multi-host here is the TPU-pod
upgrade path: each host runs one process, loads its slice of the dataset
(`load_split(shard=(process_index, process_count))`), and feeds its
addressable shard of the global batch.  XLA emits the gradient psum and the
negative-pool all-gather over ICI exactly as in the single-process case —
the only new machinery is process coordination and global-array assembly.

Activation is env-gated so single-host runs pay nothing:

    AVTUBES_COORDINATOR=host0:1234 AVTUBES_NUM_PROCESSES=2 \
    AVTUBES_PROCESS_ID=0 python -m avtubes.cli.train_hardway ...

On Cloud TPU pods, `jax.distributed.initialize()` auto-detects all three
values; setting AVTUBES_DISTRIBUTED=1 opts into that path.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed from env vars, if requested.

    Returns True when running multi-process (after initialization).  Safe to
    call more than once and from every CLI entry point.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    coordinator = os.environ.get("AVTUBES_COORDINATOR")
    if coordinator:
        num = int(os.environ["AVTUBES_NUM_PROCESSES"])
        pid = int(os.environ["AVTUBES_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num, process_id=pid)
        _initialized = True
    elif os.environ.get("AVTUBES_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # TPU-pod auto-detection
        _initialized = True
    return _initialized and jax.process_count() > 1


def data_shard() -> tuple[int, int] | None:
    """(process_index, process_count) for `load_split(shard=...)`, or None
    when single-process."""
    import jax

    if jax.process_count() > 1:
        return (jax.process_index(), jax.process_count())
    return None
