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


def require_single_process() -> None:
    """Initialize-from-env, then refuse multi-process: only the flagship
    trainer shards its dataset per process — any other trainer run
    multi-process would silently train on duplicated data.  Called by every
    non-flagship CLI entry point."""
    if maybe_initialize():
        raise SystemExit(
            "multi-host training is wired for avtubes.cli.train_hardway "
            "only; run this trainer single-process")


def is_primary() -> bool:
    """True on the process that owns side effects (eval, metric logs,
    qualitative dumps).  Always True single-process."""
    import jax

    return jax.process_index() == 0


def barrier(tag: str) -> None:
    """Cross-process sync point (no-op single-process).  Used to keep
    non-primary processes alive while the primary runs a local-only stage
    (eval) or writes artifacts."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def host_local_state(state):
    """Pull a (fully replicated) train state's arrays to host numpy so a
    single process can run local-device programs with it (eval on the
    primary while the pod's other processes wait at a `barrier`), or write
    a checkpoint without a cross-process collective.

    np.asarray on a multi-process global array can initiate a collective
    (deadlock when only one process converts); a replicated array's LOCAL
    shard 0 holds the full value, so reading it is exact and
    collective-free.
    """
    import jax
    import numpy as np

    if jax.process_count() <= 1:
        return state

    def to_host(x):
        if isinstance(x, jax.Array):
            assert x.is_fully_replicated, (
                "host_local_state expects replicated arrays (data "
                f"parallelism only); got sharding {x.sharding}")
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)

    return jax.tree_util.tree_map(to_host, state)


def agreed_steps_per_epoch(n_total_ids: int, batch_size: int,
                           group: int = 1) -> int:
    """The per-epoch step count EVERY process must dispatch.

    Each global train step is a collective program (gradient psum,
    negative-pool all-gather): if one process runs fewer steps than its
    peers — shorter i::n dataset shard, or decode failures skipped by its
    local loader — the peers block forever inside the collective.  So the
    count is agreed a priori from the split size (identical on all
    processes, no communication needed): the smallest shard's full-batch
    count, floored to a multiple of `group` (grouped steps dispatch
    `group` batches per program).  Local loaders that come up short against
    this number recycle their shard (`fixed_count_batches`).
    """
    import jax

    nproc = max(1, jax.process_count())
    min_shard = n_total_ids // nproc  # i::n slicing: every shard has >= this
    steps = max(1, min_shard // max(1, batch_size))
    if group > 1:
        steps = max(group, steps - steps % group)
    return steps


def fixed_count_batches(loader, epoch: int, n_batches: int):
    """Yield EXACTLY n_batches full batches from loader.epoch(epoch),
    recycling the local shard when decode failures leave it short (the
    multi-process contract: every process dispatches the same number of
    global steps — see `agreed_steps_per_epoch`)."""
    got = 0
    while got < n_batches:
        before = got
        for batch in loader.epoch(epoch):
            yield batch
            got += 1
            if got >= n_batches:
                return
        if got == before:
            raise RuntimeError(
                "local dataset shard yielded zero batches — cannot satisfy "
                f"the agreed {n_batches} steps/epoch")
