"""Checkpoint save/restore (orbax pytree checkpoints).

The reference saves `{epoch, model_state_dict, optimizer_state_dict}` per
epoch with torch.save (`train_hardway.py:241-247`) and resumes by dict
update + load_state_dict (`:93-100`).  Here a checkpoint is the full
AVTrainState pytree `{step, params, batch_stats, opt_state}` plus the epoch,
written with orbax (async-safe, atomic directories).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def checkpoint_path(summaries_dir: str | Path, tag: str, epoch: int) -> Path:
    return Path(summaries_dir).absolute() / f"{tag}_ep{epoch}"


def save_checkpoint(summaries_dir: str | Path, tag: str, epoch: int, state) -> Path:
    """Write {params, batch_stats, opt_state, step, epoch} to an orbax dir.

    Multi-process: the state is fully replicated (data parallelism only),
    so every process holds an exact local copy — the primary alone converts
    to host numpy and writes (two processes writing one path on a shared
    filesystem would race), the rest wait at a barrier.
    """
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": epoch,
    }
    path = checkpoint_path(summaries_dir, tag, epoch)
    if jax.process_count() > 1:
        from avtubes.core.distributed import host_local_state

        # ALL processes call save — orbax's Checkpointer is itself a
        # collective (internal sync_global_processes barriers) and gates the
        # actual write to the primary host.  The payload is pulled to host
        # numpy via local-shard reads first: converting a multi-process
        # array with np.asarray can initiate a collective the peers never
        # join, and numpy leaves are what orbax writes primary-only.
        _checkpointer().save(path, host_local_state(payload), force=True)
        return path
    _checkpointer().save(path, payload, force=True)
    return path


def restore_checkpoint(path: str | Path, state) -> tuple[Any, int]:
    """Restore into a template AVTrainState; returns (state, epoch)."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": 0,
    }
    # restore as host numpy (topology-independent); the next jit call moves
    # leaves back to device with whatever sharding the run uses
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
    )
    restored = _checkpointer().restore(
        Path(path).absolute(), item=template, restore_args=restore_args
    )
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, int(restored["epoch"])


class PreemptionGuard:
    """Preemption-safe training: catch SIGTERM/SIGINT, let the current step
    finish, then the trainer saves a checkpoint and exits cleanly so a
    restart (`--use_pretrained`) resumes at the same epoch.

    Usage (inside the epoch loop):
        guard = PreemptionGuard()
        ...
        if guard.preempted:
            save_checkpoint(...); break

    Signal handlers are only installed in the main thread (a no-op guard
    otherwise, e.g. under test runners that use worker threads).
    """

    def __init__(self):
        import signal
        import threading

        self.preempted = False
        self._prev = {}
        if threading.current_thread() is not threading.main_thread():
            return
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main interpreter contexts
                pass

    def _handler(self, signum, frame):
        print(f"[checkpoint] signal {signum}: finishing step, then "
              "checkpoint + clean exit")
        self.preempted = True

    def restore(self):
        """Reinstall the original handlers (call when training ends)."""
        import signal

        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass


def latest_checkpoint(summaries_dir: str | Path, tag: str) -> Path | None:
    root = Path(summaries_dir)
    if not root.exists():
        return None
    cands = []
    for p in root.iterdir():
        if p.is_dir() and p.name.startswith(f"{tag}_ep"):
            try:
                cands.append((int(p.name.split("_ep")[-1]), p))
            except ValueError:
                continue
    return max(cands)[1] if cands else None
