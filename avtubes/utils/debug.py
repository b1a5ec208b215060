"""Debug/tracing utilities.

`shape_report` is the equivalent of the reference's DebugModule per-layer
shape + memory printer (`models/model_utils.py:7-35`), done the JAX way:
eval_shape the module (no FLOPs, no device), walk the jaxpr-free output and
parameter tree, report shapes and float32 byte costs.

`trace` wraps a step in jax.profiler for TensorBoard-viewable device traces
(the reference had no profiler at all; SURVEY §5).
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


def shape_report(module, *example_inputs, train: bool = False) -> str:
    """Parameter/ouput shape + memory summary without running any compute."""
    shapes = jax.eval_shape(
        lambda rng: module.init(rng, *example_inputs, train=train),
        jax.random.PRNGKey(0))
    lines = []
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(shapes)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total += nbytes
        lines.append(f"{name:60s} {str(leaf.shape):24s} {nbytes / 1e6:8.3f} MB")
    lines.append(f"{'TOTAL':60s} {'':24s} {total / 1e6:8.3f} MB")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/avtubes_trace"):
    """Device profiler trace context: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with device-sync (block_until_ready on a probe)."""

    def __init__(self) -> None:
        import time

        self._time = time.perf_counter
        self.history: list[float] = []
        self._last = self._time()

    def tick(self, probe=None) -> float:
        if probe is not None:
            jax.block_until_ready(probe)
        now = self._time()
        dt = now - self._last
        self._last = now
        self.history.append(dt)
        return dt

    def mean(self, last: int = 50) -> float:
        if not self.history:
            return float("nan")
        return float(np.mean(self.history[-last:]))
