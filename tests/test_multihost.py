"""Multi-host data parallelism: 2 real processes x 4 virtual CPU devices.

Proves the advertised multi-host path end-to-end (SURVEY §2.10 DCN note):
`jax.distributed.initialize` wiring (env-gated, `core/distributed.py`),
per-process dataset sharding (`load_split(shard=...)` slicing), global-batch
assembly (`shard_batch` via make_array_from_process_local_data), and that
one train step — gradient psum + global negative pool spanning BOTH
processes — matches the single-process 8-device run bit-for-tolerance.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(port: int, pid: int) -> dict:
    env = dict(os.environ)
    # CPU-only subprocess: without PALLAS_AXON_POOL_IPS the axon
    # sitecustomize skips PJRT registration and JAX_PLATFORMS=cpu holds
    # (two processes must not contend for the single TPU)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["AVTUBES_COORDINATOR"] = f"127.0.0.1:{port}"
    env["AVTUBES_NUM_PROCESSES"] = "2"
    env["AVTUBES_PROCESS_ID"] = str(pid)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "proc0.json"
    worker = REPO / "tests" / "multihost_worker.py"
    procs = [subprocess.Popen([sys.executable, str(worker), str(out)],
                              env=_worker_env(port, pid),
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
             for pid in (0, 1)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    result = json.loads(out.read_text())

    # single-process reference on this process's 8 virtual CPU devices
    # (conftest), same global batch order: make_array_from_process_local_data
    # places process 0's local slice on the first 4 devices, so the global
    # batch is concat(proc0 ids 0::2, proc1 ids 1::2)
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.core.mesh import make_mesh, replicate, shard_batch
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_1frame_train_step
    from multihost_worker import local_batch

    ids = list(range(8))
    order = ids[0::2] + ids[1::2]
    frames, specs = local_batch(order)
    model = AVENet()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 32, 32, 1))),
        OptimConfig(learning_rate=1e-3))
    mesh = make_mesh()
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {"frame": frames, "spec": specs})
    state, metrics = hardway_1frame_train_step(state, batch["frame"], batch["spec"])
    loss_ref = float(metrics["loss"])
    param_sq_ref = float(sum(
        float(jnp.sum(jnp.square(l.astype(jnp.float64))))
        for l in jax.tree_util.tree_leaves(state.params)))

    # cross-process reduction order differs from single-process; a semantic
    # bug (per-process negative pool, missing psum) moves the loss by >1e-2
    assert np.isclose(result["loss"], loss_ref, rtol=1e-5, atol=1e-5), \
        (result["loss"], loss_ref)
    assert np.isclose(result["param_sq"], param_sq_ref, rtol=1e-6), \
        (result["param_sq"], param_sq_ref)


def test_agreed_steps_per_epoch_math():
    """Single-process semantics + the multiple-of-group floor (the unit the
    2-process trainer test below relies on)."""
    from avtubes.core.distributed import agreed_steps_per_epoch

    # single process: min_shard == total
    assert agreed_steps_per_epoch(100, 10) == 10
    assert agreed_steps_per_epoch(99, 10) == 9      # drop_last
    assert agreed_steps_per_epoch(5, 10) == 1       # never zero
    assert agreed_steps_per_epoch(100, 10, group=4) == 8  # floor to group
    assert agreed_steps_per_epoch(30, 10, group=5) == 5   # at least group


def test_fixed_count_batches_recycles_short_shards():
    """A loader whose epoch comes up short (decode failures) is recycled
    until the agreed count is met; a dead loader raises instead of spinning."""
    from avtubes.core.distributed import fixed_count_batches

    class ShortLoader:
        def __init__(self, per_epoch):
            self.per_epoch = per_epoch
            self.epochs_started = 0

        def epoch(self, e):
            self.epochs_started += 1
            yield from range(self.per_epoch)

    lo = ShortLoader(3)
    got = list(fixed_count_batches(lo, 0, 7))
    assert len(got) == 7 and lo.epochs_started == 3  # 3 + 3 + 1

    dead = ShortLoader(0)
    with pytest.raises(RuntimeError):
        list(fixed_count_batches(dead, 0, 2))


@pytest.mark.slow
def test_two_process_trainer_end_to_end(tmp_path):
    """The REAL flagship trainer under 2 processes: agreed step counts (no
    collective deadlock), primary-only eval/logging/checkpointing — exactly
    one metrics stream and one checkpoint dir, no write races."""
    port = _free_port()
    out = tmp_path / "trainer0.json"
    summaries = [tmp_path / "sum0", tmp_path / "sum1"]
    worker = REPO / "tests" / "multihost_worker.py"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), "trainer", str(out), str(summaries[pid])],
        env=_worker_env(port, pid),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"trainer worker failed:\n{log[-4000:]}"
    result = json.loads(out.read_text())
    assert result["ok"] and result["loss"] > 0
    assert 0.0 <= result["hardway_ciou"] <= 1.0  # primary ran eval

    # primary-only side effects: process 1's summaries dir has no metrics
    # stream and no checkpoint (each process got its own dir, so any file
    # in dir 1 would be a gating bug)
    assert (summaries[0] / "mh.metrics.jsonl").exists()
    assert list(summaries[0].glob("mh_ep*")), "primary wrote no checkpoint"
    assert not (summaries[1] / "mh.metrics.jsonl").exists()
    assert not list(summaries[1].glob("mh_ep*"))
