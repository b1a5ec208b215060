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
