"""Worker for the 2-process multi-host test (not a pytest file).

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu, 4 virtual CPU
devices, and AVTUBES_COORDINATOR/... env set.  Exercises the real wiring:
`maybe_initialize` -> `data_shard` -> per-process loading -> `shard_batch`
global-array assembly -> one donated train step (gradient psum + global
negative pool across processes) -> result JSON from process 0.
"""

import json
import sys

import numpy as np


def local_batch(ids_local: list[int], image: int = 32):
    frames = np.stack([np.random.RandomState(i).randn(image, image, 3)
                       for i in ids_local]).astype(np.float32)
    specs = np.stack([np.random.RandomState(1000 + i).randn(image, image, 1)
                      for i in ids_local]).astype(np.float32)
    return frames, specs


def main():
    out_path = sys.argv[1]
    import jax

    from avtubes.core.distributed import data_shard, maybe_initialize

    assert maybe_initialize(), "expected multi-process env"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    shard = data_shard()
    assert shard == (jax.process_index(), 2)
    ids = list(range(8))
    ids_local = ids[shard[0]::shard[1]]  # load_split's i::n slicing
    frames_l, specs_l = local_batch(ids_local)

    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.core.mesh import make_mesh, replicate, shard_batch
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_1frame_train_step

    model = AVENet()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 32, 32, 1))),
        OptimConfig(learning_rate=1e-3))
    mesh = make_mesh()  # all 8 global devices
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {"frame": frames_l, "spec": specs_l})
    state, metrics = hardway_1frame_train_step(state, batch["frame"], batch["spec"])
    loss = float(metrics["loss"])
    param_sq = float(sum(
        float(jnp.sum(jnp.square(l.astype(jnp.float64))))
        for l in jax.tree_util.tree_leaves(state.params)))
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "param_sq": param_sq}, f)
    # keep both processes alive until the result is written (barrier)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


def trainer_main():
    """Mode 2: the ACTUAL flagship trainer end-to-end, 2 processes.

    Exercises the multi-process hardening: agreed steps-per-epoch (both
    processes dispatch the same collective programs), primary-only metric
    logging / eval (with host-local state) / checkpoint write, and the
    epoch-boundary barriers.  Argv: trainer <out_path> <summaries_dir>."""
    out_path, summaries = sys.argv[2], sys.argv[3]
    import jax

    from avtubes.core.distributed import maybe_initialize

    assert maybe_initialize(), "expected multi-process env"
    from avtubes.core.config import ExperimentConfig
    from avtubes.train.hardway import run

    # group_steps=2 with an odd steps_cap exercises the grouped-dispatch
    # path under the agreed-count cap (which must stay a multiple of group
    # or `pending` never flushes and zero optimizer steps run)
    cfg = ExperimentConfig.from_args([
        "--synthetic", "--epochs", "1", "--batch_size", "2",
        "--frame_density", "2", "--image_size", "64", "--group_steps", "2",
        "--summaries_dir", summaries, "--n_threads", "1",
    ])
    metrics = run(cfg, steps_cap=3, tag="mh")
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"ok": True,
                       "loss": float(metrics.get("loss", -1.0)),
                       "hardway_ciou": float(metrics.get("hardway_ciou", -1.0))},
                      f)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("trainer_done")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "trainer":
        trainer_main()
    else:
        main()
