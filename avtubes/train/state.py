"""Train state and optimizer.

Optimizer parity: the reference uses torch Adam with `weight_decay`
(`train_hardway.py:115`), i.e. L2 added to the *gradient* before the Adam
moments (NOT AdamW), and MultiStepLR over epochs ([60,100,150,180], x0.1,
`train_hardway.py:117`).  We express that as
optax.chain(add_decayed_weights, adam(schedule)) with a piecewise-constant
step schedule.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from avtubes.core.config import OptimConfig


class AVTrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)
    epoch: jnp.ndarray | int = 0


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    boundaries = {int(m * steps_per_epoch): cfg.lr_gamma for m in cfg.lr_milestones}
    return optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(make_lr_schedule(cfg, steps_per_epoch)),
    )


def create_train_state(
    model,
    rng: jax.Array,
    sample_inputs: tuple,
    optim_cfg: OptimConfig,
    steps_per_epoch: int = 1,
) -> AVTrainState:
    # jit the init: eager init dispatches each op separately, which is
    # pathological over a remote-device tunnel (hundreds of round trips)
    variables = jax.jit(lambda r, *a: model.init(r, *a, train=False))(rng, *sample_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(optim_cfg, steps_per_epoch)
    return AVTrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats
    )
