"""Training: train state, jitted steps, epoch drivers."""

from avtubes.train.state import AVTrainState, create_train_state, make_optimizer
from avtubes.train.steps import hardway_train_step, hardway_1frame_train_step, eval_heatmap_step

__all__ = [
    "AVTrainState",
    "create_train_state",
    "make_optimizer",
    "hardway_train_step",
    "hardway_1frame_train_step",
    "eval_heatmap_step",
]
