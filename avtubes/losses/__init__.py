"""Training losses for the hard-way objective and temporal consistency."""

from avtubes.losses.losses import (
    hardway_loss,
    propagation_loss,
    np_ratio_loss,
    flip_loss,
    consistency_l2,
)

__all__ = [
    "hardway_loss",
    "propagation_loss",
    "np_ratio_loss",
    "flip_loss",
    "consistency_l2",
]
