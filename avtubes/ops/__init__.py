"""Custom ops: correlation cost volume, bilinear warp, fused STFT,
median-select mask (Pallas/XLA)."""

from avtubes.ops.correlation import correlation_cost_volume
from avtubes.ops.median_select import median_mask
from avtubes.ops.warp import flow_warp, grid_sample

__all__ = ["correlation_cost_volume", "flow_warp", "grid_sample", "median_mask"]
