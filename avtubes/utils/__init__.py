"""Utilities: structured metric logging, heatmap overlay rendering."""

from avtubes.utils.logging import MetricLogger
from avtubes.utils.visual import overlay_heatmap

__all__ = ["MetricLogger", "overlay_heatmap"]
