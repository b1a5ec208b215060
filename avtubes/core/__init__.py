"""Core: configuration, mesh/sharding, rng, checkpointing."""

from avtubes.core.config import DataConfig, ExperimentConfig, OptimConfig, TrainConfig

__all__ = ["DataConfig", "ExperimentConfig", "OptimConfig", "TrainConfig"]
