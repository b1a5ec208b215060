"""Models: dual-modal ResNet18 encoders, T-preserving ResNet3D, hard-way head."""

from avtubes.models.resnet2d import ResNet2D, resnet18
from avtubes.models.hardway import HardwayConfig, HardwayOutput, hardway_head
from avtubes.models.avenet import AVENet

__all__ = [
    "ResNet2D",
    "resnet18",
    "HardwayConfig",
    "HardwayOutput",
    "hardway_head",
    "AVENet",
]
