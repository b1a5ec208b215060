"""Models: dual-modal ResNet18 encoders, T-preserving ResNet3D, hard-way head."""

from avtubes.models.resnet2d import ResNet2D, resnet18
from avtubes.models.resnet3d import ResNet3D
from avtubes.models.hardway import HardwayConfig, HardwayOutput, hardway_head
from avtubes.models.avenet import AVENet
from avtubes.models.fullmodel import FullModel

__all__ = [
    "ResNet2D",
    "ResNet3D",
    "HardwayConfig",
    "HardwayOutput",
    "hardway_head",
    "AVENet",
    "FullModel",
    "resnet18",
]
