from .backbone_context import UNetCapacities, UNetTopology, build_unet_topology
from .backbones import (
    ResNetTopology,
    SparseResNet21D,
    SparseResUNet42,
    build_resnet_topology,
)
from .cylinder3d import CylinderTS, CylTopology, build_cylinder_topology
from .minkunet import MinkUNet
from .minkunet_mm import (
    MinkUNetMsMm,
    MinkUNetMsMmNus,
    SparseEncoderFov,
    UNet2D,
)

__all__ = [
    "CylinderTS",
    "CylTopology",
    "MinkUNet",
    "ResNetTopology",
    "SparseResNet21D",
    "SparseResUNet42",
    "build_resnet_topology",
    "build_cylinder_topology",
    "MinkUNetMsMm",
    "SparseEncoderFov",
    "UNet2D",
    "UNetCapacities",
    "UNetTopology",
    "build_unet_topology",
]
