from .backbone_context import UNetCapacities, UNetTopology, build_unet_topology
from .minkunet import MinkUNet
from .minkunet_mm import MinkUNetMsMm, SparseEncoderFov, UNet2D

__all__ = [
    "MinkUNet",
    "MinkUNetMsMm",
    "SparseEncoderFov",
    "UNet2D",
    "UNetCapacities",
    "UNetTopology",
    "build_unet_topology",
]
