from .backbone_context import UNetCapacities, UNetTopology, build_unet_topology
from .minkunet import MinkUNet

__all__ = ["MinkUNet", "UNetCapacities", "UNetTopology", "build_unet_topology"]
