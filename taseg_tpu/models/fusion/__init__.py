from .rpvnet import RPVNet, RpvContext, build_rpv_context
from .spvcnn import SPVCNN

__all__ = ["RPVNet", "RpvContext", "SPVCNN", "build_rpv_context"]
