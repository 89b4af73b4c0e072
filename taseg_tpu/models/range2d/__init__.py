from .postproc import knn_postprocess
from .rangenet import RangeNet
from .resnet_range import CENet, FIDNet
from .salsanext import SalsaNext

__all__ = ["CENet", "FIDNet", "RangeNet", "SalsaNext", "knn_postprocess"]
