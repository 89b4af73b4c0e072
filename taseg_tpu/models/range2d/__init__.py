from .postproc import knn_postprocess
from .salsanext import SalsaNext

__all__ = ["SalsaNext", "knn_postprocess"]
