from .spvcnn import SPVCNN

__all__ = ["SPVCNN"]
