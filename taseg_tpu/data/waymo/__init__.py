from .reader import WaymoReader

__all__ = ["WaymoReader"]
