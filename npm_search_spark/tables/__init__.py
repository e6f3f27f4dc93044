from .snaptable import SnapTable

__all__ = ["SnapTable"]
