from .backends import DenseKVBackend

__all__ = ["DenseKVBackend"]
