from .backends import DenseKVBackend
from .paged_backend import PagedKVBackend
from .engine import Engine, EngineState
from .sampling import SamplingParams, sample, filter_logits

__all__ = [
    "DenseKVBackend",
    "PagedKVBackend",
    "Engine",
    "EngineState",
    "SamplingParams",
    "sample",
    "filter_logits",
]
