from .backends import DenseKVBackend
from .beam import BeamHypothesis, BeamSearcher
from .engine import Engine, EngineState
from .paged_backend import PagedKVBackend
from .router import build_engine, resolve_backend
from .sampling import SampleMode, SamplingParams, filter_logits, sample

__all__ = [
    "BeamHypothesis",
    "BeamSearcher",
    "DenseKVBackend",
    "Engine",
    "EngineState",
    "PagedKVBackend",
    "SampleMode",
    "SamplingParams",
    "build_engine",
    "filter_logits",
    "resolve_backend",
    "sample",
]
