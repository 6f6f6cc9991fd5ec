from .mesh import build_mesh, init_distributed
from .multihost import broadcast_scalar, distribute_prompts, is_primary
from .specs import (kv_pspec, pad_vocab, param_pspecs, shard_params,
                    samp_pspecs)

__all__ = [
    "build_mesh", "init_distributed", "param_pspecs", "kv_pspec",
    "pad_vocab", "shard_params", "samp_pspecs",
    "broadcast_scalar", "distribute_prompts", "is_primary",
]
