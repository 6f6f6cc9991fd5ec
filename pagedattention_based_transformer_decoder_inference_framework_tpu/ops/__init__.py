from .common import layernorm, rmsnorm, activation_fn, stable_softmax
from .rope import rope_table, apply_rope

__all__ = [
    "layernorm",
    "rmsnorm",
    "activation_fn",
    "stable_softmax",
    "rope_table",
    "apply_rope",
]
