from .common import cdiv, round_up, jnp_dtype, tree_size_bytes, Timer

__all__ = ["cdiv", "round_up", "jnp_dtype", "tree_size_bytes", "Timer"]
