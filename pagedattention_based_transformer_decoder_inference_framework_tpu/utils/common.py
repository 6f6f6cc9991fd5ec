"""Small shared helpers."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "int8": jnp.int8,
    "int32": jnp.int32,
}


def jnp_dtype(name: str):
    return _DTYPES[name]


def to_host(x) -> "np.ndarray":
    """Device array -> host numpy, multi-process safe.

    Single-process (even multi-device): plain ``np.asarray``. Under
    multi-controller ``jax.distributed`` some output shards live on
    other hosts — all-gather them first (every process gets the full
    global value; batch-axis sharded outputs tile back together).
    """
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


class Timer:
    """Wall-clock timer that blocks on device work."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
