"""Platform detection helpers."""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    d = jax.devices()[0]
    return d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")


def default_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (tests)."""
    return not on_tpu()
