"""Host-RAM KV page swap (HBM overflow tier).

The TPU-native successor of the reference's host-side tile cache
(``kv_cache/kv_tile_cache_cpu.{hpp,cpp}``): instead of a second lookup
tier on the attention path (hopeless for TPU kernels), the *scheduler*
swaps a preempted request's pages to host RAM and restores them on
re-admission — preemption under page pressure then costs two PCIe
copies instead of a full re-prefill.

``gather_pages``/``scatter_pages`` move ``[L, 2, KH, n_pages, page, d]``
slabs per pool leaf; the scatter donates the pool so XLA updates it in
place.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _gather(kv, pages: jax.Array):
    page_size = kv[0].shape[4]

    def one(leaf):
        if leaf.ndim == 5 and leaf.shape[-1] == 128:
            # flat scales [L, 2, KH, R, 128]: per-slot gather on the
            # flattened slot axis (cold path — swap moves a handful of
            # pages per preemption)
            idx = (pages[:, None] * page_size
                   + jnp.arange(page_size)[None, :]).reshape(-1)
            flat = leaf.reshape(leaf.shape[:3] + (-1,))
            return flat[:, :, :, idx]
        return leaf[:, :, :, pages]

    return tuple(one(leaf) for leaf in kv)


def gather_pages(kv, pages: List[int]) -> Tuple[np.ndarray, ...]:
    """Copy the given pool pages to host (one slab per pool leaf)."""
    dev = _gather(kv, jnp.asarray(pages, jnp.int32))
    return tuple(np.asarray(x) for x in dev)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter(kv, blobs, pages: jax.Array):
    page_size = kv[0].shape[4]

    def one(leaf, blob):
        if leaf.ndim == 5 and leaf.shape[-1] == 128:
            # flat scales: scatter page slots on (row, lane) indices
            idx = (pages[:, None] * page_size
                   + jnp.arange(page_size)[None, :]).reshape(-1)
            return leaf.at[:, :, :, idx // 128, idx % 128].set(
                blob.astype(leaf.dtype))
        return leaf.at[:, :, :, pages].set(blob.astype(leaf.dtype))

    return tuple(one(leaf, blob) for leaf, blob in zip(kv, blobs))


def scatter_pages(kv, blobs: Tuple[np.ndarray, ...], pages: List[int]):
    """Write host slabs back into (new) pool pages; returns updated kv."""
    return _scatter(kv, tuple(jnp.asarray(b) for b in blobs),
                    jnp.asarray(pages, jnp.int32))
