"""Device-side paged KV pool + append op.

The HBM-resident equivalent of the reference's pooled K/V buffers
(``kv_cache/kv_tile_cache.cpp:40-44``). K and V live in ONE array
``[L, 2, KH, P, page, dh]`` (axis 1 = K/V) so every per-page operation
— appends, attention-kernel DMA, beam COW copies — touches half as many
blocks as split pools; pages are indexed through per-sequence block
tables (``[batch, max_pages_per_seq]`` int32), the functional
replacement of the device page table (``kv_cache/page_table.hpp:44-49``).
INT8 KV keeps per-(token, head) absmax scales in a parallel
``[L, 2, KH, R, 128]`` array (R = ceil(P*page/128); flat slot
``p*page + s`` lives at row ``slot//128``, lane ``slot%128``). This —
not the values-mirroring ``[L, 2, KH, P, page, 1]`` — because XLA lays
a trailing-singleton lane dim out on full (8, 128) tiles: a **128x HBM
expansion** of the scales leaf (9.7 GB of padding at a 32k-context 8B
pool, 1.3 GB even at the batch-4 bench; round-5 OOM dump). The
(R, 128) form is the exact slab view the RMW append kernels DMA, so
the hot path reshapes NOTHING (a [*, S] flat form measured 380 -> 219
tok/s at 8B: its (KH, S)-tiled layout is byte-incompatible with the
kernels' (R, 128) view, and XLA restored it with per-layer pool
copies).

The pages axis is ``-3`` for VALUES pool leaves (page-granular helpers
— COW copies, snapshots — rely on that); the scales leaf addresses
pages through the flat-slot math above.

Unlike the reference (where ``register_tile``/``get_write_ptr`` are
never called from the decode path — SURVEY.md Appendix A), the decode
path here *actually appends* (``ops/kv_append.py``), in place.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils.common import jnp_dtype

PAGES_AXIS = -3          # pages axis of every pool leaf


@dataclasses.dataclass(frozen=True)
class PagePool:
    """Factory/descriptor for paged KV state."""

    cfg: ModelConfig
    cache: CacheConfig

    @property
    def page_size(self) -> int:
        return self.cache.page_size

    @property
    def num_pages(self) -> int:
        return self.cache.num_pages

    @property
    def pool_head_dim(self) -> int:
        """Stored head dim: sub-128 dims lane-pad to the next 128
        multiple by default (``CacheConfig.pad_head_dim``) so the
        manual-DMA decode kernel + slab RMW appends apply; the padding
        lanes are zeros and cancel in every dot."""
        dh = self.cfg.head_dim
        if self.cache.pads(dh):
            return -(-dh // 128) * 128
        return dh

    def init(self, tp: int = 1, dp: int = 1):
        """Return the KV pytree.

        ``tp``/``dp`` > 1 build the *local* shard (kv-heads / pages
        split) — used when the pool is created inside ``shard_map``.

        bf16/f32: ``(kv_pool,)``; int8: ``(kv_pool, kv_scales)``.
        """
        c, cc = self.cfg, self.cache
        shape = (c.num_layers, 2, c.num_kv_heads // tp,
                 cc.num_pages // dp, cc.page_size, self.pool_head_dim)
        if cc.kv_dtype == "int8":
            R = -(-(shape[3] * shape[4]) // 128)
            return (jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape[:3] + (R, 128), jnp.float32))
        return (jnp.zeros(shape, jnp_dtype(cc.kv_dtype)),)


def resize_pool(kv, new_num_pages: int):
    """Grow (or shrink) the pool's pages axis, preserving page contents
    — the reference's ``KVTileCache::resize``
    (``kv_cache/kv_tile_cache.cpp:27-37``, which reallocated + copied).

    Growing pads fresh zero pages after the existing ones (existing page
    ids stay valid); shrinking truncates the tail — the caller must
    guarantee no live page id >= ``new_num_pages`` (the allocator's
    ``num_live`` / page lists make that checkable). Device cost: one
    copy of the pool into the newly allocated buffer.
    """
    page_size = kv[0].shape[4]

    def one(leaf):
        if leaf.ndim == 5 and leaf.shape[-1] == 128:
            # flat scales [L, 2, KH, R, 128]: resize at row granularity
            R_new = -(-(new_num_pages * page_size) // 128)
            R = leaf.shape[3]
            if R_new == R:
                return leaf
            if R_new > R:
                return jnp.pad(
                    leaf, [(0, 0)] * 3 + [(0, R_new - R), (0, 0)])
            return leaf[:, :, :, :R_new]
        P = leaf.shape[PAGES_AXIS]
        if new_num_pages == P:
            return leaf
        ax = leaf.ndim + PAGES_AXIS
        if new_num_pages > P:
            pad = [(0, 0)] * leaf.ndim
            pad[ax] = (0, new_num_pages - P)
            return jnp.pad(leaf, pad)
        idx = [slice(None)] * leaf.ndim
        idx[ax] = slice(0, new_num_pages)
        return leaf[tuple(idx)]

    return tuple(one(leaf) for leaf in kv)


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) absmax INT8 quantization of ``[..., D]``."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def stack_new_kv(kv, k_new: jax.Array, v_new: jax.Array):
    """Stack ``k/v [B, T, KH, dh]`` into pool-shaped updates.

    Returns pool-dtype news: ``(vals [B, 2, KH, T, dh],)`` or for INT8
    ``(vals int8, scales [B, 2, KH, T, 1])``.
    """
    quantized = len(kv) == 2
    new = jnp.stack([k_new, v_new], axis=1)          # [B, 2, T, KH, dh]
    new = jnp.swapaxes(new, 2, 3)                    # [B, 2, KH, T, dh]
    if quantized:
        q, s = quantize_kv(new)
        return (q, s)
    return (new.astype(kv[0].dtype),)


def append_to_pages_at_layer(kv, k_new: jax.Array, v_new: jax.Array,
                             layer: jax.Array, positions: jax.Array,
                             block_tables: jax.Array):
    """Functional scatter append (interpret-mode/test path).

    ``k_new/v_new [B, T, KH, D]`` at ``positions [B, T]`` into the full
    pool pytree at ``layer``.
    """
    pool = kv[0]
    L, _, KH, P, page_size = pool.shape[:5]
    pos = positions
    page_id = jnp.take_along_axis(block_tables,
                                  jnp.maximum(pos, 0) // page_size, axis=1)
    flat = page_id * page_size + jnp.maximum(pos, 0) % page_size
    flat = jnp.where(pos >= 0, flat, P * page_size).reshape(-1)   # [B*T]

    news = stack_new_kv(kv, k_new, v_new)

    def scatter(pool, new):
        if pool.ndim == 5 and pool.shape[-1] == 128:
            # flat scales leaf [L, 2, KH, R, 128]; new [B, 2, KH, T, 1]
            new_flat = jnp.moveaxis(new[..., 0], 3, 1).reshape(
                (-1,) + new.shape[1:3])
            return pool.at[layer, :, :, flat // 128, flat % 128].set(
                new_flat.astype(pool.dtype), mode="drop")
        # pool [L, 2, KH, P, page, d] -> [L, 2, KH, P*page, d]
        pool_flat = pool.reshape(pool.shape[:3] + (P * page_size,)
                                 + pool.shape[5:])
        # new [B, 2, KH, T, d] -> [B*T, 2, KH, d] rows keyed by flat;
        # mixed indexing (scalar, :, :, array) puts advanced axes first
        new_flat = jnp.moveaxis(new, 3, 1).reshape(
            (-1,) + new.shape[1:3] + new.shape[4:])
        pool_flat = pool_flat.at[layer, :, :, flat].set(
            new_flat.astype(pool.dtype), mode="drop")
        return pool_flat.reshape(pool.shape)

    return tuple(scatter(p, n) for p, n in zip(kv, news))


def gather_kv_dense(kv_layer, block_tables: jax.Array, max_len: int):
    """Debug/oracle helper: materialize dense ``[B, max_len, KH, D]`` K/V
    from a single layer's pages ``[2, KH, P, page, d]`` (dequantizing
    INT8; flat scales leaf reshaped to per-slot). Not a hot path."""
    if len(kv_layer) == 2:
        vals = kv_layer[0]                # [2, KH, P, page, dh]
        S = vals.shape[2] * vals.shape[3]
        sc = kv_layer[1].reshape(
            kv_layer[1].shape[:2] + (-1,))[:, :, :S]
        kv = vals.astype(jnp.float32) * sc.reshape(vals.shape[:-1]
                                                   + (1,))
    else:
        kv = kv_layer[0]
    _, KH, P, page_size, D = kv.shape
    n_pages = -(-max_len // page_size)
    bt = block_tables[:, :n_pages]                     # [B, n]
    g = kv[:, :, bt]                                   # [2, KH, B, n, page, D]
    B = bt.shape[0]
    g = g.reshape(2, KH, B, n_pages * page_size, D)[:, :, :, :max_len]
    g = jnp.moveaxis(g, (0, 1, 2, 3), (0, 3, 1, 2))    # [2, B, max_len, KH, D]
    return g[0], g[1]


def copy_pages_tree(kv, src, dst):
    """Device copy of pool pages ``src[i] -> dst[i]`` on every leaf
    (values + scales) — the beam-search COW primitive, shared by the
    fused expansion step and the standalone copy program so the pool
    layout is encoded once."""
    import jax

    page_size = kv[0].shape[4]

    def copy_leaf(leaf):
        if leaf.ndim == 5 and leaf.shape[-1] == 128:
            # flat scales [L, 2, KH, R, 128]: page p is a page_size-lane
            # window of row p*page//128 (page_size divides 128 or is a
            # multiple of it for every supported config)
            rows = max(page_size // 128, 1)

            def body(leaf, i):
                s, d = src[i] * page_size, dst[i] * page_size
                blk = jax.lax.dynamic_slice(
                    leaf, (0, 0, 0, s // 128, 0),
                    leaf.shape[:3] + (rows, 128))
                if page_size < 128:
                    dstrow = jax.lax.dynamic_slice(
                        leaf, (0, 0, 0, d // 128, 0),
                        leaf.shape[:3] + (1, 128))
                    rolled = jnp.roll(blk, d % 128 - s % 128, axis=-1)
                    lanes = jnp.arange(128)
                    keep = ((lanes >= d % 128)
                            & (lanes < d % 128 + page_size))
                    blk = jnp.where(keep, rolled, dstrow)
                return jax.lax.dynamic_update_slice(
                    leaf, blk, (0, 0, 0, d // 128, 0)), None

            leaf, _ = jax.lax.scan(body, leaf, jnp.arange(src.shape[0]))
            return leaf
        ax = leaf.ndim - 3                    # PAGES_AXIS in leaf terms

        def body(leaf, i):
            s, d = src[i], dst[i]
            sizes = leaf.shape[:ax] + (1,) + leaf.shape[ax + 1:]
            start = (0,) * ax + (s,) + (0,) * (leaf.ndim - ax - 1)
            page = jax.lax.dynamic_slice(leaf, start, sizes)
            dstart = (0,) * ax + (d,) + (0,) * (leaf.ndim - ax - 1)
            return jax.lax.dynamic_update_slice(leaf, page, dstart), None

        leaf, _ = jax.lax.scan(body, leaf, jnp.arange(src.shape[0]))
        return leaf

    return tuple(copy_leaf(leaf) for leaf in kv)
