"""Device-side paged KV pool + append op.

The HBM-resident equivalent of the reference's pooled K/V buffers
(``kv_cache/kv_tile_cache.cpp:40-44``): one pool per K and V, shaped
``[num_layers, num_pages, page_size, num_kv_heads, head_dim]``, indexed
through per-sequence block tables (``[batch, max_pages_per_seq]`` int32)
— the functional replacement of the device page table
(``kv_cache/page_table.hpp:44-49``). INT8 KV keeps per-(token, head)
absmax scales alongside the pages.

Unlike the reference (where ``register_tile``/``get_write_ptr`` are
never called from the decode path — Appendix A), the decode path here
*actually appends*: :func:`append_to_pages` scatters new K/V rows into
their block-table slots; XLA lowers it to an in-place dynamic scatter
when the pool buffer is donated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils.common import jnp_dtype


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

    def init(self, tp: int = 1, dp: int = 1):
        """Return the KV pytree with leading ``num_layers`` axis.

        Layout ``[L, KH, P, page, dh]``: the page axis sits next to
        head_dim so each (kv_head, page) block is a contiguous
        ``page*dh`` HBM chunk with TPU-friendly ``(page, dh)`` trailing
        tiles (sublane=page, lane=dh) for the Pallas kernel's DMA.

        ``tp``/``dp`` > 1 build the *local* shard (kv-heads / pages
        split) — used when the pool is created inside ``shard_map``.

        bf16/f32: ``(k_pages, v_pages)``.
        int8:      ``(k_pages, v_pages, k_scales, v_scales)`` where scales
                   are ``[L, KH, P, page]`` f32.
        """
        c, cc = self.cfg, self.cache
        shape = (c.num_layers, c.num_kv_heads // tp, cc.num_pages // dp,
                 cc.page_size, c.head_dim)
        if cc.kv_dtype == "int8":
            # trailing singleton keeps the (page, 1) minor dims legal for
            # Mosaic block specs (the last two block dims must divide
            # (8, 128) or equal the array dims)
            sshape = shape[:-1] + (1,)
            return (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                    jnp.zeros(sshape, jnp.float32),
                    jnp.zeros(sshape, jnp.float32))
        dt = jnp_dtype(cc.kv_dtype)
        return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))


def _flat_slot_index(positions: jax.Array, block_tables: jax.Array,
                     page_size: int, num_pages: int) -> jax.Array:
    """Map absolute token positions [B, T] to flat pool rows [B, T].

    Invalid positions (< 0) map out of range so scatter-drop ignores them.
    """
    page_of_pos = positions // page_size
    slot = positions % page_size
    page_id = jnp.take_along_axis(block_tables, page_of_pos, axis=1)
    flat = page_id * page_size + slot
    return jnp.where(positions >= 0, flat, num_pages * page_size)


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) absmax INT8 quantization of ``[B, T, KH, D]``."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def append_to_pages(kv_layer, k_new: jax.Array, v_new: jax.Array,
                    positions: jax.Array, block_tables: jax.Array):
    """Scatter ``k_new/v_new [B, T, KH, D]`` at ``positions [B, T]`` into a
    single layer's page pool (``[KH, P, page, D]``). Returns the updated
    kv_layer pytree."""
    k_pages = kv_layer[0]
    KH, P, page_size = k_pages.shape[:3]
    flat = _flat_slot_index(positions, block_tables, page_size, P)
    flat = flat.reshape(-1)                             # [B*T]

    def scatter(pool, new):
        # pool [KH, P, page, ...] -> [KH, P*page, ...]
        pool_flat = pool.reshape((KH, P * page_size) + pool.shape[3:])
        # new [B, T, KH, ...] -> [KH, B*T, ...]
        new_flat = new.reshape((-1, KH) + new.shape[3:])
        new_flat = jnp.moveaxis(new_flat, 1, 0).astype(pool.dtype)
        pool_flat = pool_flat.at[:, flat].set(new_flat, mode="drop")
        return pool_flat.reshape(pool.shape)

    if len(kv_layer) == 4:  # int8 KV with scales
        k_pages, v_pages, k_scales, v_scales = kv_layer
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        return (scatter(k_pages, kq), scatter(v_pages, vq),
                scatter(k_scales, ks[..., None]),
                scatter(v_scales, vs[..., None]))
    k_pages, v_pages = kv_layer
    return (scatter(k_pages, k_new), scatter(v_pages, v_new))


def append_to_pages_at_layer(kv, k_new: jax.Array, v_new: jax.Array,
                             layer: jax.Array, positions: jax.Array,
                             block_tables: jax.Array):
    """Scatter ``k_new/v_new [B, T, KH, D]`` at ``positions [B, T]`` into
    the FULL pool pytree (leaves ``[L, KH, P, page, ...]``) at ``layer``.

    The pool is a scan carry, so XLA performs this scatter in place —
    no per-layer pool copies (the xs->ys form costs a full pool copy per
    layer per step).
    """
    k_pool = kv[0]
    L, KH, P, page_size = k_pool.shape[:4]
    flat = _flat_slot_index(positions, block_tables, page_size, P)
    flat = flat.reshape(-1)                             # [B*T]

    def scatter(pool, new):
        pool_flat = pool.reshape((L, KH, P * page_size) + pool.shape[4:])
        # NB mixed indexing (scalar, slice, array) puts the advanced
        # axes first: the update is [B*T, KH, ...], not [KH, B*T, ...]
        new_flat = new.reshape((-1, KH) + new.shape[3:]).astype(pool.dtype)
        pool_flat = pool_flat.at[layer, :, flat].set(new_flat, mode="drop")
        return pool_flat.reshape(pool.shape)

    if len(kv) == 4:  # int8 KV with scales
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        return (scatter(kv[0], kq), scatter(kv[1], vq),
                scatter(kv[2], ks[..., None]),
                scatter(kv[3], vs[..., None]))
    return (scatter(kv[0], k_new), scatter(kv[1], v_new))


def gather_kv_dense(kv_layer, block_tables: jax.Array, max_len: int):
    """Debug/oracle helper: materialize dense ``[B, max_len, KH, D]`` K/V
    from pages (dequantizing INT8). Not a hot path."""
    if len(kv_layer) == 4:
        k_pages, v_pages, k_scales, v_scales = kv_layer
        k = k_pages.astype(jnp.float32) * k_scales    # [..., page, 1] bcast
        v = v_pages.astype(jnp.float32) * v_scales
    else:
        k, v = kv_layer
    KH, P, page_size, D = k.shape
    n_pages = -(-max_len // page_size)
    bt = block_tables[:, :n_pages]                     # [B, n]
    kk = k[:, bt]                                      # [KH, B, n, page, D]
    vv = v[:, bt]
    B = bt.shape[0]
    kk = kk.reshape(KH, B, n_pages * page_size, D)[:, :, :max_len]
    vv = vv.reshape(KH, B, n_pages * page_size, D)[:, :, :max_len]
    return (jnp.moveaxis(kk, 0, 2), jnp.moveaxis(vv, 0, 2))
