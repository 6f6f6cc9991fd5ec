"""KV-append into the HBM page pool, in place.

The TPU-native replacement for the reference's
``KVTileCache::get_write_ptr`` / ``register_tile`` write path
(``kv_cache/kv_tile_cache.hpp:21-34`` — which the reference never
actually calls from its decode loop, SURVEY.md Appendix A). K and V
share one pool array (axis 1), so every write below touches half the
blocks of a split-pool design. Two paths:

* **page-aligned prefill chunks** — a Pallas kernel whose *output
  BlockSpec* maps each grid step to the target page of the pool
  (gathered through the scalar-prefetched block table); the pool is
  aliased input->output so only the mapped pages are (re)written.
  Mosaic only supports tile-granular DMA, so writes are whole pages;
  slots past a prompt's end carry garbage the attention mask never
  reads, and chunk pages wholly past the prompt are redirected to the
  reserved dump page 0 (``PageAllocator.DUMP_PAGE``).
* **single tokens / ragged chunks** (decode) — per-token
  ``lax.dynamic_update_slice`` on the pool carry: XLA updates donated
  scan carries in place, and DUS has no tile-alignment constraints.
  Invalid positions are redirected to the dump page.

An XLA scatter would be simpler but materializes full pool copies when
the layer index is traced; a page-granular RMW pallas kernel was also
tried (read page block + masked patch + aliased write-back) but passing
the pool both as a pipelined read operand and as the aliased output
forces XLA to copy the whole pool per call — per-token DUS on the carry
wins.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DUMP_PAGE = 0


def _prefill_kernel(pid_ref, layer_ref, *refs, num_pools: int):
    # refs: num_pools new blocks, num_pools aliased pool inputs (unused),
    # num_pools out page blocks. Scale pools are values with d == 1.
    new_refs = refs[:num_pools]
    out_refs = refs[2 * num_pools:3 * num_pools]
    for i in range(num_pools):
        out_refs[i][0, :, :, 0] = new_refs[i][0]


def _append_pages_pallas(kv, news, layer_arr, pid, *, page_size: int,
                         interpret: bool):
    """Page-aligned chunk append: full-page pipelined writes.

    pid: ``[B, n_chunk_pages]`` target page per (seq, chunk page), with
    invalid pages already redirected to DUMP_PAGE.
    """
    num_pools = len(kv)
    B, n_chunk_pages = pid.shape
    KH, page = kv[0].shape[2], kv[0].shape[4]

    def out_map(b, j, pid_ref, l_ref):
        return (l_ref[0], 0, 0, pid_ref[b, j], 0, 0)

    # new blocks [B, 2, KH, T, d]; pool pages [L, 2, KH, P, page, d]
    in_specs = [
        pl.BlockSpec((1, 2, KH, page_size, p.shape[-1]),
                     lambda b, j, *_: (b, 0, 0, j, 0))
        for p in kv
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * num_pools
    out_specs = tuple(
        pl.BlockSpec((1, 2, KH, 1, page, p.shape[-1]), out_map) for p in kv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_chunk_pages),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    # operand order: 2 scalars, num_pools new blocks, num_pools pools
    aliases = {2 + num_pools + i: i for i in range(num_pools)}
    out = pl.pallas_call(
        functools.partial(_prefill_kernel, num_pools=num_pools),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in kv),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pid, layer_arr, *news, *kv)
    return tuple(out)


def _append_tokens_dus(kv, news, layer, pid, slot):
    """Token-wise append via in-place dynamic_update_slice.

    pid/slot: ``[B, T]`` (invalid tokens already point at DUMP_PAGE).
    One DUS covers K and V together (pool axis 1).
    """
    B, T = pid.shape
    outs = list(kv)
    for b in range(B):
        for t in range(T):
            for i, new in enumerate(news):
                upd = new[b, :, :, t][None, :, :, None, None, :]
                idx = (layer, 0, 0, pid[b, t], slot[b, t], 0)
                outs[i] = jax.lax.dynamic_update_slice(
                    outs[i], upd.astype(outs[i].dtype), idx)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def kv_append(kv: Tuple[jax.Array, ...], k_new: jax.Array,
              v_new: jax.Array, layer: jax.Array, positions: jax.Array,
              block_tables: jax.Array, *, page_size: int,
              interpret: bool = False) -> Tuple[jax.Array, ...]:
    """Write ``k_new/v_new [B, T, KH, dh]`` at ``positions [B, T]`` into
    the full pool pytree (leaves ``[L, 2, KH, P, page, d]``) at
    ``layer``. For INT8 pools the new rows are quantized here and the
    per-(token, head) scales ride along.
    """
    from ..kvcache.pool import append_to_pages_at_layer, stack_new_kv

    B, T, KH, dh = k_new.shape
    if interpret:
        # Tests run the functional scatter (interpret-mode aliasing of
        # pallas outputs interacts badly with the CPU buffer allocator;
        # see conftest.py notes).
        return append_to_pages_at_layer(kv, k_new, v_new, layer,
                                        positions, block_tables)

    news = stack_new_kv(kv, k_new, v_new)   # [B, 2, KH, T, d] per pool

    valid = positions >= 0
    pos = jnp.maximum(positions, 0)
    pid = jnp.take_along_axis(block_tables, pos // page_size, axis=1)
    pid = jnp.where(valid, pid, DUMP_PAGE)

    aligned = (T % page_size == 0) and T >= page_size
    if aligned:
        n_chunk_pages = T // page_size
        # page j of the chunk: valid iff any position in it is real
        page_valid = valid.reshape(B, n_chunk_pages, page_size).any(axis=2)
        page_pid = pid.reshape(B, n_chunk_pages, page_size)[:, :, 0]
        page_pid = jnp.where(page_valid, page_pid, DUMP_PAGE)
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
        return _append_pages_pallas(
            kv, news, layer_arr, page_pid.astype(jnp.int32),
            page_size=page_size, interpret=interpret)

    slot = jnp.where(valid, pos % page_size, 0)
    return _append_tokens_dus(kv, news, layer, pid.astype(jnp.int32),
                              slot.astype(jnp.int32))
