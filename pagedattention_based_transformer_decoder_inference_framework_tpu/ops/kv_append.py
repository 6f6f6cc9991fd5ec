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
* **single decode tokens** — ONE Pallas RMW program with EVERY
  sequence's and pool's slab DMA in flight at once
  (``_rmw_batch_kernel``; the grid=(B,) form serializes two DMA
  round-trips per sequence per pool): values pools DMA within-page
  sublane slabs of their NATIVE layout; the lane-1 INT8 scales leaf —
  which raw manual DMA cannot slice — rides a lane-packed
  ``(S/128, 128)`` bitcast view (free for the tiny scales leaf;
  reshaping a VALUES pool, even when layout-free, breaks XLA's
  in-place aliasing and copies the pool — measured 3x decode slowdown
  at 8B). Sub-128 head dims (GPT-2/TinyLlama dh=64, Phi-3 dh=96),
  ragged prefill tails and unsupported geometries fall back to
  per-token ``lax.dynamic_update_slice`` on the donated pool carry.
  Invalid positions are redirected to the dump page.

An XLA scatter would be simpler but materializes full pool copies when
the layer index is traced; a *pipelined* page RMW (page block as read
operand + aliased output) also copies the whole pool per call — the
manual-DMA form above is the one that stays in place.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DUMP_PAGE = 0


def _prefill_kernel(pid_ref, layer_ref, *refs, num_pools: int):
    # refs: num_pools new blocks, num_pools aliased pool inputs (unused),
    # num_pools out page blocks (values pools only — FLAT scales leaves
    # take the DUS path in _append_pages_pallas).
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
    B, n_chunk_pages = pid.shape
    KH, page = kv[0].shape[2], kv[0].shape[4]

    # FLAT scales leaves ([L, 2, KH, R, 128]) can't ride the
    # page-mapped BlockSpec (a page is a sub-128 lane window of a slab
    # row for page < 128): write them with a scan of in-place row DUS
    # updates, one per (sequence, chunk page) — lane-merged into the
    # resident row so the neighbouring page's scales survive
    outs_flat = {}
    keep = [i for i, p in enumerate(kv) if p.ndim != 5]
    for i, p in enumerate(kv):
        if p.ndim != 5:
            continue
        KHs = p.shape[2]
        newp = news[i][..., 0]                     # [B, 2, KH, T]
        pid_flat = pid.reshape(-1)
        rows = max(page // 128, 1)
        lanes = jnp.arange(128)

        def body(leaf, bj, newp=newp, pid_flat=pid_flat, KHs=KHs,
                 rows=rows, lanes=lanes):
            b = bj // n_chunk_pages
            j = bj % n_chunk_pages
            g = pid_flat[bj] * page
            seg = jax.lax.dynamic_slice(
                newp, (b, 0, 0, j * page), (1, 2, KHs, page))[0]
            if page < 128:
                row = jax.lax.dynamic_slice(
                    leaf, (layer_arr[0], 0, 0, g // 128, 0),
                    (1, 2, KHs, 1, 128))
                off = g % 128
                seg128 = jnp.pad(seg, ((0, 0), (0, 0),
                                       (0, 128 - page)))
                seg128 = jnp.roll(seg128, off, axis=-1)
                keepm = (lanes >= off) & (lanes < off + page)
                blk = jnp.where(keepm, seg128[None, :, :, None, :],
                                row).astype(leaf.dtype)
            else:
                blk = seg.reshape(2, KHs, rows,
                                  128)[None].astype(leaf.dtype)
            return jax.lax.dynamic_update_slice(
                leaf, blk, (layer_arr[0], 0, 0, g // 128, 0)), None

        out_leaf, _ = jax.lax.scan(body, p,
                                   jnp.arange(B * n_chunk_pages))
        outs_flat[i] = out_leaf
    kv = tuple(kv[i] for i in keep)
    news = tuple(news[i] for i in keep)
    num_pools = len(kv)

    def out_map(b, j, pid_ref, l_ref):
        return (l_ref[0], 0, 0, pid_ref[b, j], 0, 0)

    # new blocks [B, 2, KH, T, d]; pool pages [L, 2, KH, P, page, d]
    in_specs = [
        pl.BlockSpec((1, 2, KH, page_size, p.shape[-1]),
                     lambda b, j, *_: (b, 0, 0, j, 0))
        for p in kv
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * num_pools
    out_specs = tuple(
        pl.BlockSpec((1, 2, KH, 1, page, p.shape[-1]), out_map)
        for p in kv)

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
    merged = []
    it = iter(out)
    for i in range(len(keep) + len(outs_flat)):
        merged.append(outs_flat[i] if i in outs_flat else next(it))
    return tuple(merged)


def _tile_rows(dtype) -> int:
    """Minimum sublane granularity for raw DMA slices of this dtype."""
    return {1: 32, 2: 16, 4: 8}[jnp.dtype(dtype).itemsize]


def _rmw_kernel(pid_ref, slot_ref, layer_ref, *refs, num_pools: int,
                slabs: Tuple[int, ...], page: int, T: int,
                flats: Tuple[bool, ...]):
    # refs: num_pools new blocks (VMEM), num_pools pools (ANY, unused
    # alias donors), num_pools out pools (ANY), then per-pool scratch:
    # num_pools slab buffers + num_pools DMA semaphores.
    # pid_ref/slot_ref: [B, T] — T consecutive-position tokens per
    # sequence (decode: T=1; speculative verify: T=spec_k+1). Tokens are
    # patched one slab RMW at a time; consecutive slots usually share a
    # slab, so the common cost is one slab in+out per crossed slab.
    #
    # flats[i]: pool i is the lane-PACKED view [L, 2, KH, S/128, 128] of
    # a (pages, page, 1) leaf (a free row-major bitcast) — the only way
    # a lane-1 pool (INT8 scales) admits manual DMA: slice 8 sublane
    # rows of 128 lanes and patch element (row, lane) of global slot
    # pid*page + slot. Replaces the per-token dynamic_update_slice
    # fallback that cost ~2% of the decode roofline (BENCHMARKS.md r4).
    new_refs = refs[:num_pools]
    out_refs = refs[2 * num_pools:3 * num_pools]
    slab_refs = refs[3 * num_pools:4 * num_pools]
    sem_refs = refs[4 * num_pools:5 * num_pools]
    b = pl.program_id(0)
    l = layer_ref[0]

    def src_of(i, t):
        rows = slabs[i]
        pid = pid_ref[b, t]
        slot = slot_ref[b, t]
        if flats[i]:
            g = pid * page + slot
            grow = g // 128
            r0 = (grow // rows) * rows
            return (out_refs[i].at[l, :, :, pl.ds(r0, rows), :],
                    grow - r0, g % 128)
        s0 = (slot // rows) * rows
        return (out_refs[i].at[l, :, :, pid, pl.ds(s0, rows), :],
                slot - s0, None)

    def region_of(i, t):
        # scalar id of the slab region token t patches in pool i: two
        # tokens share a VMEM slab iff these ids are equal (same flat
        # row window / same (pid, sublane window))
        rows = slabs[i]
        pid = pid_ref[b, t]
        slot = slot_ref[b, t]
        if flats[i]:
            g = pid * page + slot
            return ((g // 128) // rows) * rows
        return pid * page + (slot // rows) * rows

    # region-cached RMW: a burst's T tokens are CONSECUTIVE positions,
    # so runs of tokens land in the same slab (int8 values: 32-row
    # slabs = 32 tokens/slab; flat f32 scales: 8 rows x 128 lanes =
    # 1024 slots/slab). The slab stays resident in VMEM across such a
    # run and is written back + refetched only when the region id
    # changes (pl.when on scalar-prefetched pid/slot) — ~2 DMA round
    # trips per pool per burst instead of 2*T. The T=9 speculative
    # verify measured ~31 us/layer with the per-token round trips
    # (~32% of the whole draft-verify iteration at TinyLlama,
    # BENCHMARKS.md round 5); region changes always write back BEFORE
    # the next fetch, so HBM is current for any fetch order.
    for t in range(T):
        metas = [src_of(i, t) for i in range(num_pools)]
        if t == 0:
            for i in range(num_pools):
                pltpu.make_async_copy(metas[i][0], slab_refs[i],
                                      sem_refs[i]).start()
            for i in range(num_pools):
                pltpu.make_async_copy(metas[i][0], slab_refs[i],
                                      sem_refs[i]).wait()
        else:
            for i in range(num_pools):
                changed = region_of(i, t) != region_of(i, t - 1)

                @pl.when(changed)
                def _(i=i, t=t, cur=metas[i][0]):
                    prev = src_of(i, t - 1)[0]
                    pltpu.make_async_copy(slab_refs[i], prev,
                                          sem_refs[i]).start()
                    pltpu.make_async_copy(slab_refs[i], prev,
                                          sem_refs[i]).wait()
                    pltpu.make_async_copy(cur, slab_refs[i],
                                          sem_refs[i]).start()
                    pltpu.make_async_copy(cur, slab_refs[i],
                                          sem_refs[i]).wait()
        for i in range(num_pools):
            src, hit_row, hit_lane = metas[i]
            row = new_refs[i][0, :, :, t, :]          # [2, KH, d]
            io_r = jax.lax.broadcasted_iota(
                jnp.int32, slab_refs[i].shape, 2)
            hit = io_r == hit_row
            if hit_lane is not None:
                io_l = jax.lax.broadcasted_iota(
                    jnp.int32, slab_refs[i].shape, 3)
                hit = hit & (io_l == hit_lane)
            slab_refs[i][:] = jnp.where(
                hit, row[:, :, None, :].astype(slab_refs[i].dtype),
                slab_refs[i][:])
    last = [src_of(i, T - 1) for i in range(num_pools)]
    for i in range(num_pools):
        pltpu.make_async_copy(slab_refs[i], last[i][0],
                              sem_refs[i]).start()
    for i in range(num_pools):
        pltpu.make_async_copy(slab_refs[i], last[i][0],
                              sem_refs[i]).wait()


def _rmw_batch_kernel(pid_ref, slot_ref, layer_ref, *refs,
                      num_pools: int, slabs: Tuple[int, ...], page: int,
                      B: int, flats: Tuple[bool, ...]):
    """T=1 decode append as ONE grid program with every sequence's and
    every pool's slab DMA in flight at once — the grid=(B,) form pays
    2 serialized DMA round-trips per sequence per pool (the waits chain
    across sequential grid programs), which dominates the append at 8B
    (BENCHMARKS.md round 4).

    Overlap hazard: two sequences' slabs may cover the same HBM region
    (the flat scales view spans many pages per 8-sublane slab; dump-page
    redirects collide by design). Every slab copy is therefore patched
    with EVERY token that lands inside it, so duplicate write-backs
    carry identical bytes and last-writer-wins is benign."""
    new_refs = refs[:num_pools]
    out_refs = refs[2 * num_pools:3 * num_pools]
    slab_refs = refs[3 * num_pools:4 * num_pools]   # [B, 2, KH, rows, d]
    sem_refs = refs[4 * num_pools:5 * num_pools]    # DMA((B,))
    l = layer_ref[0]

    def meta(i, b):
        rows = slabs[i]
        pid = pid_ref[b, 0]
        slot = slot_ref[b, 0]
        if flats[i]:
            g = pid * page + slot
            r0 = ((g // 128) // rows) * rows
            return out_refs[i].at[l, :, :, pl.ds(r0, rows), :], r0, None
        s0 = (slot // rows) * rows
        return (out_refs[i].at[l, :, :, pid, pl.ds(s0, rows), :], s0,
                pid)

    for i in range(num_pools):
        for b in range(B):
            src, _, _ = meta(i, b)
            pltpu.make_async_copy(src, slab_refs[i].at[b],
                                  sem_refs[i].at[b]).start()
    for i in range(num_pools):
        for b in range(B):
            src, _, _ = meta(i, b)
            pltpu.make_async_copy(src, slab_refs[i].at[b],
                                  sem_refs[i].at[b]).wait()
    for i in range(num_pools):
        for b in range(B):
            src, base, pid_b = meta(i, b)
            acc = slab_refs[i][b]
            io_r = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
            io_l = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 3)
            for b2 in range(B):
                row = new_refs[i][b2, :, :, 0, :]      # [2, KH, d]
                if flats[i]:
                    g2 = pid_ref[b2, 0] * page + slot_ref[b2, 0]
                    hit = ((io_r == g2 // 128 - base)
                           & (io_l == g2 % 128))
                else:
                    hit = ((io_r == slot_ref[b2, 0] - base)
                           & jnp.full(acc.shape,
                                      pid_ref[b2, 0] == pid_b, bool))
                acc = jnp.where(hit, row[:, :, None, :].astype(acc.dtype),
                                acc)
            slab_refs[i][b] = acc
    for i in range(num_pools):
        for b in range(B):
            src, _, _ = meta(i, b)
            pltpu.make_async_copy(slab_refs[i].at[b], src,
                                  sem_refs[i].at[b]).start()
    for i in range(num_pools):
        for b in range(B):
            src, _, _ = meta(i, b)
            pltpu.make_async_copy(slab_refs[i].at[b], src,
                                  sem_refs[i].at[b]).wait()


def _append_tokens_rmw_batch(kv, news, layer_arr, pid, slot, *,
                             page_size: int, interpret: bool,
                             flats: Tuple[bool, ...]):
    """Single-program variant of :func:`_append_tokens_rmw` for T=1."""
    num_pools = len(kv)
    B = pid.shape[0]
    KH, page = kv[0].shape[2], kv[0].shape[4]
    # lane-materialize flat-pool news (see _append_tokens_rmw)
    news = tuple(
        jnp.broadcast_to(n, n.shape[:-1] + (128,)) if flats[i] else n
        for i, n in enumerate(news))

    def slab_rows(i, p):
        t = _tile_rows(p.dtype)
        if flats[i]:
            R = p.shape[-2]
            return t if R % t == 0 and R > t else R
        return t if page % t == 0 and page > t else page

    slabs = tuple(slab_rows(i, p) for i, p in enumerate(kv))
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [
        pl.BlockSpec((B, 2, KH, 1, p.shape[-1]),
                     lambda *_: (0, 0, 0, 0, 0))
        for p in news
    ] + [any_spec] * num_pools
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=in_specs,
        out_specs=tuple(any_spec for _ in kv),
        scratch_shapes=[
            pltpu.VMEM((B, 2, KH, slabs[i], kv[i].shape[-1]),
                       kv[i].dtype)
            for i in range(num_pools)
        ] + [pltpu.SemaphoreType.DMA((B,))] * num_pools,
    )
    aliases = {3 + num_pools + i: i for i in range(num_pools)}
    out = pl.pallas_call(
        functools.partial(_rmw_batch_kernel, num_pools=num_pools,
                          slabs=slabs, page=page, B=B, flats=flats),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(p.shape, p.dtype)
                        for p in kv),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pid, slot, layer_arr, *news, *kv)
    return tuple(out)


def _append_tokens_rmw(kv, news, layer_arr, pid, slot, *, page_size: int,
                       interpret: bool,
                       flats: Optional[Tuple[bool, ...]] = None):
    """Token append as ONE kernel: per sequence, DMA the tile-sized
    sublane slab holding each token's slot out of HBM, patch the row in
    VMEM, DMA it back. Replaces 2*B*T dynamic_update_slice ops per layer
    with a single pallas_call; extra traffic is one slab in+out per
    token (~64 KB bf16), invisible next to the weight stream.

    pid/slot: ``[B, T]`` — T=1 decode; T>1 for the speculative verify
    chunk (consecutive positions, non-page-aligned).

    The pool rides through untouched HBM references (memory_space=HBM
    input aliased to HBM output) — unlike a pipelined-read alias, XLA
    performs no pool copy. (ANY would let the compiler pull a small
    pool into VMEM, where the lane-padded scales leaf [..., page, 1]
    cannot be sliced.)
    """
    num_pools = len(kv)
    flats = flats or (False,) * num_pools
    # flat pools patch a [2, KH, slab, 128] buffer from a lane-1 news
    # row: materialize the lane broadcast OUTSIDE the kernel — a
    # (1, 1) -> (slab, 128) sublane+lane double broadcast of a VMEM
    # tile is unimplemented in Mosaic (caught by the round-5 kernel
    # smoke matrix at KH=4; bench geometries happened to compile)
    news = tuple(
        jnp.broadcast_to(n, n.shape[:-1] + (128,)) if flats[i] else n
        for i, n in enumerate(news))
    B, T = pid.shape
    if T == 1:
        # unified entry: T=1 decode takes the single-program batch
        # kernel (every slab DMA in flight at once)
        return _append_tokens_rmw_batch(
            kv, news, layer_arr, pid, slot, page_size=page_size,
            interpret=interpret, flats=flats)
    KH, page = kv[0].shape[2], kv[0].shape[4]
    def slab_rows(i, p):
        if flats[i]:
            # flat [L, 2, KH, R, 128] view: 8-sublane slabs when they
            # tile R, else the whole dim (no sublane slicing at all)
            R = p.shape[-2]
            t = _tile_rows(p.dtype)
            return t if R % t == 0 and R > t else R
        t = _tile_rows(p.dtype)
        return t if page % t == 0 and page > t else page

    slabs = tuple(slab_rows(i, p) for i, p in enumerate(kv))

    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [
        pl.BlockSpec((1, 2, KH, T, p.shape[-1]),
                     lambda b, *_: (b, 0, 0, 0, 0))
        for p in news
    ] + [any_spec] * num_pools
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=tuple(any_spec for _ in kv),
        scratch_shapes=[
            pltpu.VMEM((2, KH, slabs[i], kv[i].shape[-1]), kv[i].dtype)
            for i in range(num_pools)
        ] + [pltpu.SemaphoreType.DMA] * num_pools,
    )
    aliases = {3 + num_pools + i: i for i in range(num_pools)}
    out = pl.pallas_call(
        functools.partial(_rmw_kernel, num_pools=num_pools, slabs=slabs,
                          page=page, T=T, flats=flats),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in kv),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pid, slot, layer_arr, *news, *kv)
    return tuple(out)


def _append_tokens_dus(kv, news, layer, pid, slot, *, page_size: int):
    """Token-wise append via in-place dynamic_update_slice.

    pid/slot: ``[B, T]`` (invalid tokens already point at DUMP_PAGE).
    One DUS covers K and V together (pool axis 1). The flat scales
    leaf (rank 4) is addressed by flat slot ``pid * page + slot``.
    """
    B, T = pid.shape
    outs = list(kv)
    for b in range(B):
        for t in range(T):
            for i, new in enumerate(news):
                flat = (outs[i].ndim == 5 and outs[i].shape[-1] == 128
                        and new.shape[-1] == 1)
                if flat:                 # native [L, 2, KH, R, 128]
                    g = pid[b, t] * page_size + slot[b, t]
                    upd = new[b, :, :, t, :][None, :, :, None]
                    idx = (layer, 0, 0, g // 128, g % 128)
                else:
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
    # raw DMA requires the lane (head_dim) extent to be 128-aligned —
    # Mosaic cannot slice a lane dim below its 128 tiling even full-dim
    # (PBT_KV_RMW=0 forces the DUS path for A/B benchmarking)
    if (k_new.shape[-1] % 128 == 0
            and os.environ.get("PBT_KV_RMW", "1") == "1"):
        # values via the single RMW kernel (T=1 decode, T>1 speculative
        # verify); the INT8 scales leaf keeps per-token DUS (its lane-1
        # layout cannot be raw-DMA-sliced)
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
        pid32 = pid.astype(jnp.int32)
        slot32 = slot.astype(jnp.int32)

        def rmw(pools, newss, flats_):
            # T=1 (decode): one program, every slab DMA in flight at
            # once; T>1 (speculative verify): sequential per-token RMW
            if T == 1:
                return _append_tokens_rmw_batch(
                    pools, newss, layer_arr, pid32, slot32,
                    page_size=page_size, interpret=interpret,
                    flats=flats_)
            return _append_tokens_rmw(
                pools, newss, layer_arr, pid32, slot32,
                page_size=page_size, interpret=interpret, flats=flats_)

        if len(kv) == 2:
            if os.environ.get("PBT_SKIP_SCALE_DUS") == "1":
                # measurement-only: drops the INT8 scale write (WRONG
                # numerics) to price the per-token scale write in an
                # end-to-end A/B
                vals = rmw((kv[0],), (news[0],), (False,))
                return (vals[0], kv[1])
            native = kv[1].ndim == 5 and kv[1].shape[-1] == 128
            if native:
                # the scales pool is stored NATIVELY as [L, 2, KH, R,
                # 128] slabs (dense — the mirrored [..., page, 1]
                # layout cost 128x lane padding in HBM, and a [.., S]
                # flat form needed a layout-changing reshape per call):
                # zero reshapes, the RMW kernel's exact DMA view
                sc_flat = kv[1]
                R = kv[1].shape[3]
                ok = R % 8 == 0 or R <= 32
            else:                             # legacy mirror (tests)
                L2, _, KH2, P2, pg2, _ = kv[1].shape
                S = P2 * pg2
                R = S // 128
                ok = S % 128 == 0 and (R % 8 == 0 or R <= 32)
                if ok:
                    sc_flat = kv[1].reshape(L2, 2, KH2, R, 128)
            if ok and os.environ.get("PBT_SCALE_RMW", "1") == "1":
                vals, sc_out = rmw((kv[0], sc_flat), news,
                                   (False, True))
                return (vals, sc_out if native
                        else sc_out.reshape(kv[1].shape))
            vals = rmw((kv[0],), (news[0],), (False,))
            scales = _append_tokens_dus(
                (kv[1],), (news[1],), layer, pid32, slot32,
                page_size=page_size)
            return (vals[0], scales[0])
        return rmw((kv[0],), (news[0],), (False,))
    return _append_tokens_dus(kv, news, layer, pid.astype(jnp.int32),
                              slot.astype(jnp.int32),
                              page_size=page_size)
