"""Pallas paged flash-attention kernel (prefill + decode).

The TPU-native flagship kernel replacing the reference's fused CUDA pair
(``attention/paged_flash_attention_kernel_fused.cu:5-95`` and the
"overlap" variant ``..._fused_overlap.cu`` — whose *intent* is online
tile-streamed attention; see SURVEY.md Appendix A for why the CUDA code
is not actually flash attention). Design:

* grid ``(batch, page_block)`` with **all KV heads and both K and V
  batched inside one program**: pages for every head of a sequence
  share the same page id and K/V share one pool array, so one grid step
  DMAs the ``[2, KH, page, dh]`` slab in a single block and runs
  KH-batched MXU matmuls — an order of magnitude fewer grid programs
  (and half the DMA descriptors) of a per-(b,h) split-pool launch;
* the page axis is innermost so online-softmax state lives in VMEM
  scratch across page steps; Pallas's pipeline machinery double-buffers
  the HBM->VMEM page DMA against compute (the reference "overlap"
  kernel's intent, done the TPU way);
* KV pages are gathered **by block table through the BlockSpec
  index_map** (scalar-prefetched block tables); past-the-end page steps
  clamp to the last valid page — consecutive identical block indices
  make Pallas elide the copy, so ragged batches do not pay DMA for
  unused pages, and their compute is skipped with ``@pl.when``;
* GQA: q rows are ``(q_token, q_head_in_group)`` pairs per KV head;
* INT8 KV pages are dequantized in-register from per-(token, head)
  scales riding in the same pipeline;
* causal masking by absolute position (``q_offset + t``) — exact, unlike
  the reference (no mask at all on GPU, everything-but-token-0 on CPU).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.common import round_up
from .kv_append import DUMP_PAGE, _tile_rows

import os

# cross-sequence first-page prefetch in the decode kernel: read ONCE at
# import (the flag reaches the kernel at trace time, so flipping the
# env var mid-process would be silently ignored by the jit cache —
# A/B it across processes). Measured neutral at serving depths
# (BENCHMARKS.md round 3); long-context deployments can enable it.
_DECODE_XPREFETCH = os.environ.get("PBT_DECODE_XPREFETCH", "0") == "1"


def _page_scales(kv_scales, layer, block_tables, page_size: int,
                 pooled: bool):
    """Gather per-sequence page scales: ``[2, KH, B*mp, page]``.

    Accepts the FLAT scales pool (``[L, 2, KH, S]`` / ``[2, KH, S]``)
    — flat-slot index math, no padded intermediate — or the legacy
    per-slot mirror (``[..., P, page, 1]``; tests build both)."""
    sc = kv_scales[layer] if pooled else kv_scales
    if sc.shape[-1] == 128 and sc.ndim == 4:   # flat [2, KH, R, 128]
        # slab-row gather (vmapped dynamic_slice of whole rows, then a
        # static window select), NOT a per-slot take: element-indexed
        # gathers lower catastrophically on TPU (8B decode measured
        # 380 -> 219 tok/s device on a flat-take variant)
        KH = sc.shape[1]
        pages = block_tables.reshape(-1)
        rows = max(page_size // 128, 1)

        def one(p):
            return jax.lax.dynamic_slice(
                sc, (0, 0, p * page_size // 128, 0),
                (2, KH, rows, 128))
        g = jax.vmap(one)(pages)                # [N, 2, KH, rows, 128]
        if page_size >= 128:
            g = g.reshape(-1, 2, KH, page_size)
        else:
            # pick the page's lane window by parity
            per = 128 // page_size
            g = g.reshape(-1, 2, KH, per, page_size)
            par = (pages % per)[:, None, None, None, None]
            g = jnp.take_along_axis(g, par, axis=3)[:, :, :, 0]
        return g.transpose(1, 2, 0, 3)          # [2, KH, N, page]
    g = jnp.take(sc, block_tables.reshape(-1), axis=2, fill_value=0)
    return g[..., 0]                               # [2, KH, B*mp, page]



def _attend(q, k, v, m_scr, l_scr, acc_scr, mask, row_valid=None,
            softcap: float = 0.0, sc_k=None, sc_v=None):
    """One online-softmax step over a [KH, page, dh] KV slab.

    ``sc_k``/``sc_v`` ([KH, page] per-token INT8 scales from the FLAT
    scales pool) fold into scores and probs — q.(k*sc) == (q.k)*sc
    exactly for int8 dots, and the page axis rides the LANES of both
    ``s`` and the flat scale slab, so no relayout is paid (the old
    per-slot [..., page, 1] slab dequantized ``kv`` via a lane
    broadcast instead).

    Returns the masked max logit of this slab (scalar) — the kernel's
    per-page score export (see ``return_scores``)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [KH, rows, page]
    if sc_k is not None:
        s = s * sc_k[:, None, :]
    if softcap > 0:                 # Gemma-2 tanh logit capping
        s = softcap * jnp.tanh(s / softcap)
    s = jnp.where(mask, s, -1e30)
    if row_valid is None:
        page_score = None
    else:                                   # exclude padded q rows
        page_score = jnp.max(
            jnp.where(row_valid[None, :, None], s, -1e30))

    m_prev = m_scr[:, :, :1]                           # [KH, rows, 1]
    l_prev = l_scr[:, :, :1]
    m_blk = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_blk)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)
    alpha = jnp.exp(m_prev - m_new)                    # [KH, rows, 1]
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    if sc_v is not None:                # V scales into probs (exact)
        p = p * sc_v[:, None, :]
    pv = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [KH, rows, dh]
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    return page_score


def _kernel(bt_ref, sl_ref, qo_ref, l_ref,     # scalar prefetch (SMEM)
            q_ref, kv_ref,                     # VMEM blocks
            *rest,
            page_size: int, group: int, scale: float, quantized: bool,
            pooled: bool, window: int, softcap: float,
            with_scores: bool, n_rows_live: int, flat_sc: bool = True):
    rest = list(rest)
    sc_ref = rest.pop(0) if quantized else None
    out_ref = rest.pop(0)
    score_ref = rest.pop(0) if with_scores else None
    m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    r = pl.program_id(1)
    i = pl.program_id(2)
    num_blocks = pl.num_programs(2)
    rows = q_ref.shape[2]

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if with_scores:
            score_ref[:] = jnp.full_like(score_ref, -1e30)

    seq_len = sl_ref[b]
    start = i * page_size
    # causal skip: the newest q position this row block can see
    q_pos_max = qo_ref[b] + (r * rows + rows - 1) // group
    live = (start < seq_len) & (start <= q_pos_max)
    if window > 0:
        # sliding-window skip: pages wholly below every row's window
        q_pos_min = qo_ref[b] + (r * rows) // group
        live &= start + page_size > q_pos_min - window + 1

    @pl.when(live)
    def _compute():
        q = q_ref[0].astype(jnp.float32) * scale       # [KH, rows, dh]
        sc_k = sc_v = None
        if quantized and flat_sc:       # gathered (1, 1, 2, KH, page)
            sc_k, sc_v = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
        if pooled:                               # (1, 2, KH, 1, page, d)
            kv = kv_ref[0, :, :, 0].astype(jnp.float32)
            if quantized and not flat_sc:
                kv = kv * sc_ref[0, :, :, 0]
        else:                                    # (2, KH, 1, page, d)
            kv = kv_ref[:, :, 0].astype(jnp.float32)
            if quantized and not flat_sc:
                kv = kv * sc_ref[:, :, 0]
        k, v = kv[0], kv[1]                      # [KH, page, dh]

        key_idx = start + jax.lax.broadcasted_iota(
            jnp.int32, (rows, page_size), 1)
        row_tok = (r * rows + jax.lax.broadcasted_iota(
            jnp.int32, (rows, page_size), 0)) // group
        q_pos = qo_ref[b] + row_tok
        mask = (key_idx <= q_pos) & (key_idx < seq_len)
        if window > 0:
            mask &= key_idx > q_pos - window
        row_valid = None
        if with_scores:
            row_valid = jax.lax.broadcasted_iota(
                jnp.int32, (rows,), 0) < n_rows_live - r * rows
        ps = _attend(q, k, v, m_scr, l_scr, acc_scr, mask[None],
                     row_valid, softcap=softcap, sc_k=sc_k, sc_v=sc_v)
        if with_scores:
            # masked dynamic-lane store (lane i of the resident row)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, score_ref.shape, score_ref.ndim - 1)
            score_ref[:] = jnp.where(lane == i, ps, score_ref[:])

    @pl.when(i == num_blocks - 1)
    def _finalize():
        l = l_scr[:, :, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_scr[:] / l_safe).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "num_q_heads", "window", "softcap",
                     "scale", "return_scores", "interpret"))
def paged_attention(q: jax.Array, kv_pages: jax.Array,
                    block_tables: jax.Array, seq_lens: jax.Array,
                    q_offsets: jax.Array,
                    kv_scales: Optional[jax.Array] = None,
                    layer: Optional[jax.Array] = None, *,
                    page_size: int, num_q_heads: int, window: int = 0,
                    softcap: float = 0.0, scale: Optional[float] = None,
                    return_scores: bool = False,
                    interpret: bool = False):
    """Paged attention over the page pool.

    q:            ``[B, T, H, dh]`` queries for the current chunk
                  (T=1 decode, T=chunk prefill)
    kv_pages:     ``[2, KH, P, page_size, dh]`` (axis 0 = K/V) — or the
                  full multi-layer pool ``[L, 2, KH, P, page_size, dh]``
                  with ``layer`` a traced layer index (no slicing copy:
                  the kernel's index map reads the layer's pages
                  directly from HBM)
    block_tables: ``[B, max_pages]`` int32 physical page ids
    seq_lens:     ``[B]`` int32 — total valid tokens (incl. this chunk)
    q_offsets:    ``[B]`` int32 — absolute position of q token 0
    kv_scales:    per-(token, head) dequant scales for INT8 pools
                  (same layout with trailing dim 1)
    window:       >0: sliding-window attention (key j visible iff
                  ``p - window < j <= p``); pages wholly outside every
                  row's window are skipped, so decode reads at most
                  ``ceil(window/page)+1`` pages regardless of length
    return_scores: also return ``[B, max_pages]`` f32 per-page scores —
                  the max causally-masked scaled QK logit of each page
                  (``-1e30`` for dead/skipped pages), emitted by the
                  kernel itself during the flash pass. The TPU-native
                  form of the reference kernel's per-tile rerank-score
                  export (``paged_flash_attention_kernel_fused.cu:53-55``;
                  there per (batch, tile), written for beam/reranker
                  integration) — here it feeds attention introspection
                  (``utils/debug.py``) and page-importance policies
                  without a dense re-run.
    Returns ``[B, T, H, dh]`` in q.dtype (+ scores if requested).
    """
    B, T, H, dh = q.shape
    pooled = kv_pages.ndim == 6
    if pooled:
        assert layer is not None
        KH, P, page_sz = kv_pages.shape[2:5]
    else:
        KH, P, page_sz = kv_pages.shape[1:4]
    assert page_sz == page_size and H == num_q_heads
    G = H // KH
    total_rows = round_up(max(T * G, 8), 8)
    # block the q rows so VMEM scratch stays bounded for long prefill
    # chunks; per row block, causally unreachable pages are skipped
    row_block = min(256, total_rows)
    rows_pad = round_up(total_rows, row_block)
    R = rows_pad // row_block
    quantized = kv_scales is not None

    # [B, T, H, dh] -> [B, KH, rows, dh] with row = t * G + g
    qr = q.reshape(B, T, KH, G, dh).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(B, KH, T * G, dh)
    if rows_pad != T * G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows_pad - T * G), (0, 0)))

    max_pages = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(dh)

    def page_of(b, i, sl_ref, bt_ref):
        last = jnp.maximum((sl_ref[b] - 1) // page_size, 0)
        return bt_ref[b, jnp.minimum(i, last)]

    # FLAT scales pool ([L, 2, KH, S] / [2, KH, S]): a page is a
    # sub-128 lane window of the slot axis, which no BlockSpec can
    # select — pre-gather per-(sequence, table-slot) page scales (an
    # XLA gather; mp*page*8*KH bytes per call) and pipeline blocks of
    # the GATHERED array, whose trailing dim is full. Legacy per-slot
    # mirrors ([..., page, 1]) keep the old pool-block path (tests).
    flat_sc = quantized and kv_scales.shape[-1] == 128
    if pooled:
        def kv_index_map(b, r, i, bt_ref, sl_ref, qo_ref, l_ref):
            return (l_ref[0], 0, 0, page_of(b, i, sl_ref, bt_ref), 0, 0)

        kv_block = (1, 2, KH, 1, page_size, dh)
        sc_block = (1, 2, KH, 1, page_size, 1)
    else:
        def kv_index_map(b, r, i, bt_ref, sl_ref, qo_ref, l_ref):
            return (0, 0, page_of(b, i, sl_ref, bt_ref), 0, 0)

        kv_block = (2, KH, 1, page_size, dh)
        sc_block = (2, KH, 1, page_size, 1)

    in_specs = [
        pl.BlockSpec((1, KH, row_block, dh),
                     lambda b, r, i, *_: (b, 0, r, 0)),
        pl.BlockSpec(kv_block, kv_index_map),
    ]
    inputs = [qr, kv_pages]
    if quantized and flat_sc:
        g = _page_scales(kv_scales, layer, block_tables, page_size,
                         pooled)
        g = g.transpose(2, 0, 1, 3).reshape(B, max_pages, 2, KH,
                                            page_size)
        in_specs.append(pl.BlockSpec(
            (1, 1, 2, KH, page_size),
            lambda b, r, i, *_: (b, i, 0, 0, 0)))
        inputs.append(g)
    elif quantized:
        in_specs.append(pl.BlockSpec(sc_block, kv_index_map))
        inputs.append(kv_scales)

    out_specs = [pl.BlockSpec((1, KH, row_block, dh),
                              lambda b, r, i, *_: (b, 0, r, 0))]
    out_shapes = [jax.ShapeDtypeStruct((B, KH, rows_pad, dh), q.dtype)]
    if return_scores:
        # resident [1, 1, max_pages] row per (b, r): the page axis is
        # innermost, so the row accumulates one lane per page step and
        # writes back once per row block
        out_specs.append(pl.BlockSpec((1, 1, max_pages),
                                      lambda b, r, i, *_: (b, r, 0)))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, R, max_pages), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, R, max_pages),
        in_specs=in_specs,
        out_specs=out_specs if return_scores else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((KH, row_block, 128), jnp.float32),
            pltpu.VMEM((KH, row_block, 128), jnp.float32),
            pltpu.VMEM((KH, row_block, dh), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _kernel, page_size=page_size, group=G, scale=scale,
        quantized=quantized, pooled=pooled, window=window,
        softcap=softcap, with_scores=return_scores, n_rows_live=T * G,
        flat_sc=flat_sc)

    layer_arr = jnp.asarray(
        [0 if layer is None else layer], jnp.int32).reshape(1)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes if return_scores else out_shapes[0],
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      q_offsets.astype(jnp.int32), layer_arr, *inputs)

    if return_scores:
        out, scores = out
        scores = scores.max(axis=1)                    # [B, max_pages]
    out = out[:, :, :T * G, :].reshape(B, KH, T, G, dh)
    out = out.transpose(0, 2, 1, 3, 4).reshape(B, T, H, dh)
    return (out, scores) if return_scores else out


def _decode_grouped_kernel(bt_ref, sl_ref, l_ref,  # scalar prefetch
                           *refs,
                           page_size: int, scale: float, J: int,
                           quantized: bool, pooled: bool, window: int,
                           softcap: float, flat_sc: bool = True):
    refs = list(refs)
    q_ref = refs.pop(0)
    kv_refs = [refs.pop(0) for _ in range(J)]
    sc_refs = [refs.pop(0) for _ in range(J)] if quantized else None
    out_ref = refs.pop(0)
    m_scr, l_scr, acc_scr = refs
    b = pl.program_id(0)
    g = pl.program_id(1)
    num_groups = pl.num_programs(1)

    @pl.when(g == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    seq_len = sl_ref[b]
    q = q_ref[0].astype(jnp.float32) * scale       # [KH, rows, dh]
    rows = q.shape[1]

    for j in range(J):                             # static unroll
        i = g * J + j
        start = i * page_size
        live = start < seq_len
        if window > 0:
            live &= start + page_size > seq_len - window

        @pl.when(live)
        def _compute(i=i, j=j, start=start):
            sc_k = sc_v = None
            if quantized and flat_sc:   # gathered (1, 1, 2, KH, page)
                sc_k = sc_refs[j][0, 0, 0]
                sc_v = sc_refs[j][0, 0, 1]
            if pooled:
                kv = kv_refs[j][0, :, :, 0].astype(jnp.float32)
                if quantized and not flat_sc:
                    kv = kv * sc_refs[j][0, :, :, 0]
            else:
                kv = kv_refs[j][:, :, 0].astype(jnp.float32)
                if quantized and not flat_sc:
                    kv = kv * sc_refs[j][:, :, 0]
            key_idx = start + jax.lax.broadcasted_iota(
                jnp.int32, (rows, page_size), 1)
            mask = key_idx < seq_len
            if window > 0:
                mask &= key_idx >= seq_len - window
            _attend(q, kv[0], kv[1], m_scr, l_scr, acc_scr,
                    mask[None], softcap=softcap, sc_k=sc_k, sc_v=sc_v)

    @pl.when(g == num_groups - 1)
    def _finalize():
        l = l_scr[:, :, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_scr[:] / l_safe).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "num_q_heads", "window", "softcap",
                     "scale", "group_pages", "interpret"))
def paged_attention_decode_grouped(
        q: jax.Array, kv_pages: jax.Array, block_tables: jax.Array,
        seq_lens: jax.Array, kv_scales: Optional[jax.Array] = None,
        layer: Optional[jax.Array] = None, *, page_size: int,
        num_q_heads: int, window: int = 0, softcap: float = 0.0,
        scale: Optional[float] = None, group_pages: int = 4,
        interpret: bool = False):
    """Decode (T=1) paged attention for models whose head_dim is not
    lane-aligned (dh % 128 != 0 — GPT-2/TinyLlama dh=64, Phi-3 dh=96),
    where :func:`paged_attention_decode`'s manual DMA is illegal.

    Each grid program covers ``group_pages`` pages through J parallel
    BlockSpec inputs whose index maps select consecutive block-table
    entries — J independent pipelined DMA streams per program, so the
    per-program bookkeeping that dominates decode (BENCHMARKS.md round
    3) is paid once per J pages instead of per page. Past-the-end
    entries clamp to the last live page (copy elided) and their compute
    is skipped."""
    B, T, H, dh = q.shape
    assert T == 1
    pooled = kv_pages.ndim == 6
    if pooled:
        assert layer is not None
        KH, P, page_sz = kv_pages.shape[2:5]
    else:
        KH, P, page_sz = kv_pages.shape[1:4]
    assert page_sz == page_size and H == num_q_heads
    G_heads = H // KH
    rows = round_up(max(G_heads, 8), 8)
    quantized = kv_scales is not None
    if scale is None:
        scale = 1.0 / math.sqrt(dh)

    qr = q.reshape(B, KH, G_heads, dh)
    if rows != G_heads:
        qr = jnp.pad(qr,
                     ((0, 0), (0, 0), (0, rows - G_heads), (0, 0)))

    mp = block_tables.shape[1]
    J = max(1, min(group_pages, mp))
    n_groups = (mp + J - 1) // J

    def page_of(b, g, j, sl_ref, bt_ref):
        last = jnp.maximum((sl_ref[b] - 1) // page_size, 0)
        return bt_ref[b, jnp.minimum(g * J + j, last)]

    def kv_map(j):
        if pooled:
            return lambda b, g, bt, sl, l: (
                l[0], 0, 0, page_of(b, g, j, sl, bt), 0, 0)
        return lambda b, g, bt, sl, l: (
            0, 0, page_of(b, g, j, sl, bt), 0, 0)

    # flat scales pool: pre-gather per-(sequence, slot) page scales
    # and pipeline blocks of the gathered array (a page is a sub-128
    # lane window of the flat slot axis, which no BlockSpec can select;
    # legacy per-slot mirrors keep the pool-block path — tests)
    flat_sc = quantized and kv_scales.shape[-1] == 128

    def sc_map(j):
        return lambda b, g, bt, sl, l: (
            b, jnp.minimum(g * J + j, mp - 1), 0, 0, 0)

    kv_block = ((1, 2, KH, 1, page_size, dh) if pooled
                else (2, KH, 1, page_size, dh))
    sc_block = ((1, 2, KH, 1, page_size, 1) if pooled
                else (2, KH, 1, page_size, 1))

    in_specs = [pl.BlockSpec((1, KH, rows, dh),
                             lambda b, g, *_: (b, 0, 0, 0))]
    in_specs += [pl.BlockSpec(kv_block, kv_map(j)) for j in range(J)]
    inputs = [qr] + [kv_pages] * J
    if quantized and flat_sc:
        gsc = _page_scales(kv_scales, layer, block_tables, page_size,
                           pooled)
        gsc = gsc.transpose(2, 0, 1, 3).reshape(B, mp, 2, KH, page_size)
        in_specs += [pl.BlockSpec((1, 1, 2, KH, page_size), sc_map(j))
                     for j in range(J)]
        inputs += [gsc] * J
    elif quantized:
        in_specs += [pl.BlockSpec(sc_block, kv_map(j)) for j in range(J)]
        inputs += [kv_scales] * J

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_groups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KH, rows, dh),
                               lambda b, g, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KH, rows, 128), jnp.float32),
            pltpu.VMEM((KH, rows, 128), jnp.float32),
            pltpu.VMEM((KH, rows, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_grouped_kernel, page_size=page_size, scale=scale, J=J,
        flat_sc=flat_sc,
        quantized=quantized, pooled=pooled, window=window,
        softcap=softcap)
    layer_arr = jnp.asarray(
        [0 if layer is None else layer], jnp.int32).reshape(1)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, rows, dh), q.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      layer_arr, *inputs)

    return out[:, :, :G_heads, :].reshape(B, 1, H, dh)


def _decode_kernel(bt_ref, sl_ref, l_ref,          # scalar prefetch
                   q_ref,                          # VMEM [1, KH, rows, dh]
                   *rest,
                   page_size: int, scale: float, quantized: bool,
                   pooled: bool, window: int, softcap: float,
                   xprefetch: bool = True):
    rest = list(rest)
    kv_hbm = rest.pop(0)
    # per-sequence gathered scales ride a normal VMEM block (manual HBM
    # DMA of the scales pool is illegal: its minor dim is 1 < the 128
    # lane tile); values DMA requires dh % 128 == 0 for the same reason
    sc_ref = rest.pop(0) if quantized else None    # [1, mp, 2, KH, pg]
    out_ref = rest.pop(0)
    kv_buf = rest.pop(0)                           # VMEM [2, 2, KH, pg, dh]
    sem = rest.pop(0)
    b = pl.program_id(0)
    KH, rows, dh = q_ref.shape[1:]

    seq_len = sl_ref[b]
    layer = l_ref[0]
    n_pages = (seq_len + page_size - 1) // page_size

    def first_page(sl):
        if window > 0:
            # decode q position is sl-1: keys > q_pos - window visible
            return jnp.maximum(sl - window, 0) // page_size
        return jnp.int32(0)

    first = first_page(seq_len)

    def kv_dma(slot, b_, i):
        pid = bt_ref[b_, i]
        src = (kv_hbm.at[layer, :, :, pid] if pooled
               else kv_hbm.at[:, :, pid])
        return pltpu.make_async_copy(src, kv_buf.at[slot], sem.at[slot])

    def start(slot, b_, i):
        kv_dma(slot, b_, i).start()

    # program b-1 prefetched this program's first page (see the end of
    # the kernel); only program 0 fetches its own
    @pl.when(b == 0 if xprefetch else b >= 0)
    def _warmup():
        start(jax.lax.rem(first, 3), b, first)

    q = q_ref[0].astype(jnp.float32) * scale       # [KH, rows, dh]

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 3)

        @pl.when(i + 1 < n_pages)
        def _prefetch():
            start(jax.lax.rem(i + 1, 3), b, i + 1)

        kv_dma(slot, b, i).wait()
        kv = kv_buf[slot].astype(jnp.float32)      # [2, KH, pg, dh]
        k, v = kv[0], kv[1]

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [KH, rows, pg]
        if quantized:
            # fold the per-token scales into scores (K) and probs (V)
            # instead of dequantizing the slab: q.(k*sc) == (q.k)*sc
            # exactly (int8 dots are f32-exact), and the [.., pg] ->
            # [.., pg, dh] lane-broadcast relayout this replaces was
            # ~35% of the kernel at GPT-2 (BENCHMARKS.md round 4)
            s = s * sc_ref[0, i, 0][:, None, :]
        if softcap > 0:
            s = softcap * jnp.tanh(s / softcap)
        key_idx = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 2)
        mask = key_idx < seq_len
        if window > 0:
            mask &= key_idx >= seq_len - window
        s = jnp.where(mask, s, -1e30)

        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * sc_ref[0, i, 1][:, None, :]    # V scales into probs
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [KH, rows, dh]
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((KH, rows, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((KH, rows, 1), jnp.float32)
    acc0 = jnp.zeros((KH, rows, dh), jnp.float32)
    _, l, acc = jax.lax.fori_loop(first, n_pages, body, (m0, l0, acc0))

    # cross-program software pipelining: start the NEXT sequence's
    # first-page DMA now, so the weight stream never drains between
    # grid programs. Triple buffering makes the target slot distinct
    # from the two pages this program may still be holding; every DMA
    # issued above has already been waited here.
    if xprefetch:
        @pl.when(b + 1 < pl.num_programs(0))
        def _prefetch_next_seq():
            sl_n = sl_ref[b + 1]
            f_n = first_page(sl_n)
            start(jax.lax.rem(f_n, 3), b + 1, f_n)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out_ref[0] = (acc / l_safe).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "num_q_heads", "window", "softcap",
                     "scale", "interpret"))
def paged_attention_decode(q: jax.Array, kv_pages: jax.Array,
                           block_tables: jax.Array, seq_lens: jax.Array,
                           kv_scales: Optional[jax.Array] = None,
                           layer: Optional[jax.Array] = None, *,
                           page_size: int, num_q_heads: int,
                           window: int = 0, softcap: float = 0.0,
                           scale: Optional[float] = None,
                           interpret: bool = False):
    """Decode-specialized (T=1) paged attention.

    Same math as :func:`paged_attention` at T=1, but the page loop runs
    INSIDE the kernel with manually double-buffered ``make_async_copy``
    DMAs from the HBM pool (grid = ``(B,)``), instead of one pipeline
    grid program per page. At decode the per-page compute is tiny, so
    the general kernel's cost is dominated by per-program pipeline
    bookkeeping (~1 us x B x pages x layers per step — measured 25.6
    us/layer for GPT-2 B=8 vs ~0.5 us of DMA, BENCHMARKS.md); this
    variant pays B programs per call and streams pages back-to-back.
    The q block is the single new token per sequence, so no causal
    masking is needed beyond ``key < seq_len`` (+ sliding window).
    """
    B, T, H, dh = q.shape
    assert T == 1
    assert dh % 128 == 0, "decode kernel needs lane-aligned head_dim"
    pooled = kv_pages.ndim == 6
    if pooled:
        assert layer is not None
        KH, P, page_sz = kv_pages.shape[2:5]
    else:
        KH, P, page_sz = kv_pages.shape[1:4]
    assert page_sz == page_size and H == num_q_heads
    G = H // KH
    rows = round_up(max(G, 8), 8)
    quantized = kv_scales is not None
    if scale is None:
        scale = 1.0 / math.sqrt(dh)

    # [B, 1, H, dh] -> [B, KH, rows, dh], rows = padded q-head group
    qr = q.reshape(B, KH, G, dh)
    if rows != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows - G), (0, 0)))

    mp = block_tables.shape[1]
    in_specs = [
        pl.BlockSpec((1, KH, rows, dh), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [qr, kv_pages]
    # 3 buffers: double buffering within a sequence + a safe slot for
    # the cross-program prefetch of the next sequence's first page
    scratch = [pltpu.VMEM((3, 2, KH, page_size, dh), kv_pages.dtype),
               pltpu.SemaphoreType.DMA((3,))]
    if quantized:
        # gather each sequence's page scales up front (an XLA gather;
        # a few KB per sequence) and pipeline them as a VMEM block
        # (leading-b blocks stay contiguous — a middle-axis-b BlockSpec
        # made the scale DMA strided and cost ~5% at 8B, BENCHMARKS r4)
        g = _page_scales(kv_scales, layer, block_tables, page_size,
                         pooled)
        g = g.transpose(2, 0, 1, 3).reshape(B, mp, 2, KH, page_size)
        in_specs.append(pl.BlockSpec((1, mp, 2, KH, page_size),
                                     lambda b, *_: (b, 0, 0, 0, 0)))
        inputs.append(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KH, rows, dh),
                               lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel, page_size=page_size, scale=scale,
        quantized=quantized, pooled=pooled, window=window,
        softcap=softcap, xprefetch=_DECODE_XPREFETCH)
    layer_arr = jnp.asarray(
        [0 if layer is None else layer], jnp.int32).reshape(1)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, rows, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      layer_arr, *inputs)

    return out[:, :, :G, :].reshape(B, 1, H, dh)


def _decode_batched_kernel(bt_ref, sl_ref, l_ref,  # scalar prefetch
                           q_ref,                  # [B, KH, rows, dh]
                           *rest,
                           page_size: int, scale: float,
                           quantized: bool, window: int, softcap: float,
                           B: int, mp: int):
    """Whole-batch decode attention as ONE grid program: every
    sequence's live-page DMAs are in flight before any wait, so the
    per-program DMA latency chain that dominates grid=(B,) decode at
    small models is paid once per call, not once per sequence
    (see :func:`paged_attention_decode_batched`)."""
    rest = list(rest)
    kv_hbm = rest.pop(0)
    sc_ref = rest.pop(0) if quantized else None    # [2, KH, B, mp, pg]
    out_ref = rest.pop(0)                          # [B, KH, rows, dh]
    kv_buf = rest.pop(0)                           # VMEM [B*mp, 2, KH, pg, dh]
    sem = rest.pop(0)                              # DMA((B*mp,))
    layer = l_ref[0]
    KH, rows, dh = q_ref.shape[1:]

    def n_pages(b):
        return (sl_ref[b] + page_size - 1) // page_size

    def first_page(b):
        if window > 0:
            return jnp.maximum(sl_ref[b] - window, 0) // page_size
        return jnp.int32(0)

    def kv_dma(b, i):
        slot = b * mp + i
        pid = bt_ref[b, i]
        return pltpu.make_async_copy(
            kv_hbm.at[layer, :, :, pid], kv_buf.at[slot], sem.at[slot])

    def live(b, i):
        ok = (i < n_pages(b)) & (jnp.int32(i) >= first_page(b))
        return ok

    for b in range(B):
        for i in range(mp):
            @pl.when(live(b, i))
            def _start(b=b, i=i):
                kv_dma(b, i).start()
    for b in range(B):
        for i in range(mp):
            @pl.when(live(b, i))
            def _wait(b=b, i=i):
                kv_dma(b, i).wait()

    for b in range(B):
        q = q_ref[b].astype(jnp.float32) * scale   # [KH, rows, dh]
        m = jnp.full((KH, rows, 1), -1e30, jnp.float32)
        l = jnp.zeros((KH, rows, 1), jnp.float32)
        acc = jnp.zeros((KH, rows, dh), jnp.float32)
        seq_len = sl_ref[b]
        for i in range(mp):
            kv = kv_buf[b * mp + i].astype(jnp.float32)
            if quantized:
                kv = kv * sc_ref[:, :, b, i][..., None]
            k, v = kv[0], kv[1]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [KH, rows, pg]
            if softcap > 0:
                s = softcap * jnp.tanh(s / softcap)
            key_idx = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 2)
            mask = key_idx < seq_len
            if window > 0:
                mask &= key_idx >= seq_len - window
            # dead pages carry stale VMEM: scores mask to -1e30 and V
            # zeroes per token (0 * garbage-NaN would poison the AV dot
            # for bf16 pools)
            s = jnp.where(mask, s, -1e30)
            tok_idx = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 1)                 # [KH, pg, dh]
            tok_live = tok_idx < seq_len
            if window > 0:
                tok_live &= tok_idx >= seq_len - window
            v = jnp.where(tok_live, v, 0.0)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            m = m_new
            pv = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[b] = (acc / l_safe).astype(out_ref.dtype)


#: VMEM budget for the whole-batch decode buffers (bytes)
_BATCHED_DECODE_VMEM = 8 * 1024 * 1024


def batchable_decode(B: int, mp: int, KH: int, page_size: int,
                     dh_pool: int, itemsize: int) -> bool:
    """True when every sequence's pages fit the whole-batch decode
    kernel's VMEM budget (small models / serving windows)."""
    return (dh_pool % 128 == 0
            and B * mp * 2 * KH * page_size * dh_pool * itemsize
            <= _BATCHED_DECODE_VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "num_q_heads", "window", "softcap",
                     "scale", "interpret"))
def paged_attention_decode_batched(
        q: jax.Array, kv_pages: jax.Array, block_tables: jax.Array,
        seq_lens: jax.Array, kv_scales: Optional[jax.Array] = None,
        layer: Optional[jax.Array] = None, *, page_size: int,
        num_q_heads: int, window: int = 0, softcap: float = 0.0,
        scale: Optional[float] = None, interpret: bool = False):
    """Decode (T=1) paged attention with the WHOLE batch in one grid
    program: all ``B x live_pages`` page DMAs issue before any wait.

    The grid=(B,) manual-DMA kernel serializes its per-sequence DMA
    latency chains across grid programs — measured 26 us/call at GPT-2
    (B=8, 2 live pages) vs 9.5 us at 8B (B=4), i.e. the cost is program
    count, not bytes (BENCHMARKS.md round 4). At small models the whole
    batch's pages fit VMEM (``batchable_decode``), so this kernel pays
    the latency once. Same math, same masks; requires lane-aligned
    (possibly padded) head dim."""
    B, T, H, dh = q.shape
    assert T == 1
    assert dh % 128 == 0
    pooled = kv_pages.ndim == 6
    if pooled:
        assert layer is not None
        KH, P, page_sz = kv_pages.shape[2:5]
    else:
        KH, P, page_sz = kv_pages.shape[1:4]
    assert page_sz == page_size and H == num_q_heads
    G = H // KH
    rows = round_up(max(G, 8), 8)
    quantized = kv_scales is not None
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    mp = block_tables.shape[1]

    qr = q.reshape(B, KH, G, dh)
    if rows != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows - G), (0, 0)))

    in_specs = [
        pl.BlockSpec((B, KH, rows, dh), lambda *_: (0, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [qr, kv_pages if pooled else kv_pages[None]]
    scratch = [pltpu.VMEM((B * mp, 2, KH, page_size, dh),
                          kv_pages.dtype),
               pltpu.SemaphoreType.DMA((B * mp,))]
    if quantized:
        g = _page_scales(kv_scales, layer, block_tables, page_size,
                         pooled)
        g = g.reshape(2, KH, B, mp, page_size)
        in_specs.append(pl.BlockSpec((2, KH, B, mp, page_size),
                                     lambda *_: (0, 0, 0, 0, 0)))
        inputs.append(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, KH, rows, dh),
                               lambda *_: (0, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_batched_kernel, page_size=page_size, scale=scale,
        quantized=quantized, window=window, softcap=softcap, B=B, mp=mp)
    layer_arr = jnp.asarray(
        [0 if layer is None else layer], jnp.int32).reshape(1)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, rows, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      layer_arr, *inputs)

    return out[:, :, :G, :].reshape(B, 1, H, dh)


def _decode_packed_kernel(bt_ref, sl_ref, l_ref,   # scalar prefetch
                          q_ref,                   # [rep, 1, KH, rows, 128]
                          *rest,
                          page_size: int, scale: float, quantized: bool,
                          window: int, softcap: float, dh: int,
                          xprefetch: bool):
    """Manual-DMA decode attention for sub-128 head dims, computed
    ENTIRELY in the pool's packed ``(page*dh/128, 128)`` lane layout —
    no in-kernel relayouts (see :func:`paged_attention_decode_packed`).
    """
    rest = list(rest)
    kv_hbm = rest.pop(0)           # flat view [L, 2, KH, P, R, 128]
    sc_ref = rest.pop(0) if quantized else None  # [1, mp, 2, KH, rep, R]
    out_ref = rest.pop(0)                        # [1, KH, rows, dh]
    kv_buf = rest.pop(0)                         # VMEM [3, 2, KH, R, 128]
    sem = rest.pop(0)
    b = pl.program_id(0)
    rep = 128 // dh
    KH, rows = q_ref.shape[2], q_ref.shape[3]
    R = page_size * dh // 128      # packed rows per page

    seq_len = sl_ref[b]
    layer = l_ref[0]
    n_pages = (seq_len + page_size - 1) // page_size

    def first_page(sl):
        if window > 0:
            return jnp.maximum(sl - window, 0) // page_size
        return jnp.int32(0)

    first = first_page(seq_len)

    def kv_dma(slot, b_, i):
        pid = bt_ref[b_, i]
        return pltpu.make_async_copy(
            kv_hbm.at[layer, :, :, pid], kv_buf.at[slot], sem.at[slot])

    def start(slot, b_, i):
        kv_dma(slot, b_, i).start()

    @pl.when(b == 0 if xprefetch else b >= 0)
    def _warmup():
        start(jax.lax.rem(first, 3), b, first)

    # parity-class queries: q_all[c] has q's dh lanes at [c*dh, (c+1)*dh)
    # and zeros elsewhere, so dot over all 128 lanes contracts exactly
    # token (row*rep + c)'s dh values
    q_all = q_ref[:, 0].astype(jnp.float32) * scale  # [rep, KH, rows, 128]

    def body(i, carry):
        m, l, accs = carry
        slot = jax.lax.rem(i, 3)

        @pl.when(i + 1 < n_pages)
        def _prefetch():
            start(jax.lax.rem(i + 1, 3), b, i + 1)

        kv_dma(slot, b, i).wait()
        kv = kv_buf[slot].astype(jnp.float32)    # [2, KH, R, 128]
        k_slab, v_slab = kv[0], kv[1]
        if quantized:
            sc_blk = sc_ref[0, i]                # [2, KH, rep, R]

        accs_new = []
        for c in range(rep):                     # static unroll
            s = jax.lax.dot_general(
                q_all[c], k_slab, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [KH, rows, R]
            p_scale = None
            if quantized:
                s = s * sc_blk[0, :, c][:, None, :]
                p_scale = sc_blk[1, :, c][:, None, :]
            if softcap > 0:
                s = softcap * jnp.tanh(s / softcap)
            key_idx = i * page_size + rep * jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 2) + c
            mask = key_idx < seq_len
            if window > 0:
                mask &= key_idx >= seq_len - window
            s = jnp.where(mask, s, -1e30)

            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)           # [KH, rows, 1]
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            m = m_new
            if p_scale is not None:              # fold V scales into p
                p = p * p_scale
            pv = jax.lax.dot_general(
                p, v_slab, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [KH, rows, 128]
            # every class's acc rescales by this block's alpha; only
            # lanes [c*dh, (c+1)*dh) of pv are class c's true output —
            # the rest is other-parity garbage sliced away at the end
            accs = tuple(a * alpha for a in accs)
            accs = accs[:c] + (accs[c] + pv,) + accs[c + 1:]
        return m, l, accs

    m0 = jnp.full((KH, rows, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((KH, rows, 1), jnp.float32)
    accs0 = tuple(jnp.zeros((KH, rows, 128), jnp.float32)
                  for _ in range(rep))
    m, l, accs = jax.lax.fori_loop(first, n_pages, body, (m0, l0, accs0))

    if xprefetch:
        @pl.when(b + 1 < pl.num_programs(0))
        def _prefetch_next_seq():
            sl_n = sl_ref[b + 1]
            f_n = first_page(sl_n)
            start(jax.lax.rem(f_n, 3), b + 1, f_n)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = accs[0][:, :, :dh]
    for c in range(1, rep):
        out = out + accs[c][:, :, c * dh:(c + 1) * dh]
    out_ref[0] = (out / l_safe).astype(out_ref.dtype)


def packable_decode(page_size: int, dh: int) -> bool:
    """Sub-128 head dims the packed decode kernel covers: ``dh`` must
    divide the 128-lane row and a page must fill whole packed rows."""
    return dh < 128 and 128 % dh == 0 and (page_size * dh) % 128 == 0


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "num_q_heads", "window", "softcap",
                     "scale", "interpret"))
def paged_attention_decode_packed(
        q: jax.Array, kv_pages: jax.Array, block_tables: jax.Array,
        seq_lens: jax.Array, kv_scales: Optional[jax.Array] = None,
        layer: Optional[jax.Array] = None, *, page_size: int,
        num_q_heads: int, window: int = 0, softcap: float = 0.0,
        scale: Optional[float] = None, interpret: bool = False):
    """Decode (T=1) paged attention for sub-128 head dims (GPT-2 /
    TinyLlama dh=64) via in-kernel manual DMA — the fast decode path
    :func:`paged_attention_decode` cannot take because Mosaic refuses
    DMA slices whose lane extent is below the 128 tile.

    The trick: a page's ``[page, dh]`` int8/bf16 region is contiguous,
    so the pool bitcasts for free into ``[L, 2, KH, P, page*dh/128,
    128]`` whose per-page ``[R, 128]`` slabs ARE manually DMA-able. The
    kernel then never unpacks: each packed row interleaves ``rep =
    128/dh`` tokens, so attention runs as ``rep`` parity-class blocks —
    class ``c`` scores via a query copy whose dh values sit in lanes
    ``[c*dh, (c+1)*dh)`` (zeros elsewhere; the full-row dot contracts
    exactly that token's values), online-softmax over the ``[KH, rows,
    R]`` blocks, V-scales folded into ``p``, and per-class ``[KH, rows,
    128]`` accumulators whose true lanes are sliced and summed once per
    sequence. No relayouts inside the page loop; all dots are
    MXU-shaped (128-lane contractions).

    Replaces the BlockSpec-pipelined grouped kernel on this path, which
    measured 64 us/layer *in context* at GPT-2 (4x its isolated cost —
    per-program pipeline bookkeeping dominates when interleaved with
    the layer's other ops; BENCHMARKS.md round 4). Reference intent:
    ``attention/paged_flash_attention_kernel_fused.cu`` (one fused
    kernel per decode step regardless of head size).
    """
    B, T, H, dh = q.shape
    assert T == 1
    assert packable_decode(page_size, dh)
    pooled = kv_pages.ndim == 6
    if pooled:
        assert layer is not None
        L, _, KH, P = kv_pages.shape[:4]
    else:
        KH, P = kv_pages.shape[1:3]
    assert H == num_q_heads
    G = H // KH
    rows = round_up(max(G, 8), 8)
    rep = 128 // dh
    R = page_size * dh // 128
    quantized = kv_scales is not None
    if scale is None:
        scale = 1.0 / math.sqrt(dh)

    # free bitcast: [.., page, dh] -> [.., R, 128] (row-major tail)
    if pooled:
        kv_flat = kv_pages.reshape(L, 2, KH, P, R, 128)
    else:
        kv_flat = kv_pages.reshape(2, KH, P, R, 128)
        kv_flat = kv_flat[None]
        layer = jnp.int32(0)

    qr = q.reshape(B, KH, G, dh)
    if rows != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows - G), (0, 0)))
    # parity-class query copies [rep, B, KH, rows, 128]
    q_all = jnp.zeros((rep, B, KH, rows, 128), qr.dtype)
    for c in range(rep):
        q_all = jax.lax.dynamic_update_slice(
            q_all, qr[None], (c, 0, 0, 0, c * dh))

    mp = block_tables.shape[1]
    in_specs = [
        pl.BlockSpec((rep, 1, KH, rows, 128),
                     lambda b, *_: (0, b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q_all, kv_flat]
    scratch = [pltpu.VMEM((3, 2, KH, R, 128), kv_pages.dtype),
               pltpu.SemaphoreType.DMA((3,))]
    if quantized:
        # pre-gather each sequence's page scales, parity-split so the
        # kernel indexes class c's [R] scales contiguously
        g = _page_scales(kv_scales, layer, block_tables, page_size,
                         pooled)
        g = g.transpose(2, 0, 1, 3)                # [B*mp, 2, KH, pg]
        g = g.reshape(B, mp, 2, KH, R, rep).transpose(0, 1, 2, 3, 5, 4)
        in_specs.append(pl.BlockSpec((1, mp, 2, KH, rep, R),
                                     lambda b, *_: (b, 0, 0, 0, 0, 0)))
        inputs.append(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KH, rows, dh),
                               lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_packed_kernel, page_size=page_size, scale=scale,
        quantized=quantized, window=window, softcap=softcap, dh=dh,
        xprefetch=_DECODE_XPREFETCH)
    layer_arr = jnp.asarray(
        [0 if layer is None else layer], jnp.int32).reshape(1)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, rows, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      layer_arr, *inputs)

    return out[:, :, :G, :].reshape(B, 1, H, dh)


# -- fused append + attend decode (T=1) --------------------------------------

def _decode_append_kernel(bt_ref, sl_ref, l_ref, pid_ref, slot_ref,
                          q_ref, news_ref, *rest,
                          page_size: int, scale: float, quantized: bool,
                          window: int, softcap: float, vslab_rows: int,
                          sslab_rows: int, B: int):
    rest = list(rest)
    if quantized:
        gsc_ref = rest.pop(0)          # [1, 2, KH, S] old page scales
        nsc_ref = rest.pop(0)          # [B, 2, KH, 1, 1] new scales
        # lane-materialized copy for the slab patch: a (1, 1)->(8, 128)
        # sublane+lane double broadcast of a VMEM tile faults Mosaic at
        # runtime, so the lane dim is broadcast OUTSIDE the kernel
        nscl_ref = rest.pop(0)         # [B, 2, KH, 1, 128]
    # READS go through the input refs, WRITES through the output refs:
    # identical buffers under aliasing, and the interpret debug mode
    # (no aliasing) then still reads real pool data
    kv_in = rest.pop(0)                # values pool HBM (alias of out)
    sc_in = rest.pop(0) if quantized else None
    out_ref = rest.pop(0)
    kv_out = rest.pop(0)               # aliased values pool HBM
    sc_out = rest.pop(0) if quantized else None
    kv_buf = rest.pop(0)               # VMEM [2, KH, S, dh]
    psem = rest.pop(0)                 # DMA (mp,)
    vslab = rest.pop(0)                # VMEM [2, KH, vslab_rows, dh]
    vsem = rest.pop(0)                 # DMA (2,)
    if quantized:
        sslab = rest.pop(0)            # VMEM [2, KH, sslab_rows, 128]
        ssem = rest.pop(0)             # DMA (2,)

    b = pl.program_id(0)
    layer = l_ref[0]
    KH, rows, dh = q_ref.shape[1:]
    S = kv_buf.shape[2]
    mp = S // page_size
    sl_in = sl_ref[b]                  # post-append length
    old = sl_in - 1                    # previously cached tokens
    n_old = (old + page_size - 1) // page_size
    pid_b = pid_ref[b]
    slot_b = slot_ref[b]

    # tail-slab RMW reads ride alongside the page stream
    v0 = (slot_b // vslab_rows) * vslab_rows
    vsrc = kv_in.at[layer, :, :, pid_b, pl.ds(v0, vslab_rows), :]
    vdst = kv_out.at[layer, :, :, pid_b, pl.ds(v0, vslab_rows), :]
    pltpu.make_async_copy(vsrc, vslab, vsem.at[0]).start()
    if quantized and not os.environ.get("PBT_DA_NO_SC_RMW"):
        g_b = pid_b * page_size + slot_b
        r0 = ((g_b // 128) // sslab_rows) * sslab_rows
        ssrc = sc_in.at[layer, :, :, pl.ds(r0, sslab_rows), :]
        sdst = sc_out.at[layer, :, :, pl.ds(r0, sslab_rows), :]
        pltpu.make_async_copy(ssrc, sslab, ssem.at[0]).start()

    # ALL old pages' DMAs in flight at once (no per-page loop/pipeline
    # bookkeeping — at decode the per-page compute is far too small to
    # hide per-iteration scalar-core cost; serving contexts bound
    # S = mp * page so the whole window fits one VMEM buffer)
    def page_dma(i):
        pid = bt_ref[b, i]
        return pltpu.make_async_copy(
            kv_in.at[layer, :, :, pid],
            kv_buf.at[:, :, pl.ds(i * page_size, page_size), :],
            psem.at[i])

    for i in range(mp):
        @pl.when(i < n_old)
        def _start(i=i):
            page_dma(i).start()
    for i in range(mp):
        @pl.when(i < n_old)
        def _wait(i=i):
            page_dma(i).wait()

    q = q_ref[0].astype(jnp.float32) * scale        # [KH, rows, dh]
    k = kv_buf[0].astype(jnp.float32)               # [KH, S, dh]
    v = kv_buf[1].astype(jnp.float32)
    # zero V's invalid rows: their probs are exactly 0, but un-DMA'd
    # buffer garbage could be inf/NaN and 0 * NaN poisons the PV dot
    vmask = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) < old
    v = jnp.where(vmask, v, 0.0)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # [KH, rows, S]
    if quantized:
        s = s * gsc_ref[0, 0][:, None, :]
    if softcap > 0:
        s = softcap * jnp.tanh(s / softcap)
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    mask = key_idx < old
    if window > 0:
        mask &= key_idx >= sl_in - window
    s = jnp.where(mask, s, -1e30)

    # the just-appended token never round-trips through HBM: its score
    # rides the quantized news directly (the pool stores exactly these
    # bytes). Scales fold into kn/vn BEFORE the reductions — a [KH]
    # lane->major relayout of the scale vector is unsupported.
    kn = news_ref[0, 0, :, 0, :].astype(jnp.float32)      # [KH, dh]
    if quantized:
        kn = kn * nsc_ref[b, 0, :, 0, :]                  # [KH, 1]
    sn = jnp.sum(q * kn[:, None, :], axis=-1, keepdims=True)
    if softcap > 0:
        sn = softcap * jnp.tanh(sn / softcap)

    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), sn)
    p = jnp.exp(s - m)
    pn = jnp.exp(sn - m)
    l = jnp.sum(p, axis=-1, keepdims=True) + pn
    if quantized:
        p = p * gsc_ref[0, 1][:, None, :]
    acc = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # [KH, rows, dh]
    vn = news_ref[0, 1, :, 0, :].astype(jnp.float32)
    if quantized:
        vn = vn * nsc_ref[b, 1, :, 0, :]
    acc = acc + pn * vn[:, None, :]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out_ref[0] = (acc / l_safe).astype(out_ref.dtype)

    # append RMW: patch the tail slabs and write back. Write-backs are
    # ordered after this program's page reads (waited above), and rows
    # never share a live tail page (dump-page collisions write
    # attention-masked garbage by design).
    pltpu.make_async_copy(vsrc, vslab, vsem.at[0]).wait()
    io = jax.lax.broadcasted_iota(
        jnp.int32, (2, KH, vslab_rows, dh), 2)
    nv = news_ref[0, :, :, 0, :]                    # [2, KH, dh]
    vslab[...] = jnp.where(io == slot_b - v0, nv[:, :, None, :],
                           vslab[...])
    pltpu.make_async_copy(vslab, vdst, vsem.at[1]).start()
    if quantized and not os.environ.get("PBT_DA_NO_SC_RMW"):
        # the flat scales view spans many pages per 8-sublane slab, so
        # overlapping slabs are patched with EVERY row's token —
        # duplicate or torn write-backs then carry identical bytes
        # (same argument as ops/kv_append._rmw_batch_kernel)
        pltpu.make_async_copy(ssrc, sslab, ssem.at[0]).wait()
        if not os.environ.get("PBT_DA_NO_SC_PATCH"):
            io_r = jax.lax.broadcasted_iota(
                jnp.int32, (2, KH, sslab_rows, 128), 2)
            io_l = jax.lax.broadcasted_iota(
                jnp.int32, (2, KH, sslab_rows, 128), 3)
            acc_s = sslab[...]
            for b2 in range(B):
                g2 = pid_ref[b2] * page_size + slot_ref[b2]
                hit = (io_r == g2 // 128 - r0) & (io_l == g2 % 128)
                acc_s = jnp.where(hit, nscl_ref[b2], acc_s)
            sslab[...] = acc_s
        pltpu.make_async_copy(sslab, sdst, ssem.at[1]).start()
        pltpu.make_async_copy(sslab, sdst, ssem.at[1]).wait()
    pltpu.make_async_copy(vslab, vdst, vsem.at[1]).wait()


def decode_append_supported(kv, page_size: int, mp: int, dh: int) -> bool:
    """Geometry gate for :func:`paged_attention_decode_append`: lane-
    aligned head dim, tile-divisible page, the whole context window in
    one VMEM buffer, and (INT8) a slab-tileable flat scales view."""
    if dh % 128 != 0 or page_size % _tile_rows(kv[0].dtype) != 0:
        return False
    KH = kv[0].shape[2]
    if 2 * KH * mp * page_size * dh * kv[0].dtype.itemsize > 4 << 20:
        return False
    if len(kv) == 2:
        # 8-sublane slab tiling of the flat scales pool, strictly:
        # kv_append's whole-dim slab fallback (R <= 32, not
        # 8-divisible) faults as a dynamic-ds DMA on hardware
        if kv[1].shape[-1] == 128:               # native flat slabs
            R = kv[1].shape[3]
        else:                                    # legacy mirror
            S_pool = kv[1].shape[3] * kv[1].shape[4]
            if S_pool % 128 != 0:
                return False
            R = S_pool // 128
        if R % 8 != 0:
            return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "num_q_heads", "window", "softcap",
                     "scale", "interpret"))
def paged_attention_decode_append(
        q: jax.Array, kv, k_new: jax.Array, v_new: jax.Array,
        block_tables: jax.Array, seq_lens: jax.Array,
        positions: jax.Array, layer: jax.Array, *, page_size: int,
        num_q_heads: int, window: int = 0, softcap: float = 0.0,
        scale: Optional[float] = None, interpret: bool = False):
    """T=1 decode attention with the KV append FUSED into the kernel.

    The split form pays one RMW append program per layer per step just
    to write B rows of K/V (~8 us/layer at GPT-2 — pure fixed cost,
    BENCHMARKS.md round 5); here the tail-slab RMW rides the attention
    kernel's own DMA stream, and the new token's contribution enters
    the softmax directly from VMEM (``kv_cache + attention`` fused the
    way the reference's ``get_write_ptr`` write path and
    ``paged_flash_attention_kernel_fused.cu`` are separate calls).
    Unlike :func:`paged_attention_decode`'s triple-buffered page loop,
    ALL pages stream concurrently into one VMEM buffer and the softmax
    runs single-block — at serving contexts the page loop's
    per-iteration scalar-core cost dominates the tiny per-page compute.

    ``seq_lens`` are POST-append lengths (as the unfused attention
    receives); ``positions [B, 1]`` are the append targets (as
    ``kv_append`` receives). Returns ``(out [B,1,H,dh], kv')``.
    """
    from ..kvcache.pool import stack_new_kv

    B, T, H, dh = q.shape
    assert T == 1
    vals = kv[0]
    quantized = len(kv) == 2
    assert vals.ndim == 6, "decode_append needs the layer-pooled cache"
    if interpret and not os.environ.get("PBT_DA_INTERP_KERNEL"):
        # tests: functional append + the unfused decode kernel over the
        # updated pool — semantically identical (the fused kernel reads
        # the new token's pool-exact bytes from VMEM); pool aliasing
        # has no interpret-mode story (see ops/kv_append.py).
        # PBT_DA_INTERP_KERNEL=1 runs the REAL kernel interpreted
        # (pool outputs are then fresh copies) — debugging only.
        from ..kvcache.pool import append_to_pages_at_layer

        kv2 = append_to_pages_at_layer(kv, k_new, v_new, layer,
                                       positions, block_tables)
        out = paged_attention_decode(
            q, kv2[0], block_tables, seq_lens,
            kv2[1] if quantized else None, layer,
            page_size=page_size, num_q_heads=num_q_heads, window=window,
            softcap=softcap, scale=scale, interpret=True)
        return out, kv2
    KH, P, page_sz = vals.shape[2:5]
    assert page_sz == page_size and H == num_q_heads
    G = H // KH
    rows = round_up(max(G, 8), 8)
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    mp = block_tables.shape[1]
    S = mp * page_size

    news = stack_new_kv(kv, k_new, v_new)
    valid = positions[:, 0] >= 0
    pos = jnp.maximum(positions[:, 0], 0)
    pid = jnp.take_along_axis(block_tables,
                              (pos // page_size)[:, None], axis=1)[:, 0]
    pid = jnp.where(valid, pid, DUMP_PAGE).astype(jnp.int32)
    slot = jnp.where(valid, pos % page_size, 0).astype(jnp.int32)

    qr = q.reshape(B, KH, G, dh)
    if rows != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows - G), (0, 0)))

    vslab_rows = (_tile_rows(vals.dtype)
                  if page_size % _tile_rows(vals.dtype) == 0
                  and page_size > _tile_rows(vals.dtype) else page_size)
    in_specs = [
        pl.BlockSpec((1, KH, rows, dh), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec((1, 2, KH, 1, dh), lambda b, *_: (b, 0, 0, 0, 0)),
    ]
    inputs = [qr, news[0]]
    sslab_rows = 0
    if quantized:
        sc_pool = kv[1]
        if sc_pool.shape[-1] == 128:           # native [L,2,KH,R,128]
            sc_flat = sc_pool
            R = sc_pool.shape[3]
        else:                                  # legacy mirror (tests)
            L2, _, KH2, P2, pg2, _ = sc_pool.shape
            R = P2 * pg2 // 128
            sc_flat = sc_pool.reshape(L2, 2, KH2, R, 128)
        sslab_rows = 8 if R % 8 == 0 and R > 8 else R
        g = _page_scales(kv[1], layer, block_tables, page_size, True)
        g = g.reshape(2, KH, B, S).transpose(2, 0, 1, 3)
        nsc = news[1].astype(jnp.float32)      # [B, 2, KH, 1, 1]
        nscl = jnp.broadcast_to(nsc, (B, 2, KH, 1, 128))
        in_specs += [
            pl.BlockSpec((1, 2, KH, S), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((B, 2, KH, 1, 1), lambda b, *_: (0,) * 5),
            pl.BlockSpec((B, 2, KH, 1, 128), lambda b, *_: (0,) * 5),
        ]
        inputs += [g, nsc, nscl]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(vals)
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(sc_flat)

    out_specs = [
        pl.BlockSpec((1, KH, rows, dh), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, KH, rows, dh), q.dtype),
                 jax.ShapeDtypeStruct(vals.shape, vals.dtype)]
    if quantized:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct(sc_flat.shape,
                                              sc_flat.dtype))

    scratch = [pltpu.VMEM((2, KH, S, dh), vals.dtype),
               pltpu.SemaphoreType.DMA((mp,)),
               pltpu.VMEM((2, KH, vslab_rows, dh), vals.dtype),
               pltpu.SemaphoreType.DMA((2,))]
    if quantized:
        scratch += [pltpu.VMEM((2, KH, sslab_rows, 128), sc_pool.dtype),
                    pltpu.SemaphoreType.DMA((2,))]

    # pool inputs alias pool outputs (in-place append); interpret mode
    # skips aliasing (CPU buffer-allocator interaction — the outputs
    # are then fresh copies, which tests handle fine)
    n_lead = 5 + len(inputs) - (2 if quantized else 1)
    aliases = {} if interpret else {
        n_lead + i: 1 + i for i in range(2 if quantized else 1)}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_append_kernel, page_size=page_size, scale=scale,
        quantized=quantized, window=window, softcap=softcap,
        vslab_rows=vslab_rows, sslab_rows=sslab_rows, B=B)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      layer_arr, pid, slot, *inputs)

    out = outs[0][:, :, :G, :].reshape(B, 1, H, dh)
    if quantized:
        kv2 = (outs[1], outs[2].reshape(kv[1].shape))
    else:
        kv2 = (outs[1],)
    return out, kv2
