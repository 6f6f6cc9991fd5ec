"""Paged KV attention backend: page pool + block tables + Pallas kernel.

The functional composition of the reference's L0+L1 layers
(``kv_cache/`` + ``attention/``, SURVEY.md §1): the model's attn_fn
appends the new K/V rows into their block-table slots and runs the
Pallas paged flash-attention kernel over the page pool.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..kvcache.pool import PagePool
from ..ops.kv_append import kv_append
from ..ops.paged_attention import (decode_append_supported,
                                   packable_decode, paged_attention,
                                   paged_attention_decode,
                                   paged_attention_decode_append,
                                   paged_attention_decode_grouped,
                                   paged_attention_decode_packed)
from ..utils.platform import default_interpret


class PagedKVBackend:
    def __init__(self, cfg: ModelConfig, cache: CacheConfig,
                 interpret: Optional[bool] = None):
        self.cfg = cfg
        self.cache = cache
        self.pool = PagePool(cfg, cache)
        self.interpret = default_interpret() if interpret is None else interpret

    def init_cache(self):
        return self.pool.init()

    def make_attn_fn(self, block_tables: jax.Array, seq_lens: jax.Array,
                     q_offsets: jax.Array, score_sink: Optional[list] = None,
                     gather_axis: Optional[str] = None):
        """Bind this step's batch plan (block tables / lengths / offsets).

        ``seq_lens`` must already include the tokens being appended in
        this call; ``q_offsets[b]`` is the absolute position of the first
        q token (= previously cached length).

        ``score_sink``: when a list is passed, the kernel additionally
        emits its per-page score export (``paged_attention``'s
        ``return_scores``) and one ``[B, max_pages]`` array per layer is
        appended to the list during tracing (requires the unrolled layer
        loop, the default) — the reference kernel's ``rerank_scores``
        tile export, TPU-style.

        ``gather_axis``: sequence-parallel prefill (SURVEY.md §5.7's
        blockwise decomposition). The caller runs under ``shard_map``
        with query positions split along this mesh axis; the new K/V
        rows (and their positions) are all-gathered over it before the
        paged append so every seq shard appends the identical full
        chunk to its pool replica, then attention runs on the local
        queries only — exact causality via the kernel's absolute
        position masks, 1/sp of the attention+matmul FLOPs per shard.
        """

        def attn_fn(q, k, v, kv, layer, positions):
            if gather_axis is not None:
                k = jax.lax.all_gather(k, gather_axis, axis=1, tiled=True)
                v = jax.lax.all_gather(v, gather_axis, axis=1, tiled=True)
                app_pos = jax.lax.all_gather(positions, gather_axis,
                                             axis=1, tiled=True)
            else:
                app_pos = positions
            # sub-128 head dims: the pool stores lanes padded to 128
            # (PagePool.pool_head_dim) so the fast decode/append paths
            # apply; pad q/k/v here, slice the output back. The zero
            # lanes cancel in QK and produce zeros in AV; the softmax
            # scale below pins 1/sqrt(real_dh).
            dh = q.shape[3]
            dh_pool = self.pool.pool_head_dim
            if dh_pool != dh:
                padw = ((0, 0), (0, 0), (0, 0), (0, dh_pool - dh))
                q = jnp.pad(q, padw)
                k = jnp.pad(k, padw)
                v = jnp.pad(v, padw)
            # padded pools must NOT rescale by 1/sqrt(dh_pool)
            eff_scale = self.cfg.attn_scale
            if eff_scale is None and dh_pool != dh:
                eff_scale = 1.0 / math.sqrt(dh)
            # per-layer windows (Gemma-2 alternation) need the unrolled
            # layer loop's static layer index
            if isinstance(layer, int):
                window = self.cfg.window_for_layer(layer)
            else:
                assert self.cfg.sliding_window_pattern == 1, (
                    "per-layer sliding windows require unrolled layers")
                window = self.cfg.sliding_window
            if (q.shape[1] == 1 and score_sink is None
                    and gather_axis is None
                    and os.environ.get("PBT_FUSED_APPEND") == "1"
                    and decode_append_supported(
                        kv, self.cache.page_size,
                        block_tables.shape[1], dh_pool)):
                # T=1 decode: append + attend as ONE kernel. Measured a
                # WASH in context (8B int8 device 380.8 vs 380.3 tok/s;
                # GPT-2 int8 0.379 vs 0.395 — the single-block all-
                # pages-upfront attention core runs ~3.5 us/call slower
                # than the triple-buffered loop, eating the ~8 us/layer
                # append saving, and the pre-append scales gather
                # breaks pool aliasing for one ~40 us/step copy;
                # BENCHMARKS.md round 5). Env-gated for A/B, off by
                # default.
                out, kv = paged_attention_decode_append(
                    q, kv, k, v, block_tables, seq_lens, app_pos,
                    jnp.asarray(layer, jnp.int32),
                    page_size=self.cache.page_size,
                    num_q_heads=q.shape[2], window=window,
                    softcap=self.cfg.attn_logit_softcap,
                    scale=eff_scale, interpret=self.interpret)
                return out[..., :dh], kv
            kv = kv_append(kv, k, v, layer, app_pos, block_tables,
                           page_size=self.cache.page_size,
                           interpret=self.interpret)
            scales = kv[1] if len(kv) == 2 else None
            # num_q_heads from q itself: under TP (shard_map) the local
            # head count is num_heads / tp, not cfg.num_heads.
            if (q.shape[1] == 1 and score_sink is None
                    and gather_axis is None):
                # decode fast paths (grid programs per page dominate
                # decode cost — BENCHMARKS.md round 3): lane-aligned
                # head_dim streams pages via in-kernel manual DMA,
                # grid (B,); otherwise J block-table pages per program.
                # These kernels assume the lone query IS the newest
                # token (mask = key < seq_len), which holds for every
                # T=1 caller except sequence-parallel prefill shards
                # (gather_axis), whose local chunk can be 1 token at an
                # earlier absolute position — those keep the general
                # kernel's exact q_offsets masking.
                common = dict(
                    layer=layer, page_size=self.cache.page_size,
                    num_q_heads=q.shape[2], window=window,
                    softcap=self.cfg.attn_logit_softcap,
                    scale=eff_scale, interpret=self.interpret)
                # the manual-DMA kernel's int8 path gathers the FULL
                # block-table width of scales into a VMEM block —
                # O(max_pages_per_seq) memory per call. Bound by the
                # actual VMEM bytes (<= 2 MiB leaves room for the
                # triple-buffered KV slabs), not a token count: 32k
                # tokens at 8B geometry (KH=8, page 64), ~21k at GPT-2.
                # Beyond that the grouped kernel streams scales per
                # page at ~4x in-context per-layer cost (BENCHMARKS.md
                # round 4) — the round-4 dispatch cut over at 8192
                # tokens, a silent 4x cliff inside the fast kernel's
                # true envelope (VERDICT r4 Weak / SURVEY §5.7).
                mp_ok = (scales is None
                         or block_tables.shape[1] * 2 * kv[0].shape[2]
                         * self.cache.page_size * 4 <= 2 << 20)
                # NB: paged_attention_decode_batched (whole batch, one
                # grid program) measured WORSE in context (43.8 vs 26.2
                # us/call at GPT-2 — per-DMA-descriptor issue cost on
                # the scalar core exceeds the per-program saving,
                # BENCHMARKS.md round 4); the per-sequence kernel stays
                # the dispatch choice.
                if q.shape[3] % 128 == 0 and mp_ok:
                    out = paged_attention_decode(
                        q, kv[0], block_tables, seq_lens, scales,
                        **common)
                elif packable_decode(self.cache.page_size, q.shape[3]) \
                        and mp_ok:
                    # unpadded sub-128 pool (pad_head_dim=False, the
                    # KV-memory-lean mode): manual DMA of the pool's
                    # packed (page*dh/128, 128) rows — the grouped
                    # kernel's per-program pipeline cost measured 64
                    # us/layer in context (BENCHMARKS.md round 4)
                    out = paged_attention_decode_packed(
                        q, kv[0], block_tables, seq_lens, scales,
                        **common)
                else:
                    out = paged_attention_decode_grouped(
                        q, kv[0], block_tables, seq_lens, scales,
                        **common)
                return out[..., :dh], kv
            out = paged_attention(
                q, kv[0], block_tables, seq_lens,
                q_offsets, scales, layer=layer,
                page_size=self.cache.page_size,
                num_q_heads=q.shape[2],
                window=window,
                softcap=self.cfg.attn_logit_softcap,
                scale=eff_scale,
                return_scores=score_sink is not None,
                interpret=self.interpret)
            if score_sink is not None:
                out, scores = out
                score_sink.append(scores)
            return out[..., :dh], kv

        return attn_fn
