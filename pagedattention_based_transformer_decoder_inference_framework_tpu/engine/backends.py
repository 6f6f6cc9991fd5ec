"""Attention/KV backends injected into the model.

* :class:`DenseKVBackend` — contiguous per-sequence KV cache, pure XLA.
  Serves as the correctness oracle and the fallback path.
* :class:`PagedKVBackend` (``engine/paged_backend.py``) — HBM page pool +
  block tables + Pallas paged-attention kernel; the TPU-native
  re-design of the reference's ``kv_cache/`` + ``attention/`` stack.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention_ref import dense_attention, update_dense_cache
from ..utils.common import jnp_dtype


class DenseKVBackend:
    """Dense KV cache ``[L, B, S_max, KH, D]`` with scatter-append."""

    def __init__(self, cfg: ModelConfig, kv_dtype: str = "bfloat16"):
        self.cfg = cfg
        self.kv_dtype = kv_dtype

    def init_cache(self, batch: int, max_seq: int | None = None):
        cfg = self.cfg
        S = max_seq or cfg.max_seq_len
        shape = (cfg.num_layers, batch, S, cfg.num_kv_heads, cfg.head_dim)
        dt = jnp_dtype(self.kv_dtype)
        return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))

    def attn_fn(self, q, k, v, kv, layer, positions):
        k_full, v_full = kv                     # [L, B, S, KH, D]
        k_cache = jax.lax.dynamic_index_in_dim(k_full, layer, 0, False)
        v_cache = jax.lax.dynamic_index_in_dim(v_full, layer, 0, False)
        k_cache, v_cache = update_dense_cache(k_cache, v_cache, k, v, positions)
        kv_lens = positions[:, -1] + 1
        # per-layer windows (Gemma-2 alternation) need a static layer
        # index, i.e. the unrolled layer loop; under lax.scan the layer
        # is traced, so only a uniform window is representable
        if isinstance(layer, int):
            window = self.cfg.window_for_layer(layer)
        else:
            assert self.cfg.sliding_window_pattern == 1, (
                "per-layer sliding windows require unrolled layers")
            window = self.cfg.sliding_window
        out = dense_attention(q, k_cache, v_cache, positions, kv_lens,
                              self.cfg.attn_scale, window=window,
                              softcap=self.cfg.attn_logit_softcap)
        k_full = jax.lax.dynamic_update_index_in_dim(k_full, k_cache, layer, 0)
        v_full = jax.lax.dynamic_update_index_in_dim(v_full, v_cache, layer, 0)
        return out, (k_full, v_full)
