"""Dense (non-paged) cached attention — the correctness oracle.

Implements the *intended* semantics of the reference's attention stack
(``attention/paged_flash_attention_kernel_fused.cu``,
``attention_cpu/cpu_attention_kernel.cpp``) with the catalogued defects
fixed (SURVEY.md Appendix A): correct causal masking (reference CPU mask
keeps only token 0, ``cpu_attention_kernel.cpp:84-85``), softmax over the
full key range, no top-k/top-p on attention weights (that belongs in the
vocab sampler), GQA support, f32 accumulation.

Used for tests (vs the Pallas paged kernel and vs HF torch models) and
as the XLA fallback attention backend.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def update_dense_cache(k_cache: jax.Array, v_cache: jax.Array,
                       k_new: jax.Array, v_new: jax.Array,
                       positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into a dense cache.

    k_cache/v_cache: ``[B, S_max, KH, D]``; k_new/v_new: ``[B, T, KH, D]``;
    positions: ``[B, T]`` absolute token positions.
    """
    def upd(cache_b, pos_b, new_b):
        return cache_b.at[pos_b].set(new_b)

    k_cache = jax.vmap(upd)(k_cache, positions, k_new.astype(k_cache.dtype))
    v_cache = jax.vmap(upd)(v_cache, positions, v_new.astype(v_cache.dtype))
    return k_cache, v_cache


def dense_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                    positions: jax.Array, kv_lens: jax.Array,
                    scale: float, window: int = 0,
                    softcap: float = 0.0) -> jax.Array:
    """Causal attention of ``q`` against a dense KV cache.

    q: ``[B, T, H, D]`` (new-token queries at ``positions [B, T]``),
    k_cache/v_cache: ``[B, S_max, KH, D]`` already containing the new rows,
    kv_lens: ``[B]`` number of valid cache rows per sequence.
    Mask: key j visible to query at position p iff ``j <= p`` and
    ``j < kv_len`` — and, with ``window > 0`` (sliding-window /
    Mistral-style attention), ``j > p - window``. ``softcap > 0``
    tanh-caps the scaled logits pre-mask (Gemma-2). Returns
    ``[B, T, H, D]``.
    """
    B, T, H, D = q.shape
    S = k_cache.shape[1]
    KH = k_cache.shape[2]
    G = H // KH
    qg = q.reshape(B, T, KH, G, D).astype(jnp.float32)
    k32 = k_cache.astype(jnp.float32)
    v32 = v_cache.astype(jnp.float32)

    scores = jnp.einsum("btkgd,bskd->bktgs", qg, k32) * scale  # [B,KH,T,G,S]
    if softcap > 0:
        scores = softcap * jnp.tanh(scores / softcap)
    key_idx = jnp.arange(S)[None, None, :]                      # [1,1,S]
    visible = (key_idx <= positions[:, :, None]) & (
        key_idx < kv_lens[:, None, None])                       # [B,T,S]
    if window > 0:
        visible &= key_idx > positions[:, :, None] - window
    mask = visible[:, None, :, None, :]                          # [B,1,T,1,S]
    scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bktgs,bskd->btkgd", weights, v32)
    return out.reshape(B, T, H, D).astype(q.dtype)
