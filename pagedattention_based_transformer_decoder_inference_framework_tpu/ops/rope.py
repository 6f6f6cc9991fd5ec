"""Rotary position embeddings.

Replaces the reference's broken RoPE paths (elementwise multiply in the
GPU kernel, ``attention/paged_flash_attention_kernel_fused.cu:40-41``;
row-0-only on CPU, ``attention_cpu/cpu_attention_kernel.cpp:56-58``) with
the correct pairwise rotation, using a precomputed cos/sin table gathered
by absolute position — HF-Llama "rotate_half" convention so imported
checkpoints match bit-for-bit (within dtype tolerance).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rope_table(max_seq_len: int, head_dim: int, theta: float = 10000.0,
               scaling=None):
    """Return (cos, sin), each ``[max_seq_len, head_dim//2]`` in f32.

    ``scaling``: optional HF-style ``rope_scaling`` dict. Supported
    ``rope_type``s: ``"linear"`` (divide all frequencies by
    ``factor``), ``"llama3"`` (Llama-3.1+ wavelength-banded
    scaling, matching transformers' ``_compute_llama3_parameters``:
    long wavelengths divided by ``factor``, short kept, smooth
    interpolation between ``low_freq_factor``/``high_freq_factor``
    bands of ``original_max_position_embeddings``), and
    ``"longrope"`` (Phi-3: per-dim ``short_factor``/``long_factor``
    frequency divisors + a sqrt-log attention scale on cos/sin —
    transformers' ``_compute_longrope_parameters``). The long/short
    choice is static at table-build time — long iff the serveable
    context (``max_seq_len``) exceeds
    ``original_max_position_embeddings`` (vLLM-style; HF instead
    re-switches per forward call on the running sequence length).
    """
    half = head_dim // 2
    mscale = 1.0
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if scaling:
        kind = scaling.get("rope_type", scaling.get("type", "default"))
        if kind == "linear":
            inv_freq = inv_freq / float(scaling["factor"])
        elif kind == "llama3":
            factor = float(scaling["factor"])
            low = float(scaling["low_freq_factor"])
            high = float(scaling["high_freq_factor"])
            old_len = float(scaling["original_max_position_embeddings"])
            wavelen = 2.0 * jnp.pi / inv_freq
            scaled = jnp.where(wavelen > old_len / low,
                               inv_freq / factor, inv_freq)
            smooth = (old_len / wavelen - low) / (high - low)
            mid = (1.0 - smooth) / factor * inv_freq + smooth * inv_freq
            in_band = ((wavelen >= old_len / high)
                       & (wavelen <= old_len / low))
            inv_freq = jnp.where(in_band, mid, scaled)
        elif kind == "longrope":
            omax = float(scaling["original_max_position_embeddings"])
            mmax = float(scaling.get("max_position_embeddings", omax))
            factors = (scaling["long_factor"] if max_seq_len > omax
                       else scaling["short_factor"])
            f = jnp.asarray(factors, jnp.float32)
            assert f.shape == (half,), (
                f"longrope factor list must have head_dim/2={half} "
                f"entries, got {f.shape}")
            inv_freq = inv_freq / f
            ratio = mmax / omax
            if ratio > 1.0:
                mscale = math.sqrt(1.0 + math.log(ratio)
                                   / math.log(omax))
        elif kind != "default":
            raise ValueError(f"unsupported rope_scaling type: {kind!r}")
    t = jnp.arange(max_seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [S, half]
    return jnp.cos(freqs) * mscale, jnp.sin(freqs) * mscale


def apply_rope(x: jax.Array, positions: jax.Array, cos: jax.Array,
               sin: jax.Array) -> jax.Array:
    """Rotate ``x [..., T, H, D]`` by per-token ``positions [..., T]``.

    rotate_half convention: pairs are ``(x[..., :D/2], x[..., D/2:])``.
    """
    dt = x.dtype
    c = cos[positions].astype(jnp.float32)  # [..., T, D/2]
    s = sin[positions].astype(jnp.float32)
    c = jnp.expand_dims(c, axis=-2)          # broadcast over heads
    s = jnp.expand_dims(s, axis=-2)
    half = x.shape[-1] // 2
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dt)
