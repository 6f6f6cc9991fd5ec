"""Shared numeric building blocks (JAX, fused by XLA).

TPU-native equivalents of the reference's kernel utility headers:
normalization (``decoder/layer_norm.hpp:20-37``), activations
(``attention_cpu/vec_cpu.hpp:131-158``), numerically stable softmax
(``attention/warp_softmax.cuh:7-153``, ``attention_cpu/softmax_lut.cpp``).
On TPU these are VPU element-wise ops that XLA fuses into neighboring
matmuls; no hand-written LUTs or warp shuffles are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array,
              eps: float = 1e-5) -> jax.Array:
    """Classic LayerNorm with learned gamma/beta, computed in f32."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)


def rmsnorm(x: jax.Array, scale: jax.Array, eps: float = 1e-5,
            offset: float = 0.0) -> jax.Array:
    """RMSNorm (Llama family). ``offset=1.0`` gives the Gemma variant
    whose learned scale is stored as ``weight - 1`` (zero-init)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (y * (offset + scale.astype(jnp.float32))).astype(dt)


def activation_fn(name: str):
    if name == "relu":
        return lambda x: jnp.maximum(x, 0)
    if name == "gelu":
        # tanh approximation — matches HF GPT-2 "gelu_new"
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name in ("silu", "swiglu"):
        return jax.nn.silu
    raise ValueError(f"unknown activation {name!r}")


def stable_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Max-subtracted softmax in f32 (the capability of ``warp_softmax.cuh``)."""
    x32 = x.astype(jnp.float32)
    m = jnp.max(x32, axis=axis, keepdims=True)
    e = jnp.exp(x32 - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)
