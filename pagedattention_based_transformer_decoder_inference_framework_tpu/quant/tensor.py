"""INT8 quantization primitives.

Capability parity with the reference's ``attention_cpu/int8_quant.{hpp,cpp}``
and ``decoder/int8_decoder.cpp:43-89`` offline quantizer — with the
reference's signed-max bug fixed (``int8_decoder.cpp:54`` uses max, not
absmax; negative-dominant tensors break there). Scales here are
**per-channel absmax** (SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """INT8 values + f32 scales. ``dequant = values * scales`` (broadcast)."""

    values: jax.Array   # int8
    scales: jax.Array   # f32, broadcastable against values

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


def quantize_per_channel(w: jax.Array, axis: int = -2) -> QTensor:
    """Symmetric absmax INT8 quantization, reducing over the contraction
    axis only (``axis``), i.e. one scale per output channel — and per
    layer for stacked ``[L, in, out]`` weights.
    """
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def quantize_per_row(x: jax.Array) -> QTensor:
    """Dynamic activation quantization: one scale per last-axis row."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def dequantize(q: QTensor, dtype=jnp.float32) -> jax.Array:
    return (q.values.astype(jnp.float32) * q.scales).astype(dtype)
