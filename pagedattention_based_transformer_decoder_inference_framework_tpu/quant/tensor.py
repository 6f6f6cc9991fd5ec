"""INT8 quantization primitives.

Capability parity with the reference's ``attention_cpu/int8_quant.{hpp,cpp}``
and ``decoder/int8_decoder.cpp:43-89`` offline quantizer — with the
reference's signed-max bug fixed (``int8_decoder.cpp:54`` uses max, not
absmax; negative-dominant tensors break there). Scales here are
**per-channel absmax** (SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

import dataclasses as _dataclasses
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


@jax.tree_util.register_pytree_node_class
@_dataclasses.dataclass
class Q4Tensor:
    """INT4 weights, nibble-packed two-per-byte in an int8 carrier, with
    per-(K-group, column) f32 scales.

    ``packed [K, N//2]`` int8 — packed in the *block-local* layout
    :func:`pack_int4` produces for a given ``bn``: carrier column
    ``j*bn/2 + t`` holds the pair ``(w[:, j*bn + t], w[:, j*bn + bn/2 + t])``
    (lo nibble, hi nibble), so a kernel block ``[bk, bn/2]`` unpacks to
    its ``[bk, bn]`` weight block with one lane-concat and no cross-block
    shuffles. ``scales [K//group, N]`` f32. ``group`` and ``bn`` are
    recorded so consumers agree on the layout.

    Why int4 at all: single-chip decode is HBM-bound on weight bytes
    (BENCHMARKS.md round 3 — the chip sustains 740-790 GB/s and int8
    decode sits within ~10% of that floor); halving the bytes is the
    only remaining lever. XLA cannot lower int4 on this backend (native
    s4 convert and 8-bit shifts are both UNIMPLEMENTED), so the unpack
    lives in the Pallas matmul (`ops/int4_matmul.py`), widened through
    int32 (Mosaic legalizes 32-bit shifts/masks, not 8-bit arith).
    """

    packed: jax.Array    # int8 [K, N//2]
    scales: jax.Array    # f32 [K//group, N]
    group: int
    bn: int

    def tree_flatten(self):
        return (self.packed, self.scales), (self.group, self.bn)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        K, Nh = self.packed.shape
        return (K, Nh * 2)

    @property
    def dtype(self):
        return self.packed.dtype


def pack_int4(q4: jax.Array, bn: int) -> jax.Array:
    """Pack int4 values (int8 array in [-8, 7]) ``[K, N]`` into the
    block-local carrier ``[K, N//2]`` for kernel blocks of width ``bn``
    (must divide N; bn even)."""
    K, N = q4.shape
    assert N % bn == 0 and bn % 2 == 0, (N, bn)
    b = q4.reshape(K, N // bn, 2, bn // 2)      # [K, nb, half, bn/2]
    # mixed encoding, chosen for the kernel's float unpack
    # (ops/int4_matmul.py): the LOW nibble is offset-binary (q+8, so
    # lo = nibble - 8 after a mult-sub), the HIGH nibble two's
    # complement (so signed hi == floor(byte/16) directly)
    lo = (b[:, :, 0].astype(jnp.int32) + 8) & 0xF
    hi = b[:, :, 1].astype(jnp.int32) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8).astype(jnp.int8)
    return packed.reshape(K, N // 2)


def unpack_int4(packed: jax.Array, bn: int) -> jax.Array:
    """Inverse of :func:`pack_int4` (host/test use): ``[K, N//2]`` ->
    int8 values in [-8, 7] ``[K, N]``."""
    K, Nh = packed.shape
    N = Nh * 2
    p = packed.astype(jnp.int32) & 0xFF
    lo = (p & 0xF) - 8                          # offset-binary low
    hi = (((p >> 4) & 0xF) ^ 8) - 8             # two's-complement high
    b = jnp.stack([lo, hi], axis=2)             # [K, N/2, (lo|hi)]
    # carrier order is (block j, col t, half h); weights are
    # (block j, half h, col t)
    b = b.reshape(K, N // bn, bn // 2, 2).transpose(0, 1, 3, 2)
    return b.reshape(K, N).astype(jnp.int8)


def quantize_int4_groupwise(w: jax.Array, group: int = 128,
                            bn: int = 2048,
                            col_shards: int = 1) -> Q4Tensor:
    """Symmetric absmax INT4, one scale per (K-group, output column).

    Group-wise scales are what keep 4-bit usable: a per-column absmax
    over the whole K axis (the int8 scheme) lets one outlier crush 15
    levels; 128-row groups bound each scale's dynamic range.

    ``col_shards``: tensor-parallel shard count along N for
    column-parallel weights. Packing is block-local, so as long as
    ``bn`` divides the per-shard width ``N // col_shards`` no pack
    block straddles a shard boundary — the globally-packed carrier
    sharded along its column axis is bit-identical to packing each
    shard locally, and inside ``shard_map`` each device sees a valid
    local ``Q4Tensor`` with the same recorded ``bn``."""
    K, N = w.shape
    group = min(group, K)
    assert K % group == 0, (K, group)
    assert N % col_shards == 0, (N, col_shards)
    n_local = N // col_shards
    # bn must divide the per-shard width (block-local packing) AND bn/2
    # must be lane-aligned (the kernel's carrier block is [bk, bn/2]):
    # largest 256-multiple divisor under the cap — a 128256-column LM
    # head gets 768. Fallback: one shard-wide block (Pallas allows any
    # width).
    cands = [d for d in range(256, min(n_local, bn) + 1, 256)
             if n_local % d == 0]
    if cands:
        bn = max(cands)
    else:
        assert n_local % 2 == 0, n_local
        bn = n_local
    w32 = w.astype(jnp.float32).reshape(K // group, group, N)
    absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / scale), -8, 7)
    q = q.reshape(K, N).astype(jnp.int8)
    return Q4Tensor(pack_int4(q, bn), scale[:, 0, :], group, bn)


def dequantize_int4(q: Q4Tensor, dtype=jnp.float32) -> jax.Array:
    vals = unpack_int4(q.packed, q.bn).astype(jnp.float32)
    K, N = vals.shape
    s = jnp.repeat(q.scales, q.group, axis=0)
    return (vals * s).astype(dtype)
