"""Pallas fused INT4-weight matmul: in-kernel nibble unpack + group-wise
dequant, bf16 MXU accumulate.

Why this exists: single-chip decode is HBM-bound on weight bytes and the
INT8 engine already streams within ~10% of the chip's sustained
bandwidth (BENCHMARKS.md round 3) — halving the bytes is the only lever
left. This backend's XLA cannot lower int4 at all (native s4 conversion
AND 8-bit shifts are UNIMPLEMENTED), so the unpack must live inside a
Pallas kernel, widened through int32 (Mosaic legalizes 32-bit
shifts/masks, not 8-bit arithmetic). The unpack + group rescale are VPU
work fully hidden under the halved DMA stream at decode batch sizes.

Numerics: weights are symmetric-absmax INT4 with one f32 scale per
(``group`` K-rows, output column) — group-wise scales are what keep
4-bit usable (``quant/tensor.py:quantize_int4_groupwise``). The scale
is applied to each group's partial product (linearity: scaling the
[bm, bn] result of a group's dot equals scaling its weights, at bm x bn
VPU mults instead of group x bn).

The carrier layout is block-local (``quant/tensor.py:pack_int4``): a
``[bk, bn/2]`` carrier block unpacks to its ``[bk, bn]`` weight block
as ``concat([lo, hi], lanes)`` — no cross-block shuffles. The reference
has no 4-bit path at all; this extends its INT8 intent
(``attention_cpu/int8_quant.hpp``) one level down the byte ladder.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.common import round_up
from .common import activation_fn


def _w4_kernel(x_ref, w_ref, sc_ref, b_ref, o_ref, acc_scr, *,
               act: Optional[str], has_bias: bool, group: int,
               mxu_dtype):
    k = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = x_ref.shape[1]
    half = w_ref.shape[1]                      # bn // 2

    @pl.when(k == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # float unpack — Mosaic legalizes neither 8-bit nor cheap 32-bit
    # integer nibble arithmetic paths, but the signed carrier byte is
    # exactly hi*16 + lo_u (hi signed in [-8,7], lo_u unsigned in
    # [0,15]), so floor(w/16) and a mult-sub recover both nibbles in
    # f32. The low nibble's -8 bias folds into a per-group rowsum
    # correction on the accumulator (linearity), so no per-weight
    # subtraction happens at all.
    wf = w_ref[...].astype(jnp.float32)        # [bk, bn/2]
    hi = jnp.floor(wf * (1.0 / 16.0))          # signed high nibble
    lo_u = wf - hi * 16.0                      # low nibble + 8
    # decode (few rows): operands stay f32 — the MXU is idle either way
    # and two fewer VPU casts matter (the kernel is VPU-bound, not DMA-
    # or MXU-bound). Prefill (many rows): bf16 operands, or the f32 MXU
    # rate dominates.
    if mxu_dtype != jnp.float32:
        hi = hi.astype(mxu_dtype)
        lo_u = lo_u.astype(mxu_dtype)

    x = x_ref[...].astype(mxu_dtype)
    G = bk // group
    for g in range(G):
        xg = x[:, g * group:(g + 1) * group]
        rs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        pl_ = jax.lax.dot_general(
            xg, lo_u[g * group:(g + 1) * group],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        ph = jax.lax.dot_general(
            xg, hi[g * group:(g + 1) * group],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_scr[:, :half] += (pl_ - 8.0 * rs) * sc_ref[g:g + 1, :half]
        acc_scr[:, half:] += ph * sc_ref[g:g + 1, half:]

    @pl.when(k == nk - 1)
    def _():
        y = acc_scr[...]
        if has_bias:
            y = y + b_ref[...]
        if act is not None:
            y = activation_fn(act)(y)
        o_ref[...] = y.astype(o_ref.dtype)


def _pick_bk(K: int, group: int, cap: int = 1024) -> int:
    """Largest multiple of ``group`` that divides K, capped."""
    best = group
    d = group
    while d <= min(K, cap):
        if K % d == 0:
            best = d
        d += group
    return best


@functools.partial(
    jax.jit,
    static_argnames=("group", "bn", "act", "out_dtype", "bm",
                     "interpret"))
def w4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
              bias: Optional[jax.Array] = None, *, group: int, bn: int,
              act: Optional[str] = None, out_dtype=jnp.bfloat16,
              bm: int = 256, interpret: bool = False) -> jax.Array:
    """``act((x @ dequant_int4(packed, scales)) + bias)``.

    x ``[M, K]`` bf16/f32; packed ``[K, N/2]`` int8 carrier in
    :func:`~..quant.tensor.pack_int4`'s block-local layout for ``bn``;
    scales ``[K/group, N]`` f32. ``bn`` must divide N and ``group``
    must divide K (the quantizer guarantees both).
    """
    M, K = x.shape
    K2, Nh = packed.shape
    N = Nh * 2
    assert K == K2 and N % bn == 0 and K % group == 0, (K, N, bn, group)
    bm = min(round_up(M, 8), bm)
    bk = _pick_bk(K, group)
    Mp = round_up(M, bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    has_bias = bias is not None
    b = (bias.astype(jnp.float32)[None, :] if has_bias
         else jnp.zeros((1, N), jnp.float32))

    # per-k-block scale rows, sublane-padded to 8 (TPU block minimum):
    # block k reads rows [k*R, k*R+G) of [nk*R, N]
    G = bk // group
    R = round_up(G, 8)
    nk = K // bk
    sc = scales.reshape(nk, G, N)
    if R != G:
        sc = jnp.pad(sc, ((0, 0), (0, R - G), (0, 0)))
    sc = sc.reshape(nk * R, N)

    mxu_dtype = jnp.float32 if M <= 32 else jnp.bfloat16
    grid = (Mp // bm, N // bn, K // bk)
    out = pl.pallas_call(
        functools.partial(_w4_kernel, act=act, has_bias=has_bias,
                          group=group, mxu_dtype=mxu_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn // 2), lambda i, j, k: (k, j)),
            pl.BlockSpec((R, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * Nh + Mp * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, packed, sc, b)
    return out[:M]
