"""Pallas fused INT8 matmul: s8 x s8 -> s32 on the MXU, epilogue fused.

The TPU-native equivalent of the reference's oneDNN INT8 batched matmul
with output scale + broadcast bias + fused ReLU/GELU post-ops
(``attention_cpu/dnnl_matmul_int8.cpp:7-76``): here the epilogue
(per-row activation scale x per-column weight scale rescale, bias,
activation) runs in-register on the accumulator block before a single
bf16 store — no s32 round-trip to HBM.

Blocking: grid ``(M/bm, N/bn, K/bk)`` with the K axis innermost and an
f32 accumulator in VMEM scratch; INT8 tiles respect the (32, 128)
minimum. For decode (M = batch <= 32) the M axis collapses to one
block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.common import cdiv, round_up
from .common import activation_fn


def _kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_scr, *,
            act: Optional[str], has_bias: bool):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        y = acc_scr[...].astype(jnp.float32)
        y = y * xs_ref[...] * ws_ref[...]          # [bm,1] x [1,bn]
        if has_bias:
            y = y + b_ref[...]
        if act is not None:
            y = activation_fn(act)(y)
        o_ref[...] = y.astype(o_ref.dtype)


def _w8_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, acc_scr, *,
               act: Optional[str], has_bias: bool):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # the s8 weight block is widened in-register: HBM traffic stays at
    # one byte per weight (XLA's convert-then-dot materializes bf16)
    acc_scr[:] += jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        y = acc_scr[...] * ws_ref[...]
        if has_bias:
            y = y + b_ref[...]
        if act is not None:
            y = activation_fn(act)(y)
        o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "bm", "bn", "bk", "interpret"))
def w8_matmul(x: jax.Array, wq: jax.Array, w_scale: jax.Array,
              bias: Optional[jax.Array] = None, *,
              act: Optional[str] = None, out_dtype=jnp.bfloat16,
              bm: int = 256, bn: int = 2048, bk: int = 1024,
              interpret: bool = False) -> jax.Array:
    """Weight-only INT8: ``act((x @ dequant(wq)) + bias)`` with the s8
    weight widened inside the kernel (full-precision activations)."""
    M, K = x.shape
    K2, N = wq.shape
    assert K == K2
    bm = min(round_up(M, 8), bm)
    bn = min(round_up(N, 128), bn)
    bk = min(round_up(K, 128), bk)
    Mp, Np, Kp = round_up(M, bm), round_up(N, bn), round_up(K, bk)
    if (Mp, Kp) != (M, K):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        wq = jnp.pad(wq, ((0, Kp - K), (0, Np - N)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, Np - N)),
                          constant_values=1.0)
    has_bias = bias is not None
    b = (jnp.pad(bias.astype(jnp.float32)[None, :], ((0, 0), (0, Np - N)))
         if has_bias else jnp.zeros((1, Np), jnp.float32))

    grid = (Mp // bm, Np // bn, Kp // bk)
    out = pl.pallas_call(
        functools.partial(_w8_kernel, act=act, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, wq, w_scale, b)
    return out[:M, :N]


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "bm", "bn", "bk", "interpret"))
def int8_matmul(xq: jax.Array, x_scale: jax.Array, wq: jax.Array,
                w_scale: jax.Array, bias: Optional[jax.Array] = None, *,
                act: Optional[str] = None, out_dtype=jnp.bfloat16,
                bm: int = 256, bn: int = 2048, bk: int = 1024,
                interpret: bool = False) -> jax.Array:
    """``act((xq @ wq) * x_scale * w_scale + bias)``.

    xq ``[M, K]`` int8, x_scale ``[M, 1]`` f32 (per row);
    wq ``[K, N]`` int8, w_scale ``[1, N]`` f32 (per output channel).
    Returns ``[M, N]`` in ``out_dtype``.
    """
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2

    bm = min(round_up(M, 32), bm)              # int8 sublane tile = 32
    bn = min(round_up(N, 128), bn)
    bk = min(round_up(K, 128), bk)
    Mp, Np, Kp = round_up(M, bm), round_up(N, bn), round_up(K, bk)
    if (Mp, Kp) != (M, K):
        xq = jnp.pad(xq, ((0, Mp - M), (0, Kp - K)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))
    if (Kp, Np) != (K, N):
        wq = jnp.pad(wq, ((0, Kp - K), (0, Np - N)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, Np - N)),
                          constant_values=1.0)
    has_bias = bias is not None
    b = (jnp.pad(bias.astype(jnp.float32)[None, :], ((0, 0), (0, Np - N)))
         if has_bias else jnp.zeros((1, Np), jnp.float32))

    grid = (Mp // bm, Np // bn, Kp // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, act=act, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(xq, wq, x_scale, w_scale, b)
    return out[:M, :N]
