"""Grouped matmul (megablox-style ``gmm``) for exact MoE dispatch.

``y[i] = x[i] @ w[group_of(i)]`` over row blocks whose group ids ride a
scalar-prefetched table: the TPU answer to ragged per-expert matmuls.
Rows are pre-sorted by expert and each expert's range is padded to a
row-block multiple (pure-jnp layout built in ``models/model.py``), so
the kernel is dense per block — no dropping, no capacity factor, exact
token->expert routing (unlike GShard-style capacity dispatch).

Grid is ``(row_blocks, N/bn, K/bk)`` with K innermost: each row block
streams its expert's weights once. Dense rows-per-expert >= bm keeps
that stream amortized; for tiny per-expert loads the masked dense loop
in ``models/model.py:_moe`` is the better shape (it streams each
expert's weights exactly once regardless), which is why the model only
dispatches here above a row-count threshold.

INT8 ``QTensor`` expert weights (``values [E, K, N]``, ``scales
[E, 1, N]``) are widened in-register like ``ops/int8_matmul.w8_matmul``.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.tensor import QTensor
from ..utils.common import round_up


def _kernel(gb_ref, x_ref, w_ref, ws_ref, o_ref, acc, *,
            quantized: bool):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        y = acc[...]
        if quantized:
            y = y * ws_ref[0]
        o_ref[...] = y.astype(o_ref.dtype)


def _pick_block(dim: int, cap: int) -> int:
    for b in (cap, 1024, 512, 256, 128):
        if b <= cap and dim % b == 0:
            return b
    return min(cap, round_up(dim, 128))


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def grouped_matmul(x: jax.Array, w: Union[jax.Array, QTensor],
                   group_of_block: jax.Array, *, bm: int = 256,
                   bn: int = 0, bk: int = 0,
                   interpret: bool = False) -> jax.Array:
    """``x [Npad, K]`` (rows grouped, group ranges bm-aligned),
    ``w [E, K, N]`` dense or QTensor, ``group_of_block [Npad//bm]``
    int32. Returns ``[Npad, N]``."""
    quantized = isinstance(w, QTensor)
    wv = w.values if quantized else w
    E, K, N = wv.shape
    Npad = x.shape[0]
    assert Npad % bm == 0 and x.shape[1] == K
    bn = bn or _pick_block(N, 2048)
    bk = bk or _pick_block(K, 1024)
    Kp, Np = round_up(K, bk), round_up(N, bn)
    if (Kp, Np) != (K, N):               # tiny/test dims only: aligned
        wv = jnp.pad(wv, ((0, 0), (0, Kp - K), (0, Np - N)))
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    ws = (w.scales if quantized
          else jnp.ones((E, 1, N), jnp.float32))
    if Np != N:
        ws = jnp.pad(ws, ((0, 0), (0, 0), (0, Np - N)),
                     constant_values=1.0)

    grid = (Npad // bm, Np // bn, Kp // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda r, j, k, gb: (r, k)),
                pl.BlockSpec((1, bk, bn),
                             lambda r, j, k, gb: (gb[r], k, j)),
                pl.BlockSpec((1, 1, bn),
                             lambda r, j, k, gb: (gb[r], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn),
                                   lambda r, j, k, gb: (r, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Npad, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Npad * Np * Kp,
            bytes_accessed=(Npad * (Kp + Np) * x.dtype.itemsize
                            + E * Kp * Np * wv.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(group_of_block, x, wv, ws)
    return out[:, :N]
