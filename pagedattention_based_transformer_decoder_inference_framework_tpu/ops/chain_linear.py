"""Chained weight-stream megakernel for the decode matmul chain.

One decode step is HBM-bandwidth-bound: every weight byte is streamed
once per token. Issuing each projection as its own XLA dot (or its own
``pallas_call``) drains the weight-stream pipeline between ops — on the
v5e chip, chained different-weight matmuls sustain ~650-697 GB/s where a
single blocked Pallas matmul sustains 761 GB/s
(``benchmarks/microbench_matmul.py``, BENCHMARKS.md). The gap is pure
inter-op ramp time, and it *grows* as matmuls shrink: it is the main
reason small models (GPT-2-124M) sat far below roofline.

This kernel removes the boundaries. All weights of a decoder layer's
post-attention chain —

    o-proj -> (+residual, norm) -> gate|up / fc1 -> (SwiGLU / GELU)
    -> down / fc2 -> (+residual, norm) -> next layer's qkv-proj

— are pre-packed into ONE ``[G, bk, bn]`` block array in stream order,
and a single ``pallas_call`` with ``grid=(G,)`` pipelines the blocks
back-to-back: the next weight block's DMA always overlaps the current
block's MXU work, across op boundaries. Activations (a few KB at decode
batch sizes) live entirely in VMEM scratch; residual adds, norms and
activations run on the VPU between blocks at op boundaries, never
touching HBM. Per-op metadata (which op, which k/n block, epilogue
trigger) rides a scalar-prefetched ``int32[G, 6]`` table, so one
compiled kernel shape serves every layer.

The reference has no equivalent (its decode path launches one CUDA
kernel per op and re-runs the whole sequence per token,
``decoder/cuda_decoder.cu:52-57``); this is the TPU-native answer to
the capability its "fused" kernels gesture at
(``attention/README.md:113``): maximal fusion of the bandwidth-bound
path.

Supported: bf16/f32 weights, weight-only INT8 (``QTensor`` with
per-output-channel scales, widened in-register — HBM traffic stays 1
byte/weight), and full w8a8 (``_chain_kernel_w8a8``: activations
re-quantized per row at op boundaries, s8 x s8 -> s32 MXU blocks).
Not here: tensor-parallel chains (the o-proj psum would have to split
the kernel) and MoE; the engine falls back to the per-op path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.tensor import QTensor
from ..utils.common import cdiv, round_up

# op ids in the metadata table
OP_O = 0        # o-projection: attn_in @ Wo -> residual add, then norm
OP_G = 1        # SwiGLU gate: h @ Wgate -> stashed raw (f32)
OP_U = 2        # SwiGLU up / GPT-2 fc1: h @ W -> act buffer via epilogue
OP_D = 3        # down / fc2: act @ W -> residual add (then norm if tail)
OP_T = 4        # tail: h @ Wqkv_next (or any extra head) -> tail output

_META_COLS = 6  # [op, k_idx, n_idx, sb_blk, last_k, op_done]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedChain:
    """Weights of one decode chain, packed in stream order.

    ``w``    — ``[G, bk, bn]`` weight blocks (int8 | bf16 | f32)
    ``sb``   — ``[2, totN]`` f32: row 0 per-column dequant scales
               (ones when unquantized), row 1 biases (zeros when absent)
    ``meta`` — ``int32[G, 6]`` per-block schedule (scalar-prefetched)
    ``ln``   — ``[4, Wd]`` f32: norm-after-o scale/bias, norm-after-down
               scale/bias (zero-padded past the true hidden size)
    """

    w: jax.Array
    sb: jax.Array
    meta: jax.Array
    ln: jax.Array
    # static geometry/config (aux data — not traced)
    D: int
    I: int
    K0: int
    N3: int
    bk: int
    bn: int
    quantized: bool
    act_kind: str        # "swiglu" | "gelu" | "relu"
    norm_kind: str       # "rmsnorm" | "layernorm"
    has_tail: bool
    eps: float
    # per-op packing geometry, for serving ops individually out of the
    # packed blocks (packed_linear): (op_id, g0, KB, NB, K, N, sb_base)
    ops_geom: tuple = ()
    # dynamic per-row activation quantization in-kernel (quant="int8")
    w8a8: bool = False

    def tree_flatten(self):
        return ((self.w, self.sb, self.meta, self.ln),
                (self.D, self.I, self.K0, self.N3, self.bk, self.bn,
                 self.quantized, self.act_kind, self.norm_kind,
                 self.has_tail, self.eps, self.ops_geom, self.w8a8))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _np_f32(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def _block_weight(w: np.ndarray, bk: int, bn: int) -> np.ndarray:
    """``[K, N] -> [NB*KB, bk, bn]`` in (n-major, k-minor) stream order."""
    K, N = w.shape
    Kp, Np = round_up(K, bk), round_up(N, bn)
    if (Kp, Np) != (K, N):
        w = np.pad(w, ((0, Kp - K), (0, Np - N)))
    # [KB, bk, NB, bn] -> [NB, KB, bk, bn]
    blk = w.reshape(Kp // bk, bk, Np // bn, bn).transpose(2, 0, 1, 3)
    return blk.reshape(-1, bk, bn)


def pack_chain(ops: Sequence[Tuple[int, Any, Optional[Any]]],
               *, D: int, I: int,
               ln_after_o: Tuple[Any, Optional[Any]],
               ln_after_down: Optional[Tuple[Any, Optional[Any]]],
               act_kind: str, norm_kind: str, eps: float,
               bk: int = 1024, bn: int = 2048,
               w_dtype=None, w8a8: bool = False) -> PackedChain:
    """Pack one chain. ``ops`` = sequence of ``(op_id, W, bias)`` in
    stream order; ``W`` is ``[K, N]`` dense or a :class:`QTensor` with
    ``[1, N]`` scales. Packing runs on host (numpy) once at engine
    build, so the device never holds both layouts of a weight at once
    unless the caller keeps the originals.
    """
    quantized = any(isinstance(w, QTensor) for _, w, _ in ops)
    assert all(isinstance(w, QTensor) == quantized for _, w, _ in ops), \
        "chain ops must be uniformly quantized or uniformly dense"

    # uniform block geometry; dims that don't divide are zero-padded
    lcm = math.lcm(bk, bn)
    Wd = round_up(D, lcm)

    w_blocks: List[np.ndarray] = []
    s_cols: List[np.ndarray] = []
    b_cols: List[np.ndarray] = []
    meta: List[List[int]] = []
    geom: List[Tuple[int, ...]] = []
    sb_base = 0
    g_base = 0
    K0 = N3 = 0
    has_tail = False
    for op_id, w, bias in ops:
        if quantized:
            vals = np.asarray(jax.device_get(w.values))
            scales = _np_f32(w.scales).reshape(-1)
        else:
            vals = _np_f32(w)
            scales = np.ones((vals.shape[1],), np.float32)
        K, N = vals.shape
        Np = round_up(N, bn)
        KB, NB = cdiv(K, bk), cdiv(N, bn)
        if op_id == OP_O:
            K0 = K
        if op_id == OP_T:
            N3, has_tail = N, True
        w_blocks.append(_block_weight(vals, bk, bn))
        s_cols.append(np.pad(scales, (0, Np - N), constant_values=1.0))
        b = (np.zeros((N,), np.float32) if bias is None
             else _np_f32(bias).reshape(-1))
        b_cols.append(np.pad(b, (0, Np - N)))
        for n in range(NB):
            for k in range(KB):
                done = (n == NB - 1) and (k == KB - 1)
                meta.append([op_id, k, n, sb_base + n,
                             int(k == KB - 1), int(done)])
        geom.append((op_id, g_base, KB, NB, K, N, sb_base))
        sb_base += NB
        g_base += NB * KB
    w_packed = np.concatenate(w_blocks, axis=0)
    if w_dtype is None:
        w_dtype = jnp.int8 if quantized else jnp.bfloat16
    sb = np.stack([np.concatenate(s_cols), np.concatenate(b_cols)])

    def ln_rows(pair):
        if pair is None:
            return np.zeros((2, Wd), np.float32)
        scale, bias = pair
        out = np.zeros((2, Wd), np.float32)
        out[0, :D] = _np_f32(scale).reshape(-1)
        if bias is not None:
            out[1, :D] = _np_f32(bias).reshape(-1)
        return out

    ln = np.concatenate([ln_rows(ln_after_o), ln_rows(ln_after_down)])

    return PackedChain(
        w=jnp.asarray(w_packed, w_dtype),
        sb=jnp.asarray(sb, jnp.float32),
        meta=jnp.asarray(np.asarray(meta, np.int32)),
        ln=jnp.asarray(ln, jnp.float32),
        D=D, I=I, K0=K0, N3=N3, bk=bk, bn=bn,
        quantized=quantized, act_kind=act_kind, norm_kind=norm_kind,
        has_tail=has_tail, eps=eps, ops_geom=tuple(geom),
        w8a8=w8a8 and quantized)


def _norm_row(x32: jax.Array, scale: jax.Array, bias: jax.Array, *,
              kind: str, D: int, eps: float) -> jax.Array:
    """Masked full-row norm over a ``[Bp, Wd]`` f32 block whose columns
    past ``D`` are zero; pad columns emit 0 through the zero-padded
    scale/bias rows. ``scale``/``bias`` are ``[1, Wd]`` (2-D reads keep
    Mosaic on the native vector layout; 1-D vectors lower worse)."""
    if kind == "rmsnorm":
        ms = jnp.sum(jnp.square(x32), axis=-1, keepdims=True) / D
        return x32 * jax.lax.rsqrt(ms + eps) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
    mean = jnp.sum(x32, axis=-1, keepdims=True) / D
    cent = jnp.where(col < D, x32 - mean, 0.0)
    var = jnp.sum(jnp.square(cent), axis=-1, keepdims=True) / D
    return cent * jax.lax.rsqrt(var + eps) * scale + bias


def _chain_kernel(meta_ref, ain_ref, x_ref, w_ref, sb_ref, ln_ref,
                  x_out_ref, tail_ref,
                  xres, h, gate, act, acc, *,
                  norm_kind: str, act_kind: str, quantized: bool,
                  has_tail: bool, D: int, I: int, eps: float,
                  bk: int, bn: int):
    g = pl.program_id(0)
    op = meta_ref[g, 0]
    ki = meta_ref[g, 1]
    ni = meta_ref[g, 2]
    last_k = meta_ref[g, 4]
    op_done = meta_ref[g, 5]
    swiglu = act_kind == "swiglu"

    @pl.when(g == 0)
    def _init():
        xres[...] = x_ref[...].astype(jnp.float32)
        act[...] = jnp.zeros_like(act)

    @pl.when(ki == 0)
    def _zero_acc():
        acc[...] = jnp.zeros_like(acc)

    # widen int8 in-register (1 byte/weight of HBM traffic); a no-op
    # cast when the packed dtype already matches the activations
    wb = w_ref[0].astype(ain_ref.dtype)

    def mm(src):
        xb = src[:, pl.ds(pl.multiple_of(ki * bk, bk), bk)]
        return jax.lax.dot_general(
            xb, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(op == OP_O)
    def _():
        acc[...] += mm(ain_ref)

    @pl.when((op == OP_U) | (op == OP_G) | (op == OP_T) if swiglu
             else (op == OP_U) | (op == OP_T))
    def _():
        acc[...] += mm(h)

    @pl.when(op == OP_D)
    def _():
        acc[...] += mm(act)

    @pl.when(last_k == 1)
    def _epilogue():
        sb = sb_ref[...]                            # [2, bn]
        y = acc[...]
        if quantized:
            y = y * sb[0:1, :]
        y = y + sb[1:2, :]
        off = pl.multiple_of(ni * bn, bn)

        @pl.when((op == OP_O) | (op == OP_D))
        def _():
            xres[:, pl.ds(off, bn)] += y

        if swiglu:
            @pl.when(op == OP_G)
            def _():
                gate[:, pl.ds(off, bn)] = y

        @pl.when(op == OP_U)
        def _():
            col = off + jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            if swiglu:
                gb = gate[:, pl.ds(off, bn)]
                v = (gb * jax.nn.sigmoid(gb)) * y
            elif act_kind == "gelu":
                v = jax.nn.gelu(y, approximate=True)
            else:
                v = jnp.maximum(y, 0.0)
            act[:, pl.ds(off, bn)] = jnp.where(col < I, v, 0.0
                                               ).astype(act.dtype)

        if has_tail:
            @pl.when(op == OP_T)
            def _():
                tail_ref[:, pl.ds(off, bn)] = y.astype(tail_ref.dtype)

    @pl.when((op_done == 1) & (op == OP_O))
    def _norm_after_o():
        h[...] = _norm_row(xres[...], ln_ref[0:1, :], ln_ref[1:2, :],
                           kind=norm_kind, D=D, eps=eps
                           ).astype(h.dtype)

    @pl.when((op_done == 1) & (op == OP_D))
    def _finish_down():
        x_out_ref[...] = xres[...].astype(x_out_ref.dtype)
        if has_tail:
            h[...] = _norm_row(xres[...], ln_ref[2:3, :], ln_ref[3:4, :],
                               kind=norm_kind, D=D, eps=eps
                               ).astype(h.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chain_decode(pc: PackedChain, attn_in: jax.Array, x: jax.Array,
                 *, interpret: bool = False
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Run one packed decode chain.

    ``attn_in`` — ``[B, K0]`` attention output (pre-o-projection);
    ``x``       — ``[B, D]`` residual stream entering the chain.
    Returns ``(x_new [B, D], tail [B, N3] | None)`` where ``tail`` is
    the next layer's qkv projection (post-norm-after-down) when the
    chain has one.
    """
    B = x.shape[0]
    bk, bn = pc.bk, pc.bn
    lcm = math.lcm(bk, bn)
    # int8 scratches need 32-row tiles; bf16/f32 need 8
    Bp = round_up(max(B, 8), 32 if pc.w8a8 else 8)
    Wd = round_up(pc.D, lcm)
    Wi = round_up(pc.I, lcm)
    K0p = round_up(pc.K0, bk)
    N3p = round_up(max(pc.N3, 1), bn) if pc.has_tail else bn
    dt = x.dtype
    G = pc.meta.shape[0]

    ain = jnp.zeros((Bp, K0p), dt).at[:B, :pc.K0].set(
        attn_in.astype(dt))
    x_in = jnp.zeros((Bp, Wd), dt).at[:B, :pc.D].set(x)

    if pc.w8a8:
        scratches = [
            pltpu.VMEM((Bp, Wd), jnp.float32),      # residual stream
            pltpu.VMEM((Bp, K0p), jnp.int8),        # quantized attn_in
            pltpu.VMEM((Bp, 128), jnp.float32),     # ...its row scales
            pltpu.VMEM((Bp, Wd), jnp.int8),         # quantized hidden
            pltpu.VMEM((Bp, 128), jnp.float32),
            pltpu.VMEM((Bp, Wi), jnp.float32),      # raw gate / f32 mid
            pltpu.VMEM((Bp, Wi), jnp.int8),         # quantized mid
            pltpu.VMEM((Bp, 128), jnp.float32),
            pltpu.VMEM((Bp, bn), jnp.int32),        # s32 accumulator
        ]
        kern = functools.partial(
            _chain_kernel_w8a8, norm_kind=pc.norm_kind,
            act_kind=pc.act_kind, has_tail=pc.has_tail, D=pc.D,
            I=pc.I, eps=pc.eps, bk=bk, bn=bn)
    else:
        scratches = [
            pltpu.VMEM((Bp, Wd), jnp.float32),      # residual stream
            pltpu.VMEM((Bp, Wd), dt),               # normed hidden
            pltpu.VMEM((Bp, Wi), jnp.float32) if pc.act_kind == "swiglu"
            else pltpu.VMEM((8, 128), jnp.float32),  # raw gate stash
            pltpu.VMEM((Bp, Wi), dt),               # activated mlp mid
            pltpu.VMEM((Bp, bn), jnp.float32),      # matmul accumulator
        ]
        kern = functools.partial(
            _chain_kernel, norm_kind=pc.norm_kind, act_kind=pc.act_kind,
            quantized=pc.quantized, has_tail=pc.has_tail, D=pc.D,
            I=pc.I, eps=pc.eps, bk=bk, bn=bn)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Bp, K0p), lambda g, m: (0, 0)),
            pl.BlockSpec((Bp, Wd), lambda g, m: (0, 0)),
            pl.BlockSpec((1, bk, bn), lambda g, m: (g, 0, 0)),
            pl.BlockSpec((2, bn), lambda g, m: (0, m[g, 3])),
            pl.BlockSpec((4, Wd), lambda g, m: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Bp, Wd), lambda g, m: (0, 0)),
            pl.BlockSpec((Bp, N3p), lambda g, m: (0, 0)),
        ],
        scratch_shapes=scratches,
    )
    wbytes = pc.w.size * pc.w.dtype.itemsize
    x_new, tail = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Bp, Wd), dt),
                   jax.ShapeDtypeStruct((Bp, N3p), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * bk * bn * G,
            bytes_accessed=wbytes, transcendentals=0),
        interpret=interpret,
    )(pc.meta, ain, x_in, pc.w, pc.sb, pc.ln)
    x_out = x_new[:B, :pc.D]
    return x_out, (tail[:B, :pc.N3] if pc.has_tail else None)


def _quant_rows(x32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization (quant/tensor.py semantics)."""
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _chain_kernel_w8a8(meta_ref, ain_ref, x_ref, w_ref, sb_ref, ln_ref,
                       x_out_ref, tail_ref,
                       xres, ainq, ains, hq, hs, mid, actq, acts, acc, *,
                       norm_kind: str, act_kind: str, has_tail: bool,
                       D: int, I: int, eps: float, bk: int, bn: int):
    """w8a8 variant: activations are re-quantized per row at each op
    boundary (the dynamic-quant semantics of ``ops/linear.py``), blocks
    accumulate s8 x s8 -> s32 on the MXU, and the epilogue rescales by
    row-scale x per-column weight scale before bias/activation."""
    g = pl.program_id(0)
    op = meta_ref[g, 0]
    ki = meta_ref[g, 1]
    ni = meta_ref[g, 2]
    last_k = meta_ref[g, 4]
    op_done = meta_ref[g, 5]
    swiglu = act_kind == "swiglu"

    # row-scale scratches are [Bp, 128] (lane-padded); col 0 is used
    @pl.when(g == 0)
    def _init():
        xres[...] = x_ref[...].astype(jnp.float32)
        q, s = _quant_rows(ain_ref[...].astype(jnp.float32))
        ainq[...] = q
        ains[...] = jnp.broadcast_to(s, ains.shape)
        actq[...] = jnp.zeros_like(actq)

    @pl.when(ki == 0)
    def _zero_acc():
        acc[...] = jnp.zeros_like(acc)

    wb = w_ref[0]

    def mm(src):
        return jax.lax.dot_general(
            src[:, pl.ds(pl.multiple_of(ki * bk, bk), bk)], wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(op == OP_O)
    def _():
        acc[...] += mm(ainq)

    @pl.when((op == OP_U) | (op == OP_G) | (op == OP_T) if swiglu
             else (op == OP_U) | (op == OP_T))
    def _():
        acc[...] += mm(hq)

    @pl.when(op == OP_D)
    def _():
        acc[...] += mm(actq)

    @pl.when(last_k == 1)
    def _epilogue():
        sb = sb_ref[...]
        xs = jnp.where(op == OP_O, ains[:, 0:1],
                       jnp.where(op == OP_D, acts[:, 0:1], hs[:, 0:1]))
        y = acc[...].astype(jnp.float32) * xs * sb[0:1, :] + sb[1:2, :]
        off = pl.multiple_of(ni * bn, bn)

        @pl.when((op == OP_O) | (op == OP_D))
        def _():
            xres[:, pl.ds(off, bn)] += y

        if swiglu:
            @pl.when(op == OP_G)
            def _():
                mid[:, pl.ds(off, bn)] = y

        @pl.when(op == OP_U)
        def _():
            if swiglu:
                gb = mid[:, pl.ds(off, bn)]
                v = (gb * jax.nn.sigmoid(gb)) * y
            elif act_kind == "gelu":
                v = jax.nn.gelu(y, approximate=True)
            else:
                v = jnp.maximum(y, 0.0)
            # stash activated f32 in `mid`; quantized at op_done when
            # the full row's absmax is known
            mid[:, pl.ds(off, bn)] = v

        if has_tail:
            @pl.when(op == OP_T)
            def _():
                tail_ref[:, pl.ds(off, bn)] = y.astype(tail_ref.dtype)

    @pl.when((op_done == 1) & (op == OP_O))
    def _norm_after_o():
        h32 = _norm_row(xres[...], ln_ref[0:1, :], ln_ref[1:2, :],
                        kind=norm_kind, D=D, eps=eps)
        q, s = _quant_rows(h32)
        hq[...] = q
        hs[...] = jnp.broadcast_to(s, hs.shape)

    @pl.when((op_done == 1) & (op == OP_U))
    def _quant_act():
        col = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 1)
        m = jnp.where(col < I, mid[...], 0.0)
        q, s = _quant_rows(m)
        actq[...] = q
        acts[...] = jnp.broadcast_to(s, acts.shape)

    @pl.when((op_done == 1) & (op == OP_D))
    def _finish_down():
        x_out_ref[...] = xres[...].astype(x_out_ref.dtype)
        if has_tail:
            h32 = _norm_row(xres[...], ln_ref[2:3, :], ln_ref[3:4, :],
                            kind=norm_kind, D=D, eps=eps)
            q, s = _quant_rows(h32)
            hq[...] = q
            hs[...] = jnp.broadcast_to(s, hs.shape)


def _packed_mm_kernel(x_ref, w_ref, sb_ref, o_ref, acc, *,
                      quantized: bool, act: Optional[str]):
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
        sb = sb_ref[...]
        y = acc[...]
        if quantized:
            y = y * sb[0:1, :]
        y = y + sb[1:2, :]
        if act == "gelu":
            y = jax.nn.gelu(y, approximate=True)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        o_ref[...] = y.astype(o_ref.dtype)


def _packed_mm_w8a8_kernel(xq_ref, xs_ref, w_ref, sb_ref, o_ref, acc, *,
                           act: Optional[str]):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        xq_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        sb = sb_ref[...]
        y = (acc[...].astype(jnp.float32) * xs_ref[:, 0:1] * sb[0:1, :]
             + sb[1:2, :])
        if act == "gelu":
            y = jax.nn.gelu(y, approximate=True)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("op_ids", "act", "bm", "interpret"))
def packed_linear(pc: PackedChain, op_ids: Tuple[int, ...],
                  x: jax.Array, *, act: Optional[str] = None,
                  bm: int = 256, interpret: bool = False) -> jax.Array:
    """``act(x @ W_op + bias_op)`` served directly out of the packed
    chain blocks — the multi-token (prefill / speculative-verify) twin
    of :func:`chain_decode`, so the engine can DROP the per-op weight
    copies and hold one layout in HBM
    (``RuntimeConfig.megakernel_drop_weights``). ``op_ids`` may name a
    contiguous run of equal-``K`` ops (the SwiGLU ``(OP_G, OP_U)`` pair),
    which computes their column concat — identical semantics to the
    fused ``w_gu`` matmul. ``x``: ``[..., K]``; returns ``[..., sum N]``.
    """
    geoms = [g for g in pc.ops_geom if g[0] in op_ids]
    assert len(geoms) == len(op_ids), (op_ids, pc.ops_geom)
    op0 = geoms[0]
    g0, KB, K, sb0 = op0[1], op0[2], op0[4], op0[6]
    NB = sum(g[3] for g in geoms)
    N = sum(g[5] for g in geoms)
    for a, b in zip(geoms, geoms[1:]):     # contiguity + equal K
        assert a[1] + a[3] * a[2] == b[1] and a[4] == b[4] \
            and a[5] % pc.bn == 0, (a, b)
    bk, bn = pc.bk, pc.bn

    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    bm = min(round_up(M, 32 if pc.w8a8 else 8), bm)
    Mp, Kp = round_up(M, bm), KB * bk
    cost = pl.CostEstimate(
        flops=2 * Mp * NB * bn * Kp,
        bytes_accessed=NB * KB * bk * bn * pc.w.dtype.itemsize
        + Mp * Kp * 2, transcendentals=0)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    if pc.w8a8:
        # dynamic per-row activation quant outside; s8 x s8 blocks in
        xq, xs = _quant_rows(x2.astype(jnp.float32))
        if (Mp, Kp) != (M, K):
            xq = jnp.pad(xq, ((0, Mp - M), (0, Kp - K)))
            xs = jnp.pad(xs, ((0, Mp - M), (0, 0)),
                         constant_values=1.0)
        xs = jnp.broadcast_to(xs, (Mp, 128))
        out = pl.pallas_call(
            functools.partial(_packed_mm_w8a8_kernel, act=act),
            grid=(Mp // bm, NB, KB),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bm, 128), lambda i, j, k: (i, 0)),
                pl.BlockSpec((1, bk, bn),
                             lambda i, j, k: (g0 + j * KB + k, 0, 0)),
                pl.BlockSpec((2, bn), lambda i, j, k: (0, sb0 + j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Mp, NB * bn), x.dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=cparams, cost_estimate=cost,
            interpret=interpret,
        )(xq, xs, pc.w, pc.sb)
        return out[:M, :N].reshape(*lead, N)

    if (Mp, Kp) != (M, K):
        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    out = pl.pallas_call(
        functools.partial(_packed_mm_kernel, quantized=pc.quantized,
                          act=act),
        grid=(Mp // bm, NB, KB),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((1, bk, bn),
                         lambda i, j, k: (g0 + j * KB + k, 0, 0)),
            pl.BlockSpec((2, bn), lambda i, j, k: (0, sb0 + j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, NB * bn), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=cparams, cost_estimate=cost,
        interpret=interpret,
    )(x2, pc.w, pc.sb)
    return out[:M, :N].reshape(*lead, N)
