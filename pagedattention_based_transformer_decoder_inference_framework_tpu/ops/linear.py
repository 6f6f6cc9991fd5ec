"""Linear layers with fused INT8 dequant-matmul dispatch.

TPU-native equivalent of the reference's oneDNN INT8 batched matmul with
fused bias + ReLU/GELU (``attention_cpu/dnnl_matmul_int8.cpp:7-76``):
s8 x s8 -> s32 accumulation on the MXU (via ``dot_general`` with
``preferred_element_type=int32``, which XLA lowers to native INT8 MXU
tiles), then a fused rescale * (row_scale x col_scale) + bias +
activation epilogue. A Pallas variant lives in ``ops/int8_matmul.py``
for cases where XLA's fusion is insufficient.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import os

from ..quant.tensor import Q4Tensor, QTensor, quantize_per_row
from .common import activation_fn


def _use_pallas_mm() -> bool:
    return os.environ.get("PBT_PALLAS_MM", "0") == "1"


def linear(x: jax.Array, w, bias: Optional[jax.Array] = None,
           act: Optional[str] = None, w8a8: bool = False) -> jax.Array:
    """``y = act(x @ w + bias)``.

    ``w`` is either a dense ``[in, out]`` array or a :class:`QTensor`
    with per-output-channel scales ``[1, out]``.
    ``x`` is ``[..., in]`` in bf16/f32.

    QTensor modes:
    * weight-only (default): ``x_bf16 @ s8->bf16`` — the s8 load +
      widen fuses into the weight stream (half the HBM traffic of
      bf16 weights, full-precision activations);
    * ``w8a8``: dynamic per-row activation quantization + s8 x s8 ->
      s32 MXU accumulate + fused rescale (the reference's oneDNN
      semantics, ``attention_cpu/dnnl_matmul_int8.cpp:39-52``).
    """
    out_dtype = x.dtype
    if isinstance(w, Q4Tensor):
        # INT4 weights have no XLA path at all on this backend (s4 is
        # UNIMPLEMENTED): always the Pallas fused unpack+matmul
        from ..utils.platform import default_interpret
        from .int4_matmul import w4_matmul

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        y = w4_matmul(x2, w.packed, w.scales, bias, group=w.group,
                      bn=w.bn, act=act, out_dtype=out_dtype,
                      interpret=default_interpret())
        return y.reshape(*lead, y.shape[-1])
    if isinstance(w, QTensor) and _use_pallas_mm():
        from ..utils.platform import on_tpu

        if on_tpu():
            # Pallas paths (ops/int8_matmul.py) with in-register
            # epilogue. Opt-in (PBT_PALLAS_MM=1): a single call streams
            # weights at 761 GB/s vs XLA's 730, but in back-to-back
            # chains (one matmul feeding the next, the decode-layer
            # shape) XLA's latency-hiding scheduler overlaps the next
            # op's weight stream with the previous epilogue while
            # chained pallas_calls drain their pipelines — measured 697
            # vs 620 GB/s (benchmarks/microbench_scan_slice.py), so the
            # XLA path below is the default on TPU too.
            from .int8_matmul import int8_matmul, w8_matmul

            lead = x.shape[:-1]
            x2 = x.reshape(-1, x.shape[-1])
            if w8a8:
                xq = quantize_per_row(x2)
                y = int8_matmul(
                    xq.values, xq.scales, w.values,
                    w.scales.reshape(1, -1), bias, act=act,
                    out_dtype=out_dtype)
            else:
                y = w8_matmul(x2, w.values, w.scales.reshape(1, -1),
                              bias, act=act, out_dtype=out_dtype)
            return y.reshape(*lead, y.shape[-1])
    if isinstance(w, QTensor) and not w8a8:
        y = jax.lax.dot_general(
            x, w.values.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * w.scales.reshape(1, -1)
    elif isinstance(w, QTensor):
        xq = quantize_per_row(x)
        acc = jax.lax.dot_general(
            xq.values, w.values,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * xq.scales * w.scales.reshape(1, -1)
    else:
        y = jax.lax.dot_general(
            x, w.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if act is not None:
        y = activation_fn(act)(y)
    return y.astype(out_dtype)
