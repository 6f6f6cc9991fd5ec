"""Builds per-layer :class:`~..ops.chain_linear.PackedChain` weights for
the decode megakernel.

Layer ``l``'s chain covers its post-attention matmuls *plus layer
``l+1``'s qkv projection* (the next weight stream in program order), so
a decode step becomes::

    qkv_0 (one XLA dot)
    for l in layers:  attention_l  ->  chain_l   (ONE pallas call)
    final_norm -> lm head

Each chain streams ~all of the layer's weight bytes back-to-back; see
``ops/chain_linear.py`` for why that matters. The packed arrays
*duplicate* the per-op weights (prefill still reads those), so the
megakernel is opt-in (``RuntimeConfig.megakernel``) and only sensible
where 2x weights fit HBM; the packed-layout prefill that drops the
duplicate is tracked in BENCHMARKS.md.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from ..config.config import ModelConfig
from ..utils.common import jnp_dtype, round_up
from ..ops.chain_linear import (
    OP_D,
    OP_G,
    OP_O,
    OP_T,
    OP_U,
    PackedChain,
    pack_chain,
)
from ..quant.tensor import QTensor

Params = Dict[str, Any]


def _split_cols(w, n: int):
    """Split ``[K, 2n] -> ([K, :n], [K, n:])`` (gate|up fused columns)."""
    if isinstance(w, QTensor):
        return (QTensor(w.values[:, :n], w.scales[:, :n]),
                QTensor(w.values[:, n:], w.scales[:, n:]))
    return w[:, :n], w[:, n:]


def chains_supported(cfg: ModelConfig, params: Params,
                     tp_axis: Optional[str] = None) -> bool:
    """The megakernel path covers the single-device, unrolled-layer,
    fused-projection decoder in every quant mode (w8a8 re-quantizes
    activations in-kernel). MoE, TP (psum mid-chain), and scanned
    stacked layers fall back to the per-op path."""
    layers = params.get("layers")
    return (tp_axis is None
            and cfg.num_experts == 0
            and cfg.activation in ("swiglu", "gelu", "relu")
            # Gemma-family variants the in-kernel norm doesn't model
            and cfg.rms_offset == 0.0 and not cfg.post_norms
            and isinstance(layers, (tuple, list))
            and len(layers) > 0
            and all("w_qkv" in lp and "wo" in lp for lp in layers))


#: per-op weight keys that live inside the packed chain blocks
_PACKED_KEYS = ("wo", "bo", "w_gu", "w_gate", "w_up", "w_down",
                "b_up", "b_down")


def build_decode_chains(params: Params, cfg: ModelConfig, *,
                        bk: int = 1024, bn: int = 2048,
                        drop: bool = False) -> Params:
    """Pack every layer's decode chain (host-side, once at engine
    build) and return params with ``"chains"`` added. Block sizes clamp
    to the model's dims; the defaults are the measured-fastest v5e
    stream blocks (BENCHMARKS.md).

    ``drop=True`` (``megakernel_drop_weights``) frees each per-op
    weight copy AS SOON as its chain is packed — layer ``l``'s o/MLP
    weights after chain ``l``, layer ``l+1``'s qkv after chain ``l``
    (it rides that chain's tail) — so peak device memory is the model
    plus ONE chain, never 2x the weights (an all-then-drop order would
    OOM Llama-3-8B INT8 on a 16 GB chip). Layer 0's qkv is not packed
    and stays; norm params stay (the per-op path reads them)."""
    # mutable per-layer dicts: popping a key here must release the LAST
    # reference to the array, so the caller hands over ownership
    layers = [dict(lp) for lp in params["layers"]]
    D, I = cfg.hidden_size, cfg.intermediate_size
    bn = min(bn, round_up(D, 128), round_up(I, 128))
    bk = min(bk, round_up(D, 128), round_up(I, 128))
    if D % bk or D % bn:
        # odd hidden sizes (gpt2-large D=1280, -xl D=1600): square
        # blocks on D keep the o/down N-padding and the scratch width
        # (lcm(bk, bn)) from exploding
        b = round_up(D, 128)
        if b <= 4096:
            bk = bn = b
    w_dtype = (None if cfg.quant in ("int8", "int8-weight")
               else jnp_dtype(cfg.dtype))

    chains = []
    for l, lp in enumerate(layers):
        ops = [(OP_O, lp["wo"], lp.get("bo"))]
        if cfg.activation == "swiglu":
            if "w_gu" in lp:
                gate, up = _split_cols(lp["w_gu"], I)
            else:
                gate, up = lp["w_gate"], lp["w_up"]
            ops += [(OP_G, gate, None), (OP_U, up, None)]
        else:
            ops += [(OP_U, lp["w_up"], lp.get("b_up"))]
        ops += [(OP_D, lp["w_down"], lp.get("b_down"))]
        nxt = layers[l + 1] if l + 1 < len(layers) else None
        ln_after_down = None
        if nxt is not None:
            ops += [(OP_T, nxt["w_qkv"], nxt.get("b_qkv"))]
            ln_after_down = (nxt["ln1_scale"], nxt.get("ln1_bias"))
        chains.append(pack_chain(
            ops, D=D, I=I,
            ln_after_o=(lp["ln2_scale"], lp.get("ln2_bias")),
            ln_after_down=ln_after_down,
            act_kind=cfg.activation, norm_kind=cfg.norm,
            eps=cfg.norm_eps, bk=bk, bn=bn, w_dtype=w_dtype,
            w8a8=cfg.quant == "int8"))
        if drop:
            del ops                         # ops list held array refs
            for key in _PACKED_KEYS:
                lp.pop(key, None)
            if nxt is not None:
                nxt.pop("w_qkv", None)
                nxt.pop("b_qkv", None)
    out = dict(params)
    out["layers"] = tuple(layers)
    out["chains"] = tuple(chains)
    return out
