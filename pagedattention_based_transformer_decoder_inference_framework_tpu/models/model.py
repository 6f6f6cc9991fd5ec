"""Unified decoder-only transformer model (functional JAX).

One model implementation covers both config families:

* GPT-2 style — LayerNorm, learned positions, gelu MLP, MHA, tied head
  (the reference's target: ``config/model_config.yaml:1-12``); and
* Llama style — RMSNorm, RoPE, SwiGLU, GQA, untied head.

It implements the *intended* block of the reference's ``DecoderBlock``
(``decoder/decoder_block.hpp:22-69`` + ``weights/README.md:31-34``):
pre-LN -> q/k/v projections -> RoPE -> KV append -> paged attention ->
O projection -> residual -> pre-LN -> MLP -> residual, plus the LM head
the reference omits entirely (Appendix A: sampling argmaxed hidden
states, ``decoder/cuda_decoder.cu:58``).

Layer parameters are stacked on a leading ``[L, ...]`` axis and the
block runs under ``jax.lax.scan`` so XLA traces/compiles one block
regardless of depth. The attention backend is injected as a callable so
the same model runs with the dense XLA oracle or the Pallas paged
kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.common import activation_fn, layernorm, rmsnorm
from ..ops.linear import linear
from ..ops.rope import apply_rope, rope_table
from ..quant.tensor import Q4Tensor, QTensor, quantize_per_channel
from ..utils.common import jnp_dtype

Params = Dict[str, Any]

# attn_fn(q[B,T,H,D], k[B,T,KH,D], v[B,T,KH,D], kv_state, layer, positions[B,T])
#   -> (out[B,T,H,D], new_kv_state)
#
# ``kv_state`` is the FULL multi-layer cache and ``layer`` a traced layer
# index: the cache rides the layer scan as a *carry* (not xs->ys), so
# XLA aliases the pool buffers in place across layers and steps instead
# of re-stacking the whole pool every layer (which costs a full pool
# copy per layer per decode step).
AttentionFn = Callable[..., Tuple[jax.Array, Any]]


def init_params(cfg: ModelConfig, key: jax.Array) -> Params:
    """Random-init parameters (stacked layers)."""
    dt = jnp_dtype(cfg.dtype)
    D, H, KH, dh, I_ = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                        cfg.head_dim, cfg.intermediate_size)
    L = cfg.num_layers
    keys = jax.random.split(key, 16)

    def w(k, *shape, scale=0.02):
        return (scale * jax.random.normal(k, shape, jnp.float32)).astype(dt)

    layers: Params = {
        "ln1_scale": jnp.ones((L, D), dt),
        "ln2_scale": jnp.ones((L, D), dt),
        "wq": w(keys[0], L, D, H * dh),
        "wk": w(keys[1], L, D, KH * dh),
        "wv": w(keys[2], L, D, KH * dh),
        "wo": w(keys[3], L, H * dh, D),
    }
    if cfg.norm == "layernorm":
        layers["ln1_bias"] = jnp.zeros((L, D), dt)
        layers["ln2_bias"] = jnp.zeros((L, D), dt)
    if cfg.use_qkv_bias:
        layers["bq"] = jnp.zeros((L, H * dh), dt)
        layers["bk"] = jnp.zeros((L, KH * dh), dt)
        layers["bv"] = jnp.zeros((L, KH * dh), dt)
        layers["bo"] = jnp.zeros((L, D), dt)
    if cfg.post_norms:
        layers["post_attn_scale"] = jnp.ones((L, D), dt)
        layers["post_mlp_scale"] = jnp.ones((L, D), dt)
    if cfg.qk_norm:
        # stored weight = effective scale - rms_offset (zero for Gemma)
        qk1 = jnp.full((L, dh), 1.0 - cfg.rms_offset, dt)
        layers["q_norm_scale"] = qk1
        layers["k_norm_scale"] = qk1
    if cfg.num_experts > 0:
        E = cfg.num_experts
        layers["router"] = w(keys[10], L, D, E)
        layers["we_gate"] = w(keys[4], L, E, D, I_)
        layers["we_up"] = w(keys[5], L, E, D, I_)
        layers["we_down"] = w(keys[6], L, E, I_, D)
    elif cfg.is_glu:
        layers["w_gate"] = w(keys[4], L, D, I_)
        layers["w_up"] = w(keys[5], L, D, I_)
        layers["w_down"] = w(keys[6], L, I_, D)
    else:
        layers["w_up"] = w(keys[5], L, D, I_)
        layers["w_down"] = w(keys[6], L, I_, D)
        if cfg.use_mlp_bias:
            layers["b_up"] = jnp.zeros((L, I_), dt)
            layers["b_down"] = jnp.zeros((L, D), dt)

    params: Params = {
        "embedding": w(keys[7], cfg.vocab_size, D),
        "final_norm_scale": jnp.ones((D,), dt),
        "layers": layers,
    }
    if cfg.norm == "layernorm":
        params["final_norm_bias"] = jnp.zeros((D,), dt)
    if cfg.position == "learned":
        params["pos_embedding"] = w(keys[8], cfg.max_seq_len, D, scale=0.01)
    if not cfg.tie_embeddings:
        params["lm_head"] = w(keys[9], D, cfg.vocab_size)
    return params


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
               "we_gate", "we_up", "we_down")

#: grouped-matmul row-block size (ops/gmm.py) — the MoE dispatch path
#: engages when total routed rows average >= one row block per expert
_GMM_BM = 256


def init_params_quantized(cfg: ModelConfig, key: jax.Array) -> Params:
    """Random-init directly into INT8 QTensors, layer by layer.

    For 8B+ models a full-precision init of stacked ``[L, K, N]``
    weights needs a multi-GB f32 transient per tensor; building one
    layer at a time keeps the peak at one layer's worth, so an INT8
    Llama-3-8B fits a single 16 GB chip.
    """
    import numpy as np

    dt = jnp_dtype(cfg.dtype)
    fp = init_params(
        dataclasses.replace(cfg, num_layers=0, intermediate_size=0), key)

    def q_stacked(k, K, N):
        vals, scales = [], []
        for l in range(cfg.num_layers):
            w = 0.02 * jax.random.normal(jax.random.fold_in(k, l),
                                         (K, N), jnp.float32)
            qt = quantize_per_channel(w)
            vals.append(qt.values)
            scales.append(qt.scales)
        return QTensor(jnp.stack(vals), jnp.stack(scales))

    D, H, KH, dh, I_ = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                        cfg.head_dim, cfg.intermediate_size)
    L = cfg.num_layers
    keys = jax.random.split(key, 16)
    layers: Params = {
        "ln1_scale": jnp.ones((L, D), dt),
        "ln2_scale": jnp.ones((L, D), dt),
        "wq": q_stacked(keys[0], D, H * dh),
        "wk": q_stacked(keys[1], D, KH * dh),
        "wv": q_stacked(keys[2], D, KH * dh),
        "wo": q_stacked(keys[3], H * dh, D),
    }
    if cfg.norm == "layernorm":
        layers["ln1_bias"] = jnp.zeros((L, D), dt)
        layers["ln2_bias"] = jnp.zeros((L, D), dt)
    if cfg.use_qkv_bias:
        layers["bq"] = jnp.zeros((L, H * dh), dt)
        layers["bk"] = jnp.zeros((L, KH * dh), dt)
        layers["bv"] = jnp.zeros((L, KH * dh), dt)
        layers["bo"] = jnp.zeros((L, D), dt)
    if cfg.post_norms:
        layers["post_attn_scale"] = jnp.ones((L, D), dt)
        layers["post_mlp_scale"] = jnp.ones((L, D), dt)
    if cfg.qk_norm:
        # stored weight = effective scale - rms_offset (zero for Gemma)
        qk1 = jnp.full((L, dh), 1.0 - cfg.rms_offset, dt)
        layers["q_norm_scale"] = qk1
        layers["k_norm_scale"] = qk1
    def q_experts(k, K, N):
        E = cfg.num_experts
        vals, scales = [], []
        for l in range(cfg.num_layers):
            ev, es = [], []
            for e in range(E):
                w = 0.02 * jax.random.normal(
                    jax.random.fold_in(jax.random.fold_in(k, l), e),
                    (K, N), jnp.float32)
                qt = quantize_per_channel(w)
                ev.append(qt.values)
                es.append(qt.scales)
            vals.append(jnp.stack(ev))
            scales.append(jnp.stack(es))
        return QTensor(jnp.stack(vals), jnp.stack(scales))

    if cfg.num_experts > 0:
        layers["router"] = (0.02 * jax.random.normal(
            keys[10], (L, D, cfg.num_experts), jnp.float32)).astype(dt)
        layers["we_gate"] = q_experts(keys[4], D, I_)
        layers["we_up"] = q_experts(keys[5], D, I_)
        layers["we_down"] = q_experts(keys[6], I_, D)
    elif cfg.is_glu:
        layers["w_gate"] = q_stacked(keys[4], D, I_)
        layers["w_up"] = q_stacked(keys[5], D, I_)
        layers["w_down"] = q_stacked(keys[6], I_, D)
    else:
        layers["w_up"] = q_stacked(keys[5], D, I_)
        layers["w_down"] = q_stacked(keys[6], I_, D)
        if cfg.use_mlp_bias:
            layers["b_up"] = jnp.zeros((L, I_), dt)
            layers["b_down"] = jnp.zeros((L, D), dt)

    params: Params = {
        "embedding": fp["embedding"],
        "final_norm_scale": jnp.ones((D,), dt),
        "layers": layers,
    }
    if cfg.norm == "layernorm":
        params["final_norm_bias"] = jnp.zeros((D,), dt)
    if cfg.position == "learned":
        params["pos_embedding"] = fp["pos_embedding"]
    if not cfg.tie_embeddings:
        params["lm_head"] = quantize_per_channel(
            0.02 * jax.random.normal(keys[9], (D, cfg.vocab_size),
                                     jnp.float32))
    return params


def unstack_layers(params: Params) -> Params:
    """Convert stacked ``[L, ...]`` layer weights into a tuple of
    per-layer dicts (the unrolled-forward layout).

    Scanning over stacked weights makes XLA materialize a sliced copy of
    every weight each layer (Pallas/dot operands cannot fuse the slice):
    measured 1.45x decode slowdown vs per-layer arrays
    (``benchmarks/microbench_scan_slice.py``). Canonical storage
    (checkpoints, HF import, sharding) stays stacked; the engine calls
    this after placement. Stacked leaves are freed key-by-key so peak
    HBM overhead is one stacked tensor, not a full second copy.
    """
    if isinstance(params["layers"], (tuple, list)):
        return params
    layers = dict(params["layers"])
    num_layers = None
    per_key: Dict[str, list] = {}
    for k in list(layers.keys()):
        leaf = layers.pop(k)
        if isinstance(leaf, QTensor):
            num_layers = leaf.values.shape[0]
            per_key[k] = [QTensor(leaf.values[l], leaf.scales[l])
                          for l in range(num_layers)]
        else:
            num_layers = leaf.shape[0]
            per_key[k] = [leaf[l] for l in range(num_layers)]
        del leaf                       # free the stacked buffer eagerly
    out = dict(params)
    out["layers"] = tuple({k: v[l] for k, v in per_key.items()}
                          for l in range(num_layers))
    return out


def _fuse_cols(ws, tp: int):
    """Concatenate along the output dim so that under TP each shard's
    local slice is ``[w0_i | w1_i | ...]`` (its own columns of every
    piece, in order) — a plain concat would hand shard boundaries that
    cross piece boundaries."""
    def cat(arrs):
        if tp == 1:
            return jnp.concatenate(arrs, axis=-1)
        chunks = []
        for i in range(tp):
            for a in arrs:
                c = a.shape[-1] // tp
                chunks.append(a[..., i * c:(i + 1) * c])
        return jnp.concatenate(chunks, axis=-1)

    if isinstance(ws[0], QTensor):
        return QTensor(cat([w.values for w in ws]),
                       cat([w.scales for w in ws]))
    return cat(ws)


def fuse_projections(params: Params, tp: int = 1) -> Params:
    """Fuse q/k/v into one projection and SwiGLU gate/up into another.

    One wide matmul streams the same weight bytes with fewer kernel
    launches and larger N blocks. Requires unrolled layers
    (:func:`unstack_layers`). The model splits the fused outputs by the
    H : KH : KH head ratio (tp-invariant), so the fusion is transparent
    to every caller; canonical (checkpoint/import) layout stays unfused.
    """
    assert isinstance(params["layers"], (tuple, list)), (
        "fuse_projections requires unstacked layers")
    out_layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        if "wq" in lp:                        # idempotent re-entry
            lp["w_qkv"] = _fuse_cols([lp.pop("wq"), lp.pop("wk"),
                                      lp.pop("wv")], tp)
        if "bq" in lp:
            lp["b_qkv"] = _fuse_cols([lp.pop("bq"), lp.pop("bk"),
                                      lp.pop("bv")], tp)
        if "w_gate" in lp:
            lp["w_gu"] = _fuse_cols([lp.pop("w_gate"), lp.pop("w_up")], tp)
        if "we_gate" in lp:
            # experts shard over the mesh axis as whole units (EP), so
            # per-expert columns need no tp interleaving
            lp["we_gu"] = _fuse_cols([lp.pop("we_gate"),
                                      lp.pop("we_up")], 1)
        out_layers.append(lp)
    out = dict(params)
    out["layers"] = tuple(out_layers)
    return out


def quantize_params(params: Params, lm_head: bool = True) -> Params:
    """Offline INT8 conversion of all matmul weights (per-channel absmax).

    Norm/bias/embedding parameters stay in float — unlike the reference's
    quantizer which also quantized LayerNorm params
    (``decoder/int8_decoder.cpp:43-89``). Handles both the canonical
    stacked layout and the engine's unstacked/fused tuple layout
    (re-wrapping one engine's params in another).
    """
    quant_keys = set(_QUANT_KEYS) | {"w_qkv", "w_gu", "we_gu"}

    def quant_dict(layers: Params) -> Params:
        layers = dict(layers)
        for k in quant_keys:
            if k in layers and not isinstance(layers[k],
                                              (QTensor, Q4Tensor)):
                layers[k] = quantize_per_channel(layers[k])
        return layers

    out = dict(params)
    if isinstance(params["layers"], (tuple, list)):
        out["layers"] = tuple(quant_dict(lp) for lp in params["layers"])
    else:
        out["layers"] = quant_dict(params["layers"])
    if lm_head and "lm_head" in params and not isinstance(
            params["lm_head"], (QTensor, Q4Tensor)):
        out["lm_head"] = quantize_per_channel(params["lm_head"])
    return out


#: column-parallel int4 weights (TP shards their output dim; packing
#: must be block-local per shard) vs row-parallel (TP shards their
#: contraction dim; group-wise scales shard their K-group axis)
_INT4_COL = {"wq", "wk", "wv", "w_gate", "w_up", "w_qkv", "w_gu"}
_INT4_ROW = {"wo", "w_down"}


def quantize_params_int4(params: Params, group: int = 128,
                         lm_head: bool = True, tp: int = 1) -> Params:
    """Convert matmul weights to nibble-packed INT4 with group-wise
    scales (``quant/tensor.py:Q4Tensor``) — HALF the weight bytes of
    INT8, which is the whole story for HBM-bound decode (BENCHMARKS.md
    round 3: int8 already streams at the chip's sustained-bandwidth
    floor). Runs on the engine's unstacked/fused layout, one weight at
    a time (peak transient = one f32 weight); existing INT8 QTensors
    are dequantized first (double-rounding int8->int4 costs ~nothing
    against int4's own step size). Norms/biases/embedding stay float;
    MoE expert stacks keep INT8 (not wired).

    ``tp > 1``: respect the Megatron splits — column-parallel weights
    pack with blocks that never straddle a shard boundary
    (``col_shards=tp``), row-parallel weights need their K-groups to
    tile the per-shard contraction dim (asserted) so the ``[K//group,
    N]`` scales shard cleanly along axis 0."""
    from ..quant.tensor import dequantize, quantize_int4_groupwise

    import math as _math

    def to4(w, key):
        if isinstance(w, Q4Tensor):
            return w
        if isinstance(w, QTensor):
            w = dequantize(w)
        g = group
        if key in _INT4_ROW and tp > 1:
            # K-groups must tile the per-shard contraction dim so the
            # [K//g, N] scales shard cleanly; shrink g when K/tp is
            # small (finer groups only improve quality)
            K = w.shape[0]
            assert K % tp == 0, (key, K, tp)
            g = min(group, K // tp)
            if (K // tp) % g:
                g = _math.gcd(K // tp, group)
        shards = tp if (key in _INT4_COL or key == "lm_head") else 1
        out = quantize_int4_groupwise(w, group=g, col_shards=shards)
        jax.block_until_ready(out.packed)
        return out

    assert isinstance(params["layers"], (tuple, list)), (
        "int4 conversion runs after unstack_layers")
    # mutate the layer dicts IN PLACE so each int8 original frees as
    # soon as its int4 replacement exists — a copy-then-replace pass
    # would hold int8 + int4 + an f32 transient simultaneously, which
    # OOMs an 8B model on a 16 GB chip
    for lp in params["layers"]:
        for k in tuple(_INT4_COL) + tuple(_INT4_ROW):
            if k in lp:
                lp[k] = to4(lp.pop(k), k)
    if lm_head and "lm_head" in params:
        params["lm_head"] = to4(params.pop("lm_head"), "lm_head")
    return params


@dataclasses.dataclass(frozen=True)
class DecoderModel:
    """Stateless model: ``forward(params, tokens, positions, kv, attn_fn)``.

    ``tp_axis`` names the tensor-parallel mesh axis when the model runs
    inside ``shard_map`` (Megatron-style layout — see ``parallel/``):
    q/k/v/gate/up are column-sharded, o/down row-sharded with a psum
    epilogue, the embedding is vocab-sharded (masked-take + psum), and
    logits are all-gathered over the axis. With ``tp_axis=None`` the
    model is the plain single-device program.
    """

    cfg: ModelConfig
    tp_axis: Optional[str] = None
    # cap for the in-graph RoPE table: the engine passes its actual
    # serveable length (pages x page_size), so a 128k-context preset
    # doesn't embed a ~67 MB cos/sin constant in every compiled step
    rope_len: Optional[int] = None

    def _psum(self, x: jax.Array) -> jax.Array:
        return jax.lax.psum(x, self.tp_axis) if self.tp_axis else x

    def rope(self) -> Optional[Tuple[jax.Array, jax.Array]]:
        if self.cfg.position != "rope":
            return None
        length = min(self.rope_len or self.cfg.max_seq_len,
                     self.cfg.max_seq_len)
        return rope_table(length, self.cfg.head_dim,
                          self.cfg.rope_theta,
                          scaling=self.cfg.rope_scaling)

    def rope_local(self) -> Optional[Tuple[jax.Array, jax.Array]]:
        """Gemma-3 dual RoPE: the table sliding-window layers rotate
        with (``rope_local_theta``, never scaled); None when the model
        uses one theta everywhere."""
        if self.cfg.position != "rope" or self.cfg.rope_local_theta <= 0:
            return None
        length = min(self.rope_len or self.cfg.max_seq_len,
                     self.cfg.max_seq_len)
        return rope_table(length, self.cfg.head_dim,
                          self.cfg.rope_local_theta)

    def _rope_for_layer(self, layer: int, rope_cs, rope_loc):
        if rope_loc is not None and self.cfg.window_for_layer(layer) > 0:
            return rope_loc
        return rope_cs

    def embed(self, params: Params, tokens: jax.Array,
              positions: jax.Array) -> jax.Array:
        emb = params["embedding"]
        if self.tp_axis:
            # vocab-sharded table: masked local take + psum over the axis
            v_local = emb.shape[0]
            start = jax.lax.axis_index(self.tp_axis) * v_local
            local = tokens - start
            ok = (local >= 0) & (local < v_local)
            x = jnp.take(emb, jnp.clip(local, 0, v_local - 1), axis=0)
            x = self._psum(jnp.where(ok[..., None], x, 0))
        else:
            x = jnp.take(emb, tokens, axis=0)
        if self.cfg.position == "learned":
            x = x + jnp.take(params["pos_embedding"], positions, axis=0)
        if self.cfg.scale_embeddings:
            # Gemma scales by sqrt(D) rounded to the compute dtype
            dt = jnp_dtype(self.cfg.dtype)
            x = x * jnp.asarray(self.cfg.hidden_size ** 0.5, dt)
        return x.astype(jnp_dtype(self.cfg.dtype))

    def _norm(self, x, scale, bias):
        if self.cfg.norm == "rmsnorm":
            return rmsnorm(x, scale, self.cfg.norm_eps,
                           offset=self.cfg.rms_offset)
        return layernorm(x, scale, bias, self.cfg.norm_eps)

    def _split_fused_qkv(self, qkv: jax.Array):
        """Split a fused q|k|v projection by the tp-invariant
        H : KH : KH width ratio."""
        cfg = self.cfg
        qw = qkv.shape[-1] * cfg.num_heads // (
            cfg.num_heads + 2 * cfg.num_kv_heads)
        kw = (qkv.shape[-1] - qw) // 2
        return qkv[..., :qw], qkv[..., qw:qw + kw], qkv[..., qw + kw:]

    def _heads(self, q, k, v, B, T, positions, rope_cs, qk_scales=None):
        """Reshape flat projections to per-head layout + apply RoPE.

        ``qk_scales`` (Gemma-3 ``cfg.qk_norm``): per-head RMSNorm
        weights for q and k, applied over head_dim before RoPE."""
        dh = self.cfg.head_dim
        q = q.reshape(B, T, q.shape[-1] // dh, dh)
        k = k.reshape(B, T, k.shape[-1] // dh, dh)
        v = v.reshape(B, T, v.shape[-1] // dh, dh)
        if qk_scales is not None:
            qs, ks = qk_scales
            q = rmsnorm(q, qs, self.cfg.norm_eps,
                        offset=self.cfg.rms_offset)
            k = rmsnorm(k, ks, self.cfg.norm_eps,
                        offset=self.cfg.rms_offset)
        if rope_cs is not None:
            cos, sin = rope_cs
            q = apply_rope(q, positions, cos, sin)
            k = apply_rope(k, positions, cos, sin)
        return q, k, v

    def _block(self, lp: Params, x: jax.Array, kv: Any, layer: jax.Array,
               positions: jax.Array, attn_fn: AttentionFn,
               rope_cs: Optional[Tuple[jax.Array, jax.Array]],
               chain: Any = None, qkv_chain: Any = None):
        """``chain``/``qkv_chain`` (PackedChain) serve this layer's
        matmuls out of the megakernel's packed blocks when the per-op
        weight copies were dropped (``megakernel_drop_weights``);
        ``qkv_chain`` is the PREVIOUS layer's chain, which carries this
        layer's qkv projection as its tail op."""
        cfg = self.cfg
        B, T, D = x.shape
        if chain is not None:
            from ..ops.chain_linear import OP_T, packed_linear
            from ..utils.platform import default_interpret

            interp = default_interpret()

        w8a8 = cfg.quant == "int8"
        h = self._norm(x, lp["ln1_scale"], lp.get("ln1_bias"))
        # under TP these weights are column-sharded: local head slices
        if "w_qkv" in lp or qkv_chain is not None:
            if qkv_chain is not None:
                qkv = packed_linear(qkv_chain, (OP_T,), h,
                                    interpret=interp)
            else:
                qkv = linear(h, lp["w_qkv"], lp.get("b_qkv"), w8a8=w8a8)
            q, k, v = self._split_fused_qkv(qkv)
        else:
            q = linear(h, lp["wq"], lp.get("bq"), w8a8=w8a8)
            k = linear(h, lp["wk"], lp.get("bk"), w8a8=w8a8)
            v = linear(h, lp["wv"], lp.get("bv"), w8a8=w8a8)
        q, k, v = self._heads(
            q, k, v, B, T, positions, rope_cs,
            qk_scales=((lp["q_norm_scale"], lp["k_norm_scale"])
                       if cfg.qk_norm else None))

        attn_out, kv = attn_fn(q, k, v, kv, layer, positions)
        ao = attn_out.reshape(B, T, -1)
        if chain is not None:
            from ..ops.chain_linear import OP_D, OP_G, OP_O, OP_U

            # packed ops carry their biases in the sb table
            x = x + packed_linear(chain, (OP_O,), ao, interpret=interp)
            h2 = self._norm(x, lp["ln2_scale"], lp.get("ln2_bias"))
            if cfg.activation == "swiglu":
                if chain.I % chain.bn == 0:
                    # gate|up contiguous in the packing == fused w_gu
                    gu = packed_linear(chain, (OP_G, OP_U), h2,
                                       interpret=interp)
                    gate, up = jnp.split(gu, 2, axis=-1)
                else:
                    # gate's packed N is bn-padded: serve separately
                    gate = packed_linear(chain, (OP_G,), h2,
                                         interpret=interp)
                    up = packed_linear(chain, (OP_U,), h2,
                                       interpret=interp)
                gate = activation_fn("silu")(gate.astype(jnp.float32)
                                             ).astype(up.dtype)
                mid = gate * up
            else:
                mid = packed_linear(chain, (OP_U,), h2,
                                    act=cfg.activation, interpret=interp)
            return x + packed_linear(chain, (OP_D,), mid,
                                     interpret=interp), kv
        # row-parallel O projection: psum partial sums, bias added once
        attn_proj = self._psum(linear(ao, lp["wo"], w8a8=w8a8))
        if "bo" in lp:
            attn_proj = attn_proj + lp["bo"].astype(attn_proj.dtype)
        if cfg.post_norms:          # Gemma-2 sandwich: norm pre-residual
            attn_proj = self._norm(attn_proj, lp["post_attn_scale"], None)
        x = x + attn_proj

        h2 = self._norm(x, lp["ln2_scale"], lp.get("ln2_bias"))
        if cfg.num_experts > 0:
            x = x + self._moe(lp, h2, w8a8)
            return x, kv
        if cfg.is_glu:
            gact = cfg.glu_gate_act
            if "w_gu" in lp:
                gu = linear(h2, lp["w_gu"], w8a8=w8a8)
                gate, up = jnp.split(gu, 2, axis=-1)
                gate = activation_fn(gact)(gate.astype(jnp.float32)
                                           ).astype(up.dtype)
            else:
                gate = linear(h2, lp["w_gate"], act=gact, w8a8=w8a8)
                up = linear(h2, lp["w_up"], w8a8=w8a8)
            mlp = self._psum(linear(gate * up, lp["w_down"], w8a8=w8a8))
        else:
            mid = linear(h2, lp["w_up"], lp.get("b_up"), act=cfg.activation,
                         w8a8=w8a8)
            mlp = self._psum(linear(mid, lp["w_down"], w8a8=w8a8))
            if "b_down" in lp:
                mlp = mlp + lp["b_down"].astype(mlp.dtype)
        if cfg.post_norms:
            mlp = self._norm(mlp, lp["post_mlp_scale"], None)
        return x + mlp, kv

    def _moe(self, lp: Params, h2: jax.Array, w8a8: bool) -> jax.Array:
        """Mixture-of-Experts MLP (Mixtral-style): top-k routing with
        softmax over the selected logits, SwiGLU experts.

        Expert parallelism rides the same ``'model'`` mesh axis as TP:
        each shard holds ``num_experts / tp`` whole experts
        (``parallel/specs.py``) and computes its local experts for ALL
        tokens with gate-masked outputs, psum-combined — no all-to-all.
        For decode (weight-stream bound) this is near speed-of-light at
        moderate expert counts: each step streams only the shard's local
        expert weights, and with batch*top_k draws approaching E the
        masked-token FLOP waste buys freedom from gather/sort dispatch.
        (A ragged sort-based dispatch for compute-bound prefill at large
        E is the known follow-up.)
        """
        cfg = self.cfg
        k = cfg.experts_per_tok
        r = linear(h2, lp["router"]).astype(jnp.float32)     # [B,T,E]
        topv, topi = jax.lax.top_k(r, k)
        gates = jax.nn.softmax(topv, axis=-1)                # [B,T,k]

        def expert(leaf, e):
            if isinstance(leaf, QTensor):
                return QTensor(leaf.values[e], leaf.scales[e])
            return leaf[e]

        wd = lp["we_down"]
        E_local = (wd.values if isinstance(wd, QTensor) else wd).shape[0]
        off = (jax.lax.axis_index(self.tp_axis) * E_local
               if self.tp_axis else 0)
        S = h2.shape[0] * h2.shape[1] * k
        if cfg.quant != "int8" and S >= E_local * _GMM_BM:
            # compute-bound prefill: exact sorted dispatch through the
            # grouped-matmul kernel (each token row hits only its
            # routed experts) instead of the E_local/k x masked waste
            return self._psum(self._moe_dispatch(
                lp, h2, topi, gates, E_local, off))
        mlp = jnp.zeros(h2.shape[:-1] + (
            (wd.values if isinstance(wd, QTensor) else wd).shape[-1],),
            h2.dtype)
        for e in range(E_local):
            ge = jnp.where(topi == off + e, gates, 0.0).sum(-1)  # [B,T]
            if "we_gu" in lp:
                gu = linear(h2, expert(lp["we_gu"], e), w8a8=w8a8)
                gate_a, up = jnp.split(gu, 2, axis=-1)
                gate_a = activation_fn("silu")(
                    gate_a.astype(jnp.float32)).astype(up.dtype)
            else:
                gate_a = linear(h2, expert(lp["we_gate"], e), act="silu",
                                w8a8=w8a8)
                up = linear(h2, expert(lp["we_up"], e), w8a8=w8a8)
            ye = linear(gate_a * up, expert(lp["we_down"], e), w8a8=w8a8)
            mlp = mlp + ge[..., None].astype(ye.dtype) * ye
        return self._psum(mlp)

    def _moe_dispatch(self, lp: Params, h2: jax.Array, topi: jax.Array,
                      gates: jax.Array, E_local: int,
                      off) -> jax.Array:
        """Exact sorted MoE dispatch (``ops/gmm.py``): flatten the
        ``B*T*k`` (token, expert) slots, stable-sort by local expert,
        pad each expert's range to a row-block multiple, run the three
        expert matmuls as grouped matmuls, and gate-combine back per
        token. Static shapes throughout (the padded row count is the
        worst-case ``S + E_local*bm``); under expert parallelism,
        slots routed to non-local experts keep their rows (gate 0,
        clamped to group 0) and vanish in the psum."""
        from ..ops.gmm import grouped_matmul
        from ..utils.platform import default_interpret

        cfg = self.cfg
        interp = default_interpret()
        B, T, D = h2.shape
        N, kk = B * T, cfg.experts_per_tok
        S = N * kk
        bm = _GMM_BM

        te = topi.reshape(S)
        tg = gates.reshape(S)
        local = (te >= off) & (te < off + E_local)
        e_loc = jnp.where(local, te - off, 0)
        sg_all = jnp.where(local, tg, 0.0)

        order = jnp.argsort(e_loc)                   # stable
        se = e_loc[order]
        st = order // kk                             # token per slot
        sg = sg_all[order]
        ones = jnp.ones((S,), jnp.int32)
        counts = jnp.zeros((E_local,), jnp.int32).at[se].add(ones)
        padded = ((counts + bm - 1) // bm) * bm
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(padded)[:-1]])
        cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1]])
        pos = jnp.arange(S, dtype=jnp.int32) - cum[se]
        dest = starts[se] + pos

        from ..utils.common import round_up
        Npad = round_up(S, bm) + E_local * bm
        xp = jnp.zeros((Npad, D), h2.dtype).at[dest].set(
            h2.reshape(N, D)[st])
        blk0 = jnp.arange(Npad // bm, dtype=jnp.int32) * bm
        gb = (jnp.searchsorted(starts, blk0, side="right") - 1
              ).astype(jnp.int32)

        if "we_gu" in lp:
            gu = grouped_matmul(xp, lp["we_gu"], gb, bm=bm,
                                interpret=interp)
            gate_a, up = jnp.split(gu, 2, axis=-1)
        else:
            gate_a = grouped_matmul(xp, lp["we_gate"], gb, bm=bm,
                                    interpret=interp)
            up = grouped_matmul(xp, lp["we_up"], gb, bm=bm,
                                interpret=interp)
        gate_a = activation_fn("silu")(
            gate_a.astype(jnp.float32)).astype(up.dtype)
        y = grouped_matmul(gate_a * up, lp["we_down"], gb, bm=bm,
                           interpret=interp)
        rows = y[dest] * sg[:, None].astype(y.dtype)
        out = jnp.zeros((N, y.shape[-1]), h2.dtype).at[st].add(
            rows.astype(h2.dtype))
        return out.reshape(B, T, -1)

    def forward(self, params: Params, tokens: jax.Array, positions: jax.Array,
                kv_caches: Any, attn_fn: AttentionFn,
                return_hidden: bool = False):
        """Run the decoder. tokens/positions: ``[B, T]``.

        ``kv_caches`` is the full multi-layer cache pytree (leaves have
        a leading ``num_layers`` axis); it rides the layer scan as a
        carry so pool updates stay in place, and ``attn_fn`` receives it
        whole together with the traced layer index.
        Returns ``(logits[B, T, V] f32, new_kv_caches)``.
        """
        if ("chains" in params and tokens.shape[1] == 1
                and self.tp_axis is None):
            return self._forward_chained(params, tokens, positions,
                                         kv_caches, attn_fn,
                                         return_hidden)
        x = self.embed(params, tokens, positions)
        rope_cs = self.rope()
        rope_loc = self.rope_local()

        layers = params["layers"]
        # megakernel with dropped per-op weights: serve every matmul
        # from the packed blocks (chain l-1's tail = layer l's qkv)
        chains = params.get("chains")
        dropped = (chains is not None and len(layers) > 0
                   and isinstance(layers, (tuple, list))
                   and "wo" not in layers[0])
        if isinstance(layers, (tuple, list)):
            # unrolled: per-layer weight arrays, no per-layer slice copy
            new_kv = kv_caches
            for l, lp in enumerate(layers):
                x, new_kv = self._block(
                    lp, x, new_kv, l, positions, attn_fn,
                    self._rope_for_layer(l, rope_cs, rope_loc),
                    chain=chains[l] if dropped else None,
                    qkv_chain=(chains[l - 1] if dropped and l > 0
                               else None))
        else:
            if rope_loc is not None:
                raise ValueError(
                    "rope_local_theta needs the unrolled layer loop "
                    "(RuntimeConfig.scan_layers=False): the per-layer "
                    "RoPE table choice is static")

            def body(carry, xs):
                x, kv = carry
                lp, layer = xs
                y, kv = self._block(lp, x, kv, layer, positions, attn_fn,
                                    rope_cs)
                return (y, kv), None

            (x, new_kv), _ = jax.lax.scan(
                body, (x, kv_caches),
                (layers, jnp.arange(self.cfg.num_layers)))
        x = self._norm(x, params["final_norm_scale"],
                       params.get("final_norm_bias"))
        if return_hidden:
            return x, new_kv
        logits = self.logits(params, x)
        return logits, new_kv

    def _forward_chained(self, params: Params, tokens: jax.Array,
                         positions: jax.Array, kv_caches: Any,
                         attn_fn: AttentionFn,
                         return_hidden: bool = False):
        """Decode (T=1) through the chained weight-stream megakernel:
        one :func:`~..ops.chain_linear.chain_decode` call per layer
        covers o-proj, norm, the MLP pair, and the *next* layer's qkv
        (``models/chained.py``); only layer 0's qkv and the LM head run
        as standalone ops. Falls outside this path: prefill (T>1), TP,
        MoE, w8a8 — ``forward`` dispatches those to the per-op blocks.
        """
        from ..ops.chain_linear import chain_decode
        from ..utils.platform import default_interpret

        cfg = self.cfg
        interp = default_interpret()
        x = self.embed(params, tokens, positions)          # [B, 1, D]
        rope_cs = self.rope()
        rope_loc = self.rope_local()
        layers, chains = params["layers"], params["chains"]
        B = x.shape[0]
        w8a8 = cfg.quant == "int8"      # layer-0 qkv only; the chains
        # re-quantize activations in-kernel themselves

        lp0 = layers[0]
        h = self._norm(x, lp0["ln1_scale"], lp0.get("ln1_bias"))
        qkv = linear(h, lp0["w_qkv"], lp0.get("b_qkv"), w8a8=w8a8)

        new_kv = kv_caches
        for l, lp in enumerate(layers):
            q, k, v = self._split_fused_qkv(qkv)
            q, k, v = self._heads(
                q, k, v, B, 1, positions,
                self._rope_for_layer(l, rope_cs, rope_loc),
                qk_scales=((lp["q_norm_scale"], lp["k_norm_scale"])
                           if cfg.qk_norm else None))
            attn_out, new_kv = attn_fn(q, k, v, new_kv, l, positions)
            x2, tail = chain_decode(chains[l],
                                    attn_out.reshape(B, -1),
                                    x.reshape(B, -1), interpret=interp)
            x = x2[:, None, :]
            if tail is not None:
                qkv = tail[:, None, :]
        x = self._norm(x, params["final_norm_scale"],
                       params.get("final_norm_bias"))
        if return_hidden:
            return x, new_kv
        return self.logits(params, x), new_kv

    def logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        """LM head (the component the reference omits — Appendix A).

        Under TP the head is vocab-sharded; local logits are
        all-gathered (tiled) so sampling sees the full vocab.
        """
        if self.cfg.tie_embeddings:
            emb = params["embedding"]  # kept unquantized by quantize_params
            # contract in the stored dtype with f32 MXU accumulation:
            # an f32 einsum would tempt XLA into materializing an f32
            # copy of the embedding (2x the LM-head weight stream —
            # ~31% of a GPT-2 decode step's bytes); the operands are
            # already bf16-rounded, so products are exact either way
            local = jax.lax.dot_general(
                hidden, emb, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            local = linear(hidden, params["lm_head"]).astype(jnp.float32)
        if self.tp_axis:
            local = jax.lax.all_gather(local, self.tp_axis, axis=-1,
                                       tiled=True)
        cap = self.cfg.final_logit_softcap
        if cap > 0:                 # Gemma-2 tanh soft-capping
            local = cap * jnp.tanh(local / cap)
        return local
