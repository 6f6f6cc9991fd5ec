"""Debug introspection: attention-weight / logit export.

Capability parity with the reference CPU kernel's optional export of
attention weights and raw logits (``attention_cpu/cpu_attention_kernel
.cpp:123-126``, struct fields ``cpu_attention_kernel.hpp:36-39``) —
here a dense-oracle replay of the model that returns per-layer
attention probability maps alongside logits, for inspection and
regression triage. Not a hot path.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import DecoderModel, Params


def attention_maps(model: DecoderModel, params: Params,
                   tokens: Sequence[int]
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Run ``tokens`` through the model capturing attention.

    Returns ``(attn [L, H, T, T], logits [T, V])`` — softmax attention
    probabilities per layer/head under the exact causal mask.
    """
    from ..engine.backends import DenseKVBackend

    cfg = model.cfg
    toks = jnp.asarray(tokens, jnp.int32)[None, :]
    T = toks.shape[1]
    positions = jnp.arange(T)[None, :]
    dense = DenseKVBackend(cfg, kv_dtype="float32")
    captured: List[jax.Array] = []
    base_attn = dense.attn_fn
    scale = 1.0 / math.sqrt(cfg.head_dim)

    def capturing_attn(q, k, v, kv, layer, pos):
        out, kv = base_attn(q, k, v, kv, layer, pos)
        # recompute the probability map densely for capture
        G = q.shape[2] // k.shape[2]
        kk = jnp.repeat(k, G, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                       kk.astype(jnp.float32)) * scale
        causal = pos[:, None, :, None] >= pos[:, None, None, :]
        s = jnp.where(causal, s, -1e30)
        captured.append(jax.nn.softmax(s, axis=-1)[0])
        return out, kv

    def layer_slice(v, l):
        from ..quant.tensor import QTensor

        if isinstance(v, QTensor):
            return QTensor(v.values[l], v.scales[l])
        return v[l]

    # unrolled layer loop (model.forward's scan would trace the capture
    # hook once instead of per layer); params may be the canonical
    # stacked dict or the engine's unstacked tuple of per-layer dicts
    x = model.embed(params, toks, positions)
    rope_cs = model.rope()
    kv = dense.init_cache(1, T)
    layers = params["layers"]
    for l in range(cfg.num_layers):
        if isinstance(layers, (tuple, list)):
            lp = layers[l]
        else:
            lp = {k: layer_slice(v, l) for k, v in layers.items()}
        x, kv = model._block(lp, x, kv, jnp.int32(l), positions,
                             capturing_attn, rope_cs)
    x = model._norm(x, params["final_norm_scale"],
                    params.get("final_norm_bias"))
    logits = model.logits(params, x)
    attn = np.stack([np.asarray(a) for a in captured])
    return attn, np.asarray(logits[0])
