"""Streaming HF-checkpoint import: safetensors shards -> per-layer INT8
quantization -> native checkpoint, at ~one-tensor peak host memory.

The scalable version of ``hf_import.py`` (which needs the whole f32
``state_dict`` resident — ≈32 GB for an 8B model). This module walks
the safetensors shard index, loads ONE tensor at a time, optionally
quantizes it per-channel (symmetric absmax, the reference's intended
offline pipeline ``decoder/int8_decoder.cpp:43-89`` with its signed-max
bug fixed), and writes straight into pre-allocated stacked INT8/bf16
arrays in the native checkpoint layout (``models/checkpoint.py``), so
peak memory is the final (quantized) parameter set plus one f32 tensor
— not the f32 model. Reference weight tree: ``weights/README.md:26-59``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..config import ModelConfig

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:                    # pragma: no cover
    _BF16 = np.dtype(np.float32)

#: weight keys that get INT8-quantized (matches model._QUANT_KEYS)
QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
              "we_gate", "we_up", "we_down")


class ShardReader:
    """Random access to tensors across a safetensors shard set.

    Handles both single-file ``model.safetensors`` and sharded
    ``model.safetensors.index.json`` checkpoints; file handles open
    lazily and tensors load one at a time (true streaming IO)."""

    def __init__(self, hf_dir: str):
        self.dir = hf_dir
        index = os.path.join(hf_dir, "model.safetensors.index.json")
        single = os.path.join(hf_dir, "model.safetensors")
        self._map: Dict[str, str] = {}
        if os.path.exists(index):
            meta = json.load(open(index))
            self._map = dict(meta["weight_map"])
        elif os.path.exists(single):
            from safetensors import safe_open

            with safe_open(single, framework="numpy") as f:
                for k in f.keys():
                    self._map[k] = "model.safetensors"
        else:
            raise FileNotFoundError(
                f"no model.safetensors[.index.json] under {hf_dir}")
        self._open: Dict[str, object] = {}

    def keys(self):
        return self._map.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def get(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        fname = self._map[name]
        f = self._open.get(fname)
        if f is None:
            f = safe_open(os.path.join(self.dir, fname),
                          framework="numpy")
            self._open[fname] = f
        t = f.get_tensor(name)
        if t.dtype == _BF16 or t.dtype.kind != "f":
            t = t.astype(np.float32)
        return np.asarray(t, np.float32)


def config_from_hf(hf_dir: str, name: Optional[str] = None) -> ModelConfig:
    """Derive a :class:`ModelConfig` from an HF checkpoint's
    ``config.json`` — so any GPT-2 / Llama / Mistral / Qwen2 / Mixtral
    -family size imports without a hand-written preset (the reference
    hardcoded one geometry at every frontend, ``api/router.py:14``).
    """
    with open(os.path.join(hf_dir, "config.json")) as f:
        d = json.load(f)
    mt = d.get("model_type", "llama")
    if mt == "gpt2":
        D = d["n_embd"]
        return ModelConfig(
            name=name or "gpt2-hf",
            vocab_size=d["vocab_size"], hidden_size=D,
            num_layers=d["n_layer"], num_heads=d["n_head"],
            num_kv_heads=d["n_head"], head_dim=D // d["n_head"],
            intermediate_size=d.get("n_inner") or 4 * D,
            max_seq_len=d.get("n_positions", 1024),
            norm="layernorm", norm_eps=d.get("layer_norm_epsilon", 1e-5),
            activation="gelu", position="learned",
            tie_embeddings=True).validate()
    if mt in ("gemma2", "gemma3", "gemma3_text"):
        if mt == "gemma3" and "text_config" in d:
            d = d["text_config"]     # multimodal wrapper: text tower
        gemma3 = mt != "gemma2"
        D = d["hidden_size"]
        H = d["num_attention_heads"]
        rs = d.get("rope_scaling")   # gemma3 >=4B: linear factor 8
        return ModelConfig(
            name=name or f"{mt}-hf",
            vocab_size=d["vocab_size"], hidden_size=D,
            num_layers=d["num_hidden_layers"], num_heads=H,
            num_kv_heads=d.get("num_key_value_heads", H),
            head_dim=d.get("head_dim") or D // H,
            intermediate_size=d["intermediate_size"],
            max_seq_len=d.get("max_position_embeddings", 8192),
            norm="rmsnorm", norm_eps=d.get("rms_norm_eps", 1e-6),
            activation="geglu", position="rope",
            rope_theta=float(d.get("rope_theta", 10000.0)),
            rope_local_theta=(float(d.get("rope_local_base_freq")
                                    or 10000.0) if gemma3 else 0.0),
            rope_scaling=rs if gemma3 else None,
            use_qkv_bias=d.get("attention_bias", False),
            use_mlp_bias=False,
            sliding_window=int(d.get("sliding_window") or 4096),
            sliding_window_pattern=int(
                d.get("sliding_window_pattern")
                or (6 if gemma3 else 2)),
            tie_embeddings=d.get("tie_word_embeddings", True),
            rms_offset=1.0, post_norms=True, scale_embeddings=True,
            qk_norm=gemma3,
            attn_logit_softcap=float(
                d.get("attn_logit_softcapping") or 0.0),
            final_logit_softcap=float(
                d.get("final_logit_softcapping") or 0.0),
            query_pre_attn_scalar=float(
                d.get("query_pre_attn_scalar") or 0.0),
        ).validate()
    if mt not in ("llama", "mistral", "mixtral", "qwen2", "phi3"):
        raise ValueError(f"unsupported HF model_type: {mt!r}")
    rs = d.get("rope_scaling")
    if rs and rs.get("rope_type", rs.get("type")) not in (
            "default", "linear", "llama3", "longrope"):
        # rescales inv_freq at every position; importing without it
        # would silently produce wrong logits — refuse what ops/rope.py
        # doesn't implement
        raise ValueError(f"unsupported rope_scaling: {rs!r}")
    if rs and rs.get("rope_type", rs.get("type")) == "longrope":
        # Phi-3 stores the switch point / trained length at the config
        # root; ops/rope.py reads them from the scaling dict
        rs = dict(rs)
        rs.setdefault("original_max_position_embeddings",
                      d.get("original_max_position_embeddings",
                            d.get("max_position_embeddings", 4096)))
        rs.setdefault("max_position_embeddings",
                      d.get("max_position_embeddings", 4096))
    D = d["hidden_size"]
    H = d["num_attention_heads"]
    sw = 0
    if d.get("sliding_window") and d.get("use_sliding_window", True):
        sw = int(d["sliding_window"])
    return ModelConfig(
        name=name or f"{mt}-hf",
        vocab_size=d["vocab_size"], hidden_size=D,
        num_layers=d["num_hidden_layers"], num_heads=H,
        num_kv_heads=d.get("num_key_value_heads", H),
        head_dim=d.get("head_dim") or D // H,
        intermediate_size=d["intermediate_size"],
        max_seq_len=d.get("max_position_embeddings", 4096),
        norm="rmsnorm", norm_eps=d.get("rms_norm_eps", 1e-6),
        activation="swiglu", position="rope",
        rope_theta=float(d.get("rope_theta", 10000.0)),
        use_qkv_bias=d.get("attention_bias", mt == "qwen2"),
        use_mlp_bias=d.get("mlp_bias", False),
        sliding_window=sw,
        tie_embeddings=d.get("tie_word_embeddings", False),
        num_experts=d.get("num_local_experts", 0),
        experts_per_tok=d.get("num_experts_per_tok", 2),
        rope_scaling=rs,
    ).validate()


def _quant_np(w: np.ndarray):
    """Per-output-channel symmetric absmax INT8 (numpy twin of
    ``quant.tensor.quantize_per_channel`` for one ``[in, out]`` layer)."""
    absmax = np.abs(w).max(axis=-2, keepdims=True)
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _llama_layer_map(i: int, post_norms: bool = False,
                     qk_norm: bool = False) -> Dict[str, tuple]:
    """our-key -> (hf key, transpose). torch Linear stores [out, in].

    ``post_norms`` (Gemma-2 sandwich layout): HF's
    ``post_attention_layernorm`` is the *post*-attention sandwich norm
    and ``pre_feedforward_layernorm`` takes the pre-MLP (our ``ln2``)
    role."""
    p = f"model.layers.{i}."
    m = {
        "ln1_scale": (p + "input_layernorm.weight", False),
        "wq": (p + "self_attn.q_proj.weight", True),
        "wk": (p + "self_attn.k_proj.weight", True),
        "wv": (p + "self_attn.v_proj.weight", True),
        "wo": (p + "self_attn.o_proj.weight", True),
        "w_gate": (p + "mlp.gate_proj.weight", True),
        "w_up": (p + "mlp.up_proj.weight", True),
        "w_down": (p + "mlp.down_proj.weight", True),
    }
    if post_norms:
        m["ln2_scale"] = (p + "pre_feedforward_layernorm.weight", False)
        m["post_attn_scale"] = (p + "post_attention_layernorm.weight",
                                False)
        m["post_mlp_scale"] = (p + "post_feedforward_layernorm.weight",
                               False)
    else:
        m["ln2_scale"] = (p + "post_attention_layernorm.weight", False)
    if qk_norm:                     # Gemma-3 per-head q/k RMSNorm
        m["q_norm_scale"] = (p + "self_attn.q_norm.weight", False)
        m["k_norm_scale"] = (p + "self_attn.k_norm.weight", False)
    # qwen2-style attention biases (cfg.use_qkv_bias)
    for ours, hf in (("bq", "self_attn.q_proj.bias"),
                     ("bk", "self_attn.k_proj.bias"),
                     ("bv", "self_attn.v_proj.bias")):
        m[ours] = (p + hf, False)
    return m


def _gpt2_layer_keys(i: int) -> Dict[str, tuple]:
    p = f"h.{i}."
    return {
        "ln1_scale": (p + "ln_1.weight", False),
        "ln1_bias": (p + "ln_1.bias", False),
        "ln2_scale": (p + "ln_2.weight", False),
        "ln2_bias": (p + "ln_2.bias", False),
        "wo": (p + "attn.c_proj.weight", False),
        "bo": (p + "attn.c_proj.bias", False),
        "w_up": (p + "mlp.c_fc.weight", False),
        "b_up": (p + "mlp.c_fc.bias", False),
        "w_down": (p + "mlp.c_proj.weight", False),
        "b_down": (p + "mlp.c_proj.bias", False),
    }


def import_hf_streaming(hf_dir: str, cfg: ModelConfig,
                        quant: Optional[str] = None,
                        out_path: Optional[str] = None) -> Dict:
    """Stream-convert an HF checkpoint directory.

    Returns the flat checkpoint dict (``checkpoint.py`` key layout:
    ``layers/wq.qvalues`` etc.); when ``out_path`` is given, also writes
    it as a native ``.npz``. ``quant``: None keeps bf16 weights,
    ``"int8"``/``"int8-weight"`` quantizes matmul weights + lm_head.
    """
    r = ShardReader(hf_dir)
    gpt2 = any(k.endswith("wte.weight") for k in r.keys())
    # some exports prefix with "transformer."
    prefix = ""
    for k in r.keys():
        if k.startswith("transformer."):
            prefix = "transformer."
            break

    def get(name):
        return r.get(prefix + name if (prefix + name) in r else name)

    def has(name):
        return (prefix + name) in r or name in r

    L = cfg.num_layers
    do_quant = quant in ("int8", "int8-weight")
    flat: Dict[str, np.ndarray] = {}

    def put_layer_tensor(ours: str, i: int, w: np.ndarray):
        """Write layer ``i``'s tensor into its stacked destination,
        allocating the stacked array on first touch."""
        if do_quant and ours in QUANT_KEYS:
            q, s = _quant_np(w)
            kv_ = f"layers/{ours}.qvalues"
            ks_ = f"layers/{ours}.qscales"
            if kv_ not in flat:
                flat[kv_] = np.empty((L,) + q.shape, np.int8)
                flat[ks_] = np.empty((L,) + s.shape, np.float32)
            flat[kv_][i] = q
            flat[ks_][i] = s
        else:
            tgt = _BF16 if w.dtype.kind == "f" else w.dtype
            key = f"layers/{ours}"
            if key not in flat:
                flat[key] = np.empty((L,) + w.shape, tgt)
            flat[key][i] = w.astype(tgt)

    def put_expert_tensor(ours: str, i: int, e: int, w: np.ndarray):
        """Write expert ``e`` of layer ``i`` into its ``[L, E, ...]``
        stacked destination (MoE: Mixtral ``block_sparse_moe``)."""
        E = cfg.num_experts
        if do_quant and ours in QUANT_KEYS:
            q, sc = _quant_np(w)
            kv_ = f"layers/{ours}.qvalues"
            ks_ = f"layers/{ours}.qscales"
            if kv_ not in flat:
                flat[kv_] = np.empty((L, E) + q.shape, np.int8)
                flat[ks_] = np.empty((L, E) + sc.shape, np.float32)
            flat[kv_][i, e] = q
            flat[ks_][i, e] = sc
        else:
            key = f"layers/{ours}"
            if key not in flat:
                flat[key] = np.empty((L, E) + w.shape, _BF16)
            flat[key][i, e] = w.astype(_BF16)

    if gpt2:
        for i in range(L):
            # fused c_attn [D, 3D] -> wq|wk|wv (+ biases); HF GPT-2 uses
            # Conv1D so weights are already [in, out]
            D = cfg.hidden_size
            ca = get(f"h.{i}.attn.c_attn.weight")
            cb = get(f"h.{i}.attn.c_attn.bias")
            for j, ours in enumerate(("wq", "wk", "wv")):
                put_layer_tensor(ours, i, ca[:, j * D:(j + 1) * D])
            for j, ours in enumerate(("bq", "bk", "bv")):
                put_layer_tensor(ours, i, cb[j * D:(j + 1) * D])
            del ca, cb
            for ours, (hf, _) in _gpt2_layer_keys(i).items():
                put_layer_tensor(ours, i, get(hf))
        flat["embedding"] = get("wte.weight").astype(_BF16)
        flat["pos_embedding"] = get("wpe.weight").astype(_BF16)
        flat["final_norm_scale"] = get("ln_f.weight").astype(_BF16)
        flat["final_norm_bias"] = get("ln_f.bias").astype(_BF16)
    else:
        for i in range(L):
            # Phi-3 stores attention and MLP projections pre-fused
            # (qkv_proj [(H+2KH)*dh, D], gate_up_proj [2I, D]): split
            # into our per-projection keys (fuse_projections re-fuses
            # into the engine's w_qkv / w_gu layout at load)
            fq = f"model.layers.{i}.self_attn.qkv_proj.weight"
            if has(fq):
                w = get(fq)
                nq = cfg.num_heads * cfg.head_dim
                nkv = cfg.num_kv_heads * cfg.head_dim
                put_layer_tensor("wq", i, w[:nq].T)
                put_layer_tensor("wk", i, w[nq:nq + nkv].T)
                put_layer_tensor("wv", i, w[nq + nkv:].T)
                del w
            fg = f"model.layers.{i}.mlp.gate_up_proj.weight"
            if has(fg):
                w = get(fg)
                half = cfg.intermediate_size
                put_layer_tensor("w_gate", i, w[:half].T)
                put_layer_tensor("w_up", i, w[half:].T)
                del w
            for ours, (hf, transpose) in _llama_layer_map(
                    i, post_norms=cfg.post_norms,
                    qk_norm=cfg.qk_norm).items():
                if ours.startswith("w_") and cfg.num_experts > 0:
                    continue           # MoE: no dense MLP
                if not has(hf):
                    continue           # optional biases / fused-split
                w = get(hf)
                put_layer_tensor(ours, i, w.T if transpose else w)
            if cfg.num_experts > 0:
                # Mixtral block_sparse_moe: gate router + per-expert
                # w1 (gate) / w3 (up) / w2 (down), torch [out, in]
                pre = f"model.layers.{i}.block_sparse_moe."
                put_layer_tensor("router", i, get(pre + "gate.weight").T)
                for e in range(cfg.num_experts):
                    pe = pre + f"experts.{e}."
                    put_expert_tensor("we_gate", i, e,
                                      get(pe + "w1.weight").T)
                    put_expert_tensor("we_down", i, e,
                                      get(pe + "w2.weight").T)
                    put_expert_tensor("we_up", i, e,
                                      get(pe + "w3.weight").T)
        flat["embedding"] = get("model.embed_tokens.weight").astype(_BF16)
        flat["final_norm_scale"] = get("model.norm.weight").astype(_BF16)
        if not cfg.tie_embeddings:
            head = (get("lm_head.weight")
                    if has("lm_head.weight")
                    else get("model.embed_tokens.weight")).T
            if do_quant:
                q, s = _quant_np(head)
                flat["lm_head.qvalues"], flat["lm_head.qscales"] = q, s
            else:
                flat["lm_head"] = head.astype(_BF16)

    if out_path is not None:
        from .checkpoint import save_flat

        save_flat(flat, out_path)
    return flat


def load_flat_params(flat: Dict[str, np.ndarray], dtype=None):
    """Rebuild the param pytree from a flat dict (same layout
    ``checkpoint.load_params`` reads from an ``.npz``)."""
    import jax.numpy as jnp

    from ..quant.tensor import QTensor
    from .checkpoint import _insert

    tree: Dict = {}
    qt: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in flat.items():
        if key.endswith(".qvalues") or key.endswith(".qscales"):
            base, kind = key.rsplit(".", 1)
            qt.setdefault(base, {})[kind] = v
            continue
        arr = jnp.asarray(v)
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        _insert(tree, key.split("/"), arr)
    for base, parts in qt.items():
        _insert(tree, base.split("/"),
                QTensor(jnp.asarray(parts["qvalues"]),
                        jnp.asarray(parts["qscales"])))
    return tree


def main() -> None:
    """Offline import/quantize CLI (the reference's
    ``INT8Decoder::quantize_weights`` as a standalone tool)."""
    import argparse

    from ..config import preset

    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-dir", required=True)
    ap.add_argument("--model", default=None,
                    help="preset name (default: derive the geometry "
                         "from the checkpoint's config.json)")
    ap.add_argument("--output", required=True, help=".npz checkpoint")
    ap.add_argument("--quant", default="int8-weight",
                    choices=("none", "int8", "int8-weight"))
    args = ap.parse_args()
    cfg = (preset(args.model) if args.model
           else config_from_hf(args.hf_dir))
    q = None if args.quant == "none" else args.quant
    flat = import_hf_streaming(args.hf_dir, cfg, quant=q,
                               out_path=args.output)
    total = sum(v.nbytes for v in flat.values())
    print(f"wrote {args.output}: {len(flat)} tensors, "
          f"{total / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
