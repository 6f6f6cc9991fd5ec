"""Typed configuration system, actually wired into every layer.

Replaces the reference's declared-but-unwired YAML directory
(``config/model_config.yaml``, ``runtime_config.yaml``,
``weight_paths.yaml``, ``chat_template.json`` — cf. reference
``config/README.md:27-28`` "Fields need to be injected"): here a single
:class:`FrameworkConfig` is loaded from YAML/JSON (same section split as
the reference) with CLI overrides, and is consumed by the model, engine,
KV-cache manager, scheduler, servers and CLIs.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {k: _asdict(v) for k, v in dataclasses.asdict(obj).items()}
    return obj


@dataclass
class ModelConfig:
    """Architecture of a decoder-only transformer.

    Defaults describe the reference's GPT-2-124M target
    (reference ``config/model_config.yaml:1-12``).
    """

    name: str = "gpt2-124m"
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    num_kv_heads: int = 12          # < num_heads => GQA (Llama-3 family)
    head_dim: int = 64
    intermediate_size: int = 3072   # MLP width (4*hidden for GPT-2)
    max_seq_len: int = 2048

    norm: str = "layernorm"         # "layernorm" | "rmsnorm"
    norm_eps: float = 1e-5
    activation: str = "gelu"        # "gelu" | "relu" | "swiglu" | "silu"
    position: str = "learned"       # "learned" | "rope"
    rope_theta: float = 10000.0
    use_qkv_bias: bool = True
    use_mlp_bias: bool = True
    sliding_window: int = 0         # >0: Mistral-style windowed attention
    # >1: only every ``pattern``-th layer is global, the rest use the
    # sliding window (Gemma-2: 2 — even layers windowed, odd global).
    # 1 = every layer windowed (Mistral). Page reclamation only applies
    # at pattern 1 (global layers keep all pages live).
    sliding_window_pattern: int = 1
    tie_embeddings: bool = True     # LM head = embedding^T
    # Gemma-family extras ----------------------------------------------------
    rms_offset: float = 0.0         # rmsnorm scale = (offset + weight)
    post_norms: bool = False        # sandwich norms around attn/MLP out
    scale_embeddings: bool = False  # embeddings *= sqrt(hidden_size)
    attn_logit_softcap: float = 0.0   # >0: s = cap*tanh(s/cap) pre-mask
    final_logit_softcap: float = 0.0  # >0: on LM-head logits
    # >0: attention scale = query_pre_attn_scalar**-0.5 (Gemma-2;
    # 0 = default head_dim**-0.5)
    query_pre_attn_scalar: float = 0.0
    # Gemma-3: per-head RMSNorm on q and k (over head_dim, zero-centred
    # like every Gemma norm) before RoPE
    qk_norm: bool = False
    # >0: sliding-window layers rotate at this theta, unscaled (Gemma-3
    # dual RoPE — local 10k, global rope_theta 1M + rope_scaling).
    # Needs the unrolled layer loop (static per-layer table choice).
    rope_local_theta: float = 0.0
    # Mixture-of-Experts (Mixtral-style): >0 replaces the dense MLP with
    # ``num_experts`` SwiGLU experts, top-``experts_per_tok`` routing
    # (softmax over the selected logits). Experts shard over the 'model'
    # mesh axis (expert parallelism) — see models/model.py.
    num_experts: int = 0
    experts_per_tok: int = 2
    # HF-style rope_scaling dict (rope_type "linear" | "llama3" —
    # Llama-3.1+ checkpoints); None = plain RoPE at rope_theta
    rope_scaling: Optional[dict] = None

    dtype: str = "bfloat16"         # activation / weight compute dtype
    # "none" | "int8" (w8a8: s8 x s8 MXU matmuls + dynamic activation
    # quant) | "int8-weight" (weight-only: s8 weights dequantized in the
    # stream, bf16 activations)
    quant: str = "none"

    # the tokenizer's EOS id for this model family (-1 = none). The
    # reference hardcodes GPT-2's 50256 globally
    # (``config/runtime_config.yaml:11``); here each preset carries its
    # own and ``RuntimeConfig.eos_token_id = None`` inherits it, so a
    # Llama preset never silently stops on a GPT-2 id.
    eos_token_id: int = 50256       # ModelConfig defaults are GPT-2-124M

    # derived ---------------------------------------------------------------
    @property
    def q_per_kv(self) -> int:
        assert self.num_heads % self.num_kv_heads == 0
        return self.num_heads // self.num_kv_heads

    @property
    def attn_scale(self) -> float:
        """Attention logit scale (Gemma-2 overrides head_dim**-0.5)."""
        return (self.query_pre_attn_scalar or self.head_dim) ** -0.5

    @property
    def is_glu(self) -> bool:
        """Gated MLP (gate|up|down): SwiGLU (silu gate) or GeGLU
        (tanh-gelu gate, Gemma)."""
        return self.activation in ("swiglu", "geglu")

    @property
    def glu_gate_act(self) -> str:
        return "silu" if self.activation == "swiglu" else "gelu"

    def window_for_layer(self, layer: int) -> int:
        """Effective sliding window of ``layer`` (0 = global). With
        ``sliding_window_pattern`` p > 1, every p-th layer
        (``layer % p == p - 1``) attends globally (Gemma-2/3)."""
        if self.sliding_window <= 0:
            return 0
        p = self.sliding_window_pattern
        if p > 1 and layer % p == p - 1:
            return 0
        return self.sliding_window

    def validate(self) -> "ModelConfig":
        assert self.hidden_size == self.num_heads * self.head_dim or True
        assert self.num_heads % self.num_kv_heads == 0
        assert self.norm in ("layernorm", "rmsnorm")
        assert self.activation in ("gelu", "relu", "swiglu", "silu",
                                   "geglu")
        assert self.position in ("learned", "rope")
        assert self.quant in ("none", "int8", "int8-weight", "int4")
        assert self.sliding_window_pattern >= 1
        if self.post_norms:
            assert self.norm == "rmsnorm", "post_norms: rmsnorm only"
        if self.qk_norm:
            assert self.norm == "rmsnorm", "qk_norm: rmsnorm only"
        if self.rope_local_theta > 0:
            assert self.position == "rope" and self.sliding_window > 0, (
                "rope_local_theta needs rope + a sliding window")
        if self.num_experts > 0:
            assert self.activation == "swiglu", "MoE experts are SwiGLU"
            assert 1 <= self.experts_per_tok <= self.num_experts
        if self.rope_scaling:
            kind = self.rope_scaling.get(
                "rope_type", self.rope_scaling.get("type", "default"))
            required = {"linear": ("factor",),
                        "llama3": ("factor", "low_freq_factor",
                                   "high_freq_factor",
                                   "original_max_position_embeddings"),
                        "longrope": ("short_factor", "long_factor",
                                     "original_max_position_embeddings"),
                        "default": ()}
            assert kind in required, f"rope_scaling type {kind!r}"
            missing = [k for k in required[kind]
                       if k not in self.rope_scaling]
            assert not missing, f"rope_scaling missing {missing}"
        return self


@dataclass
class CacheConfig:
    """Paged KV cache geometry.

    The reference's tile size is 32 tokens (``config/weight_paths.yaml:19-21``)
    with LRU eviction; here pages are exact (never silently dropped for live
    sequences — unlike reference ``kv_cache/kv_tile_cache.cpp:90-98``), LRU
    applies only to *freed* prefix-cache pages.
    """

    page_size: int = 32             # tokens per KV page
    num_pages: int = 2048           # pool capacity (per shard)
    max_pages_per_seq: int = 64     # block-table width
    kv_dtype: str = "bfloat16"      # "bfloat16" | "int8" (per-page scales)
    eviction: str = "lru"           # for freed prefix-cache pages
    enable_prefix_cache: bool = False
    native_allocator: str = "auto"  # "auto" | "always" | "never" (C++ vs py)
    # preempted requests swap KV pages to host RAM and resume without
    # re-prefill (the reference's CPU-tier capability, scheduler-level)
    enable_swap: bool = False
    # sub-128 head dims (GPT-2/TinyLlama dh=64, Phi-3 dh=96): store KV
    # pages lane-padded to the next 128 multiple so the manual-DMA
    # decode kernel + slab RMW appends apply (the lane-packed layout
    # admits no free bitcast — two full pool copies per call measured,
    # BENCHMARKS.md round 4). None = auto (pad iff head_dim % 128).
    # False trades decode speed for KV memory: the packed parity-class
    # decode kernel reads the unpadded pool instead.
    pad_head_dim: Optional[bool] = None

    def pads(self, head_dim: int) -> bool:
        pad = self.pad_head_dim
        if pad is None:
            pad = head_dim % 128 != 0
        return pad and head_dim % 128 != 0

    def validate(self) -> "CacheConfig":
        assert self.page_size > 0 and self.num_pages > 0
        assert self.kv_dtype in ("bfloat16", "float32", "int8")
        assert self.native_allocator in ("auto", "always", "never")
        return self


@dataclass
class RuntimeConfig:
    """Sampling / serving knobs (reference ``config/runtime_config.yaml:1-17``)."""

    temperature: float = 1.0
    top_k: int = 0                  # 0 = disabled
    top_p: float = 1.0              # 1.0 = disabled
    min_p: float = 0.0              # drop p < min_p * p_max (0 = off)
    # HF-style repetition penalty / OpenAI-style additive penalties on
    # prompt+generated tokens (1.0 / 0.0 = disabled)
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    max_new_tokens: int = 64
    # None = inherit the model preset's eos_token_id
    # (``FrameworkConfig.eos_token_id`` resolves it); an int overrides.
    eos_token_id: Optional[int] = None
    eos_threshold: float = 0.0      # if P(eos) >= threshold > 0, force EOS
    stream_delay_ms: int = 0        # artificial pacing knob (ref: 30)
    seed: int = 0

    use_reranker: bool = False
    enable_beam_search: bool = False
    beam_width: int = 4
    # beam-expansion steps per device dispatch: selection, COW page
    # sourcing and block-table rewiring run ON DEVICE across the burst
    # (host replays the page arithmetic afterwards — engine/beam.py).
    # Each burst pre-allocates beam_burst * beam_width fresh pages
    # (unused ones return to the pool); 1 = per-step dispatching.
    beam_burst: int = 16
    # burst-length ceiling when the step budget allows a longer run:
    # each burst's D2H sync costs a host/tunnel round trip. Bursts are
    # pow2-bucketed up to min(remaining steps, this); the fresh-page
    # pre-allocation halves on pool pressure (engine/beam.py). 32
    # measured best at 8B (227 tok/s vs 217 @16 and 163 @64 — the
    # 64-step scan runs ~30% slower per step on device); set equal to
    # beam_burst to disable the extension.
    beam_burst_max: int = 32
    # path to a fine-tuned cross-encoder (reranker/finetune.py output);
    # "" = score with the decoder's own log-probs (LogProbScorer)
    reranker_model: str = ""

    log_level: str = "info"
    enable_logging: bool = True

    # scheduler
    max_batch_size: int = 8
    prefill_chunk: int = 512        # chunked-prefill token budget per step
    # decode tokens per device dispatch ("burst"): the scheduler runs
    # this many steps as one on-device scan (lanes freeze at EOS / their
    # budget), then syncs to the host for delivery + admission. Larger
    # bursts amortize the per-dispatch latency (~28 ms through a remote
    # chip); smaller bursts tighten admission/streaming latency.
    decode_burst: int = 8
    # burst cap when the admission queue is empty (nothing to
    # interleave): longer device-side bursts amortize host-sync cost at
    # the price of worst-case admission latency for requests arriving
    # mid-burst. Set equal to decode_burst to disable the extension.
    decode_burst_max: int = 64
    # max prompt tokens ganged into one prefill dispatch (dp=1): caps
    # how long any one admitted request waits on co-admitted prefills
    # (prefill is compute-bound, so a gang's TTFT is the whole gang's
    # work). Measured in tokens of the per-request chunk size, so the
    # gang width is prefill_gang_tokens // chunk — keep it at least
    # 2 x prefill_chunk or full-size chunks never gang. <= chunk
    # disables ganging (one dispatch per lane per chunk).
    prefill_gang_tokens: int = 1024
    # prefill chunks run per scheduler tick (interleaved with decode
    # bursts so running lanes keep emitting during long-prompt prefill)
    prefill_chunks_per_tick: int = 1
    # wall-clock per-request timeout; 0 disables. Expired requests are
    # marked FAILED and their pages freed (SURVEY.md §5.3).
    request_timeout_s: float = 0.0

    # unrolled layers (False) avoid a per-layer weight slice copy that
    # costs ~1.45x decode bandwidth (benchmarks/microbench_scan_slice.py);
    # scan (True) trades that for one-block compile time on deep models
    scan_layers: bool = False
    # fuse q|k|v and SwiGLU gate|up into single wide matmuls (fewer
    # kernel launches, larger streaming blocks); unrolled layers only
    fuse_projections: bool = True

    # speculative decoding (prompt-lookup / n-gram drafting): each
    # decode step drafts ``spec_k`` continuation tokens by matching the
    # last ``spec_ngram``-gram against the sequence's own history and
    # verifies them in ONE forward pass — decode is weight-stream bound,
    # so a (k+1)-token verify costs about the same as a 1-token step and
    # every accepted draft is a free token. Greedy-exact. 0 = off.
    spec_k: int = 0
    spec_ngram: int = 3
    # sampled (temperature > 0) requests in scheduler spec bursts use
    # the standard stochastic accept/resample rule: each emitted token
    # is distributed exactly like a plain draw, but accepted drafts
    # ride one weight stream (engine/spec.py:stochastic_accept).
    # Off (default) keeps sampled lanes bit-identical to plain bursts
    # (one seeded token per iteration, no draft speedup).
    spec_stochastic: bool = False

    # decode megakernel: stream each layer's whole post-attention matmul
    # chain (o-proj -> norm -> gate|up -> down -> next qkv) through ONE
    # Pallas call so weight-block DMA never drains between ops
    # (ops/chain_linear.py). Single-device, non-MoE only — the engine
    # silently falls back when unsupported.
    megakernel: bool = False
    # drop the per-op weight copies once packed and serve prefill /
    # multi-token steps from the packed blocks too (packed_linear) —
    # one weight layout in HBM, required where 2x weights don't fit
    # (e.g. Llama-3-8B INT8 on one v5e chip)
    megakernel_drop_weights: bool = False


@dataclass
class ParallelConfig:
    """Mesh layout: TP over ICI ('model'), DP across hosts ('data'),
    and optional sequence parallelism ('seq') for long-prompt prefill.

    ``sp > 1`` adds a 'seq' mesh axis between data and model: prefill
    chunks split their query positions across it (each shard computes
    1/sp of the chunk's matmul/attention FLOPs; per-layer K/V of the
    chunk are all-gathered over ICI before the paged append) — the
    blockwise decomposition of prefill attention from SURVEY.md §5.7.
    Weights and the KV pool are replicated along 'seq' (it buys prefill
    *time*, not KV memory); decode runs replicated along it.
    """

    dp: int = 1
    tp: int = 1
    sp: int = 1
    data_axis: str = "data"
    model_axis: str = "model"
    seq_axis: str = "seq"

    @property
    def num_devices(self) -> int:
        return self.dp * self.sp * self.tp


@dataclass
class ServerConfig:
    host: str = "0.0.0.0"
    port: int = 8000
    backend: str = "auto"           # "tpu" | "cpu" | "auto" (ref BACKEND_MODE)


@dataclass
class ChatTemplate:
    """Chat roles + system prompt (reference ``config/chat_template.json:1-17``)."""

    system_prompt: str = "You are a helpful assistant."
    user_role: str = "User"
    assistant_role: str = "Assistant"
    separator: str = "\n"

    def render(self, messages) -> str:
        parts = [self.system_prompt]
        for m in messages:
            role = m.get("role", "user")
            name = self.assistant_role if role == "assistant" else self.user_role
            parts.append(f"{name}: {m.get('content', '')}")
        parts.append(f"{self.assistant_role}:")
        return self.separator.join(parts)


@dataclass
class FrameworkConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    server: ServerConfig = field(default_factory=ServerConfig)
    chat: ChatTemplate = field(default_factory=ChatTemplate)
    weights_path: Optional[str] = None
    tokenizer: str = "byte"         # "byte" | HF tokenizer name/path

    @property
    def eos_token_id(self) -> int:
        """Effective EOS id: the runtime override if set, else the
        model preset's own (-1 = none)."""
        if self.runtime.eos_token_id is not None:
            return self.runtime.eos_token_id
        return self.model.eos_token_id

    def validate(self) -> "FrameworkConfig":
        self.model.validate()
        self.cache.validate()
        return self

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    def save(self, path: str) -> None:
        p = pathlib.Path(path)
        if p.suffix in (".yaml", ".yml"):
            import yaml

            p.write_text(yaml.safe_dump(self.to_dict(), sort_keys=False))
        else:
            p.write_text(json.dumps(self.to_dict(), indent=2))


def _update_dataclass(obj: Any, data: Dict[str, Any]) -> Any:
    names = {f.name: f for f in dataclasses.fields(obj)}
    for k, v in data.items():
        if k not in names:
            raise KeyError(f"unknown config key {k!r} for {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _update_dataclass(cur, v)
        else:
            setattr(obj, k, v)
    return obj


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None,
                base: Optional[FrameworkConfig] = None) -> FrameworkConfig:
    """Load a FrameworkConfig from YAML/JSON with dotted-key overrides.

    ``overrides`` accepts dotted keys, e.g. ``{"runtime.top_k": 5}``.
    """
    cfg = base or FrameworkConfig()
    if path:
        text = pathlib.Path(path).read_text()
        if str(path).endswith((".yaml", ".yml")):
            import yaml

            data = yaml.safe_load(text) or {}
        else:
            data = json.loads(text)
        if "model" in data and isinstance(data["model"], str):
            cfg.model = dataclasses.replace(PRESETS[data.pop("model")])
        elif (isinstance(data.get("model"), dict)
              and "preset" in data["model"]):
            m = data.pop("model")
            cfg.model = dataclasses.replace(PRESETS[m.pop("preset")], **m)
        _update_dataclass(cfg, data)
    for dotted, v in (overrides or {}).items():
        obj = cfg
        *parents, leaf = dotted.split(".")
        for part in parents:
            obj = getattr(obj, part)
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown override {dotted!r}")
        setattr(obj, leaf, v)
    return cfg.validate()


# ---------------------------------------------------------------------------
# Model presets (BASELINE.json configs)
# ---------------------------------------------------------------------------

PRESETS: Dict[str, ModelConfig] = {
    "gpt2-124m": ModelConfig(),
    "gpt2-tiny": ModelConfig(
        name="gpt2-tiny", vocab_size=512, hidden_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=32, intermediate_size=256,
        max_seq_len=256,
    ),
    "tinyllama-1.1b": ModelConfig(
        name="tinyllama-1.1b", vocab_size=32000, hidden_size=2048,
        num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
        intermediate_size=5632, max_seq_len=2048, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=10000.0,
    ),
    "llama3-8b": ModelConfig(
        name="llama3-8b", vocab_size=128256, hidden_size=4096,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        intermediate_size=14336, max_seq_len=8192, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=500000.0,
    ),
    "mistral-7b": ModelConfig(
        name="mistral-7b", vocab_size=32000, hidden_size=4096,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        intermediate_size=14336, max_seq_len=32768, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=10000.0,
        sliding_window=4096,
    ),
    "qwen2-7b": ModelConfig(
        name="qwen2-7b", vocab_size=152064, hidden_size=3584,
        num_layers=28, num_heads=28, num_kv_heads=4, head_dim=128,
        intermediate_size=18944, max_seq_len=32768, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=True,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=1000000.0,
    ),
    "gemma2-2b": ModelConfig(
        name="gemma2-2b", vocab_size=256000, hidden_size=2304,
        num_layers=26, num_heads=8, num_kv_heads=4, head_dim=256,
        intermediate_size=9216, max_seq_len=8192, norm="rmsnorm",
        norm_eps=1e-6, activation="geglu", position="rope",
        use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=True,
        sliding_window=4096, sliding_window_pattern=2,
        rms_offset=1.0, post_norms=True, scale_embeddings=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=256.0,
    ),
    "gemma2-9b": ModelConfig(
        name="gemma2-9b", vocab_size=256000, hidden_size=3584,
        num_layers=42, num_heads=16, num_kv_heads=8, head_dim=256,
        intermediate_size=14336, max_seq_len=8192, norm="rmsnorm",
        norm_eps=1e-6, activation="geglu", position="rope",
        use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=True,
        sliding_window=4096, sliding_window_pattern=2,
        rms_offset=1.0, post_norms=True, scale_embeddings=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=256.0,
    ),
    # Gemma-3 (text): Gemma-2 sandwich/GeGLU base, softcaps replaced by
    # per-head qk RMSNorm, 5:1 sliding:global layers, dual RoPE theta
    # (local layers 10k unscaled, global 1M (+linear x8 from 4B up))
    "gemma3-1b": ModelConfig(
        name="gemma3-1b", vocab_size=262144, hidden_size=1152,
        num_layers=26, num_heads=4, num_kv_heads=1, head_dim=256,
        intermediate_size=6912, max_seq_len=32768, norm="rmsnorm",
        norm_eps=1e-6, activation="geglu", position="rope",
        rope_theta=1000000.0, rope_local_theta=10000.0,
        use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=True,
        sliding_window=512, sliding_window_pattern=6,
        rms_offset=1.0, post_norms=True, scale_embeddings=True,
        query_pre_attn_scalar=256.0, qk_norm=True,
    ),
    "gemma3-4b": ModelConfig(
        name="gemma3-4b", vocab_size=262208, hidden_size=2560,
        num_layers=34, num_heads=8, num_kv_heads=4, head_dim=256,
        intermediate_size=10240, max_seq_len=131072, norm="rmsnorm",
        norm_eps=1e-6, activation="geglu", position="rope",
        rope_theta=1000000.0, rope_local_theta=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=True,
        sliding_window=1024, sliding_window_pattern=6,
        rms_offset=1.0, post_norms=True, scale_embeddings=True,
        query_pre_attn_scalar=256.0, qk_norm=True,
    ),
    # Phi-3-mini 4k (3.8B): Llama-family geometry, MHA (no GQA),
    # 2047-token sliding window; HF ships qkv/gate|up pre-fused
    "phi3-mini-4k": ModelConfig(
        name="phi3-mini-4k", vocab_size=32064, hidden_size=3072,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=96,
        intermediate_size=8192, max_seq_len=4096, norm="rmsnorm",
        norm_eps=1e-5, activation="swiglu", position="rope",
        rope_theta=10000.0, use_qkv_bias=False, use_mlp_bias=False,
        tie_embeddings=False, sliding_window=2047,
    ),
    "llama3-70b": ModelConfig(
        name="llama3-70b", vocab_size=128256, hidden_size=8192,
        num_layers=80, num_heads=64, num_kv_heads=8, head_dim=128,
        intermediate_size=28672, max_seq_len=8192, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=500000.0,
    ),
    "llama3.1-8b": ModelConfig(
        name="llama3.1-8b", vocab_size=128256, hidden_size=4096,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        intermediate_size=14336, max_seq_len=131072, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
    ),
    "mixtral-8x7b": ModelConfig(
        name="mixtral-8x7b", vocab_size=32000, hidden_size=4096,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        intermediate_size=14336, max_seq_len=32768, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=1000000.0,
        num_experts=8, experts_per_tok=2,
    ),
    "mixtral-tiny": ModelConfig(
        name="mixtral-tiny", vocab_size=512, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        max_seq_len=256, norm="rmsnorm", activation="swiglu",
        position="rope", use_qkv_bias=False, use_mlp_bias=False,
        tie_embeddings=False, num_experts=4, experts_per_tok=2,
    ),
    # gemma2-2b scaled down: every architectural quirk, test-sized
    "gemma2-tiny": ModelConfig(
        name="gemma2-tiny", vocab_size=512, hidden_size=64, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=32, intermediate_size=128,
        max_seq_len=256, norm="rmsnorm", norm_eps=1e-6,
        activation="geglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=True,
        sliding_window=32, sliding_window_pattern=2,
        rms_offset=1.0, post_norms=True, scale_embeddings=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=64.0,
    ),
    # gemma3-1b scaled down: qk-norm + dual rope theta, test-sized
    "gemma3-tiny": ModelConfig(
        name="gemma3-tiny", vocab_size=512, hidden_size=64, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=32, intermediate_size=128,
        max_seq_len=256, norm="rmsnorm", norm_eps=1e-6,
        activation="geglu", position="rope",
        rope_theta=100000.0, rope_local_theta=10000.0,
        use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=True,
        sliding_window=32, sliding_window_pattern=2,
        rms_offset=1.0, post_norms=True, scale_embeddings=True,
        query_pre_attn_scalar=64.0, qk_norm=True,
    ),
    "llama-tiny": ModelConfig(
        name="llama-tiny", vocab_size=512, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        max_seq_len=256, norm="rmsnorm", activation="swiglu",
        position="rope", use_qkv_bias=False, use_mlp_bias=False,
        tie_embeddings=False,
    ),
    # GQA shapes divisible by tp=4 for multi-device dryruns/tests
    "llama-shard-tiny": ModelConfig(
        name="llama-shard-tiny", vocab_size=512, hidden_size=128,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
        intermediate_size=256, max_seq_len=256, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False,
    ),
    # llama3-70b sharding twin: same head ratios (GQA 8:1, KH=8) at toy
    # dims, for tp=8 x dp=2 validation on a 16-device virtual mesh
    "llama70b-shard-tiny": ModelConfig(
        name="llama70b-shard-tiny", vocab_size=512, hidden_size=256,
        num_layers=2, num_heads=16, num_kv_heads=8, head_dim=16,
        intermediate_size=512, max_seq_len=256, norm="rmsnorm",
        activation="swiglu", position="rope", use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, rope_theta=500000.0,
    ),
}

# Per-family EOS ids (HF tokenizer_config eos_token for each family).
# Tiny/test presets have random vocabularies — no EOS (-1). The
# ModelConfig default (50256) covers only the GPT-2-124M preset.
_PRESET_EOS = {
    "tinyllama-1.1b": 2,            # </s>
    "llama3-8b": 128001,            # <|end_of_text|>
    "llama3.1-8b": 128001,
    "llama3-70b": 128001,
    "mistral-7b": 2,                # </s>
    "mixtral-8x7b": 2,
    "qwen2-7b": 151643,             # <|endoftext|>
    "gemma2-2b": 1,                 # <eos>
    "gemma2-9b": 1,
    "gemma3-1b": 1,
    "gemma3-4b": 1,
    "phi3-mini-4k": 32000,          # <|endoftext|>
    "gpt2-tiny": -1,
    "mixtral-tiny": -1,
    "gemma2-tiny": -1,
    "gemma3-tiny": -1,
    "llama-tiny": -1,
    "llama-shard-tiny": -1,
    "llama70b-shard-tiny": -1,
}
for _name, _eos in _PRESET_EOS.items():
    PRESETS[_name].eos_token_id = _eos
del _name, _eos


def preset(name: str) -> ModelConfig:
    # deep copy: dataclasses.replace alone would alias mutable fields
    # (rope_scaling) to the global PRESETS entry
    import copy

    return copy.deepcopy(PRESETS[name])
