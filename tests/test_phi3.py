"""Phi-3 model family: HF logit parity + streaming import.

Phi-3 is Llama-family (rmsnorm / SwiGLU / RoPE) with MHA, a sliding
window, and — the part that needs import support — *pre-fused* HF
projections: ``self_attn.qkv_proj`` (q|k|v rows) and
``mlp.gate_up_proj`` (gate|up rows). No reference counterpart
(new-for-TPU model breadth).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    ModelConfig,
    preset,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    DenseKVBackend,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    DecoderModel,
)

TINY = dict(
    vocab_size=257, hidden_size=64, num_layers=3, num_heads=4,
    num_kv_heads=4, head_dim=16, intermediate_size=128, max_seq_len=96,
    norm="rmsnorm", norm_eps=1e-5, activation="swiglu", position="rope",
    rope_theta=10000.0, use_qkv_bias=False, use_mlp_bias=False,
    tie_embeddings=False, sliding_window=8, dtype="float32")


def tiny_hf_phi3():
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Phi3Config(
        vocab_size=257, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=96,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=8,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0)  # default 32000 exceeds the tiny vocab
    return Phi3ForCausalLM(hf_cfg).eval()


def run_ours(cfg, params, tokens):
    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(tokens.shape[0], cfg.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(tokens.shape[1]),
                                 tokens.shape)
    logits, _ = model.forward(params, jnp.asarray(tokens), positions,
                              kv, backend.attn_fn)
    return np.asarray(logits)


def test_phi3_parity_vs_hf():
    """Fused qkv/gate_up split + sliding window (seq 17 > window 8)."""
    torch = pytest.importorskip("torch")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_phi3)

    hf = tiny_hf_phi3()
    cfg = ModelConfig(name="test-phi3", **TINY).validate()
    params = params_from_hf_phi3(hf.state_dict(), cfg,
                                 dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)


def test_phi3_hf_streaming_import(tmp_path):
    """config.json derivation + streamed fused-tensor split must
    reproduce the HF forward (bf16 streaming tolerance)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf, import_hf_streaming, load_flat_params)

    hf = tiny_hf_phi3()
    path = tmp_path / "phi3"
    hf.save_pretrained(path, safe_serialization=True)

    cfg = config_from_hf(str(path), name="test-phi3")
    assert cfg.activation == "swiglu" and not cfg.tie_embeddings
    assert cfg.sliding_window == 8 and cfg.num_kv_heads == 4

    flat = import_hf_streaming(str(path), cfg)
    params = load_flat_params(flat, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 257, size=(1, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=0.05, rtol=5e-2)


def test_phi3_preset_validates():
    cfg = preset("phi3-mini-4k")
    assert cfg.num_heads == cfg.num_kv_heads == 32
    assert cfg.sliding_window == 2047
    cfg.validate()


def test_phi3_longrope_parity():
    """Phi-3 128k-style longrope: per-dim factor divisors + sqrt-log
    attention scale. original_max=16 < seq len 20 so both sides take
    the long_factor path (HF switches dynamically per forward; our
    table picks long iff the serveable context exceeds original_max)."""
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_phi3)

    short = [1.0 + 0.1 * i for i in range(8)]   # head_dim/2 = 8 dims
    long = [2.0 + 0.3 * i for i in range(8)]
    torch.manual_seed(0)
    hf = Phi3ForCausalLM(Phi3Config(
        vocab_size=257, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=96,
        original_max_position_embeddings=16,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=None,
        rope_scaling={"type": "longrope", "short_factor": short,
                      "long_factor": long},
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0)).eval()

    cfg = ModelConfig(
        name="test-phi3-lr", vocab_size=257, hidden_size=64,
        num_layers=3, num_heads=4, num_kv_heads=4, head_dim=16,
        intermediate_size=128, max_seq_len=96, norm="rmsnorm",
        norm_eps=1e-5, activation="swiglu", position="rope",
        rope_theta=10000.0, use_qkv_bias=False, use_mlp_bias=False,
        tie_embeddings=False, dtype="float32",
        rope_scaling={"rope_type": "longrope", "short_factor": short,
                      "long_factor": long,
                      "original_max_position_embeddings": 16,
                      "max_position_embeddings": 96}).validate()
    params = params_from_hf_phi3(hf.state_dict(), cfg,
                                 dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 20))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)
