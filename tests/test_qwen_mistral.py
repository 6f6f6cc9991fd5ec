"""Qwen2 + Mistral family parity vs HF.

Both are Llama-family decoders imported through
``params_from_hf_llama`` / the streaming path; what needs coverage is
the bits that differ from Llama: Qwen2's q/k/v attention biases
(``use_qkv_bias``) and Mistral's sliding-window attention. No
reference counterpart (new-for-TPU model breadth, like
tests/test_phi3.py).
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


def run_ours(cfg, params, tokens):
    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(tokens.shape[0], cfg.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(tokens.shape[1]),
                                 tokens.shape)
    logits, _ = model.forward(params, jnp.asarray(tokens), positions,
                              kv, backend.attn_fn)
    return np.asarray(logits)


def tiny_hf_qwen2():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    m = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=257, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=96,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
        use_sliding_window=False, pad_token_id=0)).eval()
    # HF zero-inits Linear biases; randomize q/k/v biases so parity
    # actually covers the bias import path
    with torch.no_grad():
        for layer in m.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0.0, 0.5)
    return m


QWEN_TINY = dict(
    vocab_size=257, hidden_size=64, num_layers=3, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, max_seq_len=96,
    norm="rmsnorm", norm_eps=1e-5, activation="swiglu",
    position="rope", rope_theta=10000.0, use_qkv_bias=True,
    use_mlp_bias=False, tie_embeddings=False, dtype="float32")


def test_qwen2_parity_vs_hf():
    """GQA (4q:2kv) + attention biases on q/k/v (not o)."""
    torch = pytest.importorskip("torch")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_llama)

    hf = tiny_hf_qwen2()
    cfg = ModelConfig(name="test-qwen2", **QWEN_TINY).validate()
    params = params_from_hf_llama(hf.state_dict(), cfg,
                                  dtype=jnp.float32)
    # biases actually imported (nonzero for a random-init model)
    assert float(np.abs(np.asarray(
        params["layers"]["bq"], np.float32)).max()) > 0

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)


def test_qwen2_hf_streaming_import(tmp_path):
    """config.json detection (model_type=qwen2 => use_qkv_bias) +
    streamed shard import reproduce the HF forward."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf, import_hf_streaming, load_flat_params)

    hf = tiny_hf_qwen2()
    path = tmp_path / "qwen2"
    hf.save_pretrained(path, safe_serialization=True)

    cfg = config_from_hf(str(path), name="test-qwen2")
    assert cfg.use_qkv_bias and cfg.num_kv_heads == 2

    flat = import_hf_streaming(str(path), cfg)
    params = load_flat_params(flat, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 257, size=(1, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=0.05, rtol=5e-2)


def test_mistral_parity_vs_hf():
    """Sliding-window attention: seq 23 > window 8, so late tokens
    must NOT see early ones."""
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_llama)

    torch.manual_seed(1)
    hf = MistralForCausalLM(MistralConfig(
        vocab_size=257, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=96,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=8,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0)).eval()

    cfg = ModelConfig(
        name="test-mistral", vocab_size=257, hidden_size=64,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
        intermediate_size=128, max_seq_len=96, norm="rmsnorm",
        norm_eps=1e-5, activation="swiglu", position="rope",
        rope_theta=10000.0, use_qkv_bias=False, use_mlp_bias=False,
        tie_embeddings=False, sliding_window=8,
        dtype="float32").validate()
    params = params_from_hf_llama(hf.state_dict(), cfg,
                                  dtype=jnp.float32)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 257, size=(2, 23))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)


def test_qwen_mistral_presets_validate():
    q = preset("qwen2-7b")
    assert q.use_qkv_bias and q.num_kv_heads == 4
    q.validate()
    m = preset("mistral-7b")
    assert m.sliding_window == 4096
    m.validate()
