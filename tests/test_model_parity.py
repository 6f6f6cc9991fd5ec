"""Logit parity vs HuggingFace torch reference models (random weights,
fully offline). This is the correctness oracle of SURVEY.md §7.2 step 2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    ModelConfig,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    DecoderModel,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
    params_from_hf_gpt2,
    params_from_hf_llama,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.backends import (
    DenseKVBackend,
)

torch = pytest.importorskip("torch")


def run_ours(cfg, params, tokens):
    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(tokens.shape[0], cfg.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(tokens.shape[1]), tokens.shape)
    logits, _ = model.forward(params, jnp.asarray(tokens), positions, kv,
                              backend.attn_fn)
    return np.asarray(logits)


def test_gpt2_parity():
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(n_layer=3, n_head=4, n_embd=64, vocab_size=257,
                        n_positions=96, resid_pdrop=0.0, embd_pdrop=0.0,
                        attn_pdrop=0.0)
    hf = GPT2LMHeadModel(hf_cfg).eval()

    cfg = ModelConfig(
        name="test-gpt2", vocab_size=257, hidden_size=64, num_layers=3,
        num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=256,
        max_seq_len=96, norm="layernorm", activation="gelu",
        position="learned", use_qkv_bias=True, use_mlp_bias=True,
        tie_embeddings=True, dtype="float32",
    )
    params = params_from_hf_gpt2(hf.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=257,
        max_position_embeddings=96, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = ModelConfig(
        name="test-llama", vocab_size=257, hidden_size=64, num_layers=3,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        max_seq_len=96, norm="rmsnorm", norm_eps=1e-5, activation="swiglu",
        position="rope", rope_theta=10000.0, use_qkv_bias=False,
        use_mlp_bias=False, tie_embeddings=False, dtype="float32",
    )
    params = params_from_hf_llama(hf.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 257, size=(2, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)


def test_qwen2_parity():
    """Qwen2 = Llama family + attention biases (cfg.use_qkv_bias):
    exercises the bias import of params_from_hf_llama."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=257,
        max_position_embeddings=96, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=False,
        use_sliding_window=False)
    hf = Qwen2ForCausalLM(hf_cfg).eval()

    cfg = ModelConfig(
        name="test-qwen2", vocab_size=257, hidden_size=64, num_layers=3,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        max_seq_len=96, norm="rmsnorm", norm_eps=1e-6,
        activation="swiglu", position="rope", rope_theta=10000.0,
        use_qkv_bias=True, use_mlp_bias=False, tie_embeddings=False,
        dtype="float32",
    )
    params = params_from_hf_llama(hf.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 257, size=(2, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    ours = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-2)
