"""Gemma-2 model family: HF logit parity + paged-engine equivalence.

Covers the architecture extras Gemma-2 adds on top of the Llama family
(a model family with no reference counterpart — new-for-TPU breadth):
zero-centred RMSNorm (``rms_offset=1``), sandwich post-norms, GeGLU,
sqrt(D) embedding scaling, attention/final logit soft-capping,
``query_pre_attn_scalar`` attention scale, and the alternating
sliding/global attention layer pattern.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig,
    FrameworkConfig,
    ModelConfig,
    RuntimeConfig,
    preset,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    DenseKVBackend,
    Engine,
    SamplingParams,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.paged_backend import (
    PagedKVBackend,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    DecoderModel,
    init_params,
    unstack_layers,
)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)

#: ours-vs-HF geometry used by both the state_dict and streaming tests;
#: window 8 < seq len so the sliding/global alternation is exercised,
#: query_pre_attn_scalar != head_dim so the scale override matters
TINY = dict(
    vocab_size=257, hidden_size=64, num_layers=4, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, max_seq_len=96,
    norm="rmsnorm", norm_eps=1e-6, activation="geglu", position="rope",
    rope_theta=10000.0, use_qkv_bias=False, use_mlp_bias=False,
    tie_embeddings=True, sliding_window=8, sliding_window_pattern=2,
    rms_offset=1.0, post_norms=True, scale_embeddings=True,
    attn_logit_softcap=50.0, final_logit_softcap=30.0,
    query_pre_attn_scalar=32.0, dtype="float32")


def tiny_hf_gemma2():
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Gemma2Config(
        vocab_size=257, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=96, rms_norm_eps=1e-6,
        rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=True, query_pre_attn_scalar=32,
        sliding_window=8, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        hidden_activation="gelu_pytorch_tanh",
        # eager attention: the sdpa path skips logit soft-capping
        attn_implementation="eager")
    return Gemma2ForCausalLM(hf_cfg).eval()


def test_gemma2_parity_vs_hf():
    torch = pytest.importorskip("torch")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_gemma2)

    hf = tiny_hf_gemma2()
    cfg = ModelConfig(name="test-gemma2", **TINY).validate()
    params = params_from_hf_gemma2(hf.state_dict(), cfg,
                                   dtype=jnp.float32)
    # per-layer windows need the unrolled layer loop (static layer idx)
    params = unstack_layers(params)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()

    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(2, cfg.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(17), (2, 17))
    ours, _ = model.forward(params, jnp.asarray(tokens), positions, kv,
                            backend.attn_fn)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3,
                               rtol=5e-2)


def test_gemma2_paged_vs_dense_backend():
    """Softcap + per-layer windows through the Pallas kernel must match
    the dense oracle (prefill past the window, then a decode step)."""
    cfg = preset("gemma2-tiny")
    cfg.dtype = "float32"
    page = 8
    model = DecoderModel(cfg)
    params = unstack_layers(init_params(cfg, jax.random.key(0)))

    B, T = 2, 41            # > sliding_window=32: alternation matters
    n_pages = 8
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))

    dense = DenseKVBackend(cfg, kv_dtype="float32")
    dlogits, dkv = model.forward(params, tokens, positions,
                                 dense.init_cache(B, 64), dense.attn_fn)

    cache = CacheConfig(page_size=page, num_pages=32,
                        max_pages_per_seq=n_pages, kv_dtype="float32")
    paged = PagedKVBackend(cfg, cache, interpret=True)
    block_tables = jnp.arange(
        1, B * n_pages + 1, dtype=jnp.int32).reshape(B, n_pages)
    sl = jnp.full((B,), T, jnp.int32)
    attn = paged.make_attn_fn(block_tables, sl, jnp.zeros((B,), jnp.int32))
    plogits, pkv = model.forward(params, tokens, positions,
                                 paged.init_cache(), attn)
    np.testing.assert_allclose(np.asarray(plogits), np.asarray(dlogits),
                               atol=1e-4, rtol=1e-4)

    tok = jnp.argmax(plogits[:, -1:], -1)
    pos = jnp.full((B, 1), T)
    dl2, _ = model.forward(params, tok, pos, dkv, dense.attn_fn)
    attn2 = paged.make_attn_fn(block_tables, sl + 1, sl)
    pl2, _ = model.forward(params, tok, pos, pkv, attn2)
    np.testing.assert_allclose(np.asarray(pl2), np.asarray(dl2),
                               atol=1e-4, rtol=1e-4)


def test_gemma2_engine_generate():
    """End-to-end engine smoke on the gemma2-tiny preset: greedy
    determinism, stepwise == fused, pages freed (reclamation must stay
    OFF under the alternating pattern — global layers keep pages)."""
    cfg = FrameworkConfig(
        model=preset("gemma2-tiny"),
        cache=CacheConfig(page_size=8, num_pages=128,
                          max_pages_per_seq=16, kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8))
    cfg.model.dtype = "float32"
    eng = Engine(cfg, interpret=True)
    prompt = [5, 9, 3, 14, 2, 7]
    a = eng.generate(prompt, 6, GREEDY)
    b = eng.generate(prompt, 6, GREEDY)
    assert a == b and len(a) == 6
    fused = eng.generate_batch_fused([prompt], 6, GREEDY)[0]
    assert fused == a


def test_gemma2_hf_streaming_import(tmp_path):
    """config.json -> ModelConfig derivation + streamed safetensors
    import must reproduce the HF forward (bf16 streaming tolerance)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf, import_hf_streaming, load_flat_params)

    hf = tiny_hf_gemma2()
    path = tmp_path / "gemma2"
    hf.save_pretrained(path, safe_serialization=True)

    cfg = config_from_hf(str(path), name="test-gemma2")
    assert cfg.activation == "geglu" and cfg.post_norms
    assert cfg.rms_offset == 1.0 and cfg.scale_embeddings
    assert cfg.sliding_window == 8 and cfg.sliding_window_pattern == 2
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 32.0 and cfg.tie_embeddings

    flat = import_hf_streaming(str(path), cfg)
    params = load_flat_params(flat, dtype=jnp.float32)
    params = unstack_layers(params)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 257, size=(1, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    positions = jnp.broadcast_to(jnp.arange(13), (1, 13))
    ours, _ = model.forward(params, jnp.asarray(tokens), positions,
                            backend.init_cache(1, cfg.max_seq_len),
                            backend.attn_fn)
    # bf16 weight rounding from the streaming path dominates the error
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.05,
                               rtol=5e-2)


# --- Gemma-3 (text): qk-norm + dual-theta RoPE on the Gemma-2 base ----------

TINY3 = dict(
    vocab_size=257, hidden_size=64, num_layers=4, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, max_seq_len=96,
    norm="rmsnorm", norm_eps=1e-6, activation="geglu", position="rope",
    rope_theta=100000.0, rope_local_theta=10000.0,
    use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=True,
    sliding_window=8, sliding_window_pattern=2,
    rms_offset=1.0, post_norms=True, scale_embeddings=True,
    query_pre_attn_scalar=32.0, qk_norm=True, dtype="float32")


def tiny_hf_gemma3():
    torch = pytest.importorskip("torch")
    from transformers import Gemma3TextConfig
    from transformers import Gemma3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Gemma3TextConfig(
        vocab_size=257, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=96, rms_norm_eps=1e-6,
        rope_theta=100000.0, rope_local_base_freq=10000.0,
        attention_bias=False, tie_word_embeddings=True,
        query_pre_attn_scalar=32, sliding_window=8,
        sliding_window_pattern=2,
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager")
    return Gemma3ForCausalLM(hf_cfg).eval()


def test_gemma3_parity_vs_hf():
    """qk-norm + the local/global RoPE table split (different thetas so
    a wrong table choice shows up in the logits)."""
    torch = pytest.importorskip("torch")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_gemma3)

    hf = tiny_hf_gemma3()
    cfg = ModelConfig(name="test-gemma3", **TINY3).validate()
    params = params_from_hf_gemma3(hf.state_dict(), cfg,
                                   dtype=jnp.float32)
    params = unstack_layers(params)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()

    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(2, cfg.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(17), (2, 17))
    ours, _ = model.forward(params, jnp.asarray(tokens), positions, kv,
                            backend.attn_fn)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3,
                               rtol=5e-2)


def test_gemma3_engine_generate():
    cfg = FrameworkConfig(
        model=preset("gemma3-tiny"),
        cache=CacheConfig(page_size=8, num_pages=128,
                          max_pages_per_seq=16, kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8))
    cfg.model.dtype = "float32"
    eng = Engine(cfg, interpret=True)
    prompt = [5, 9, 3, 14, 2, 7]
    a = eng.generate(prompt, 6, GREEDY)
    assert len(a) == 6
    fused = eng.generate_batch_fused([prompt], 6, GREEDY)[0]
    assert fused == a


def test_gemma3_hf_streaming_import(tmp_path):
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf, import_hf_streaming, load_flat_params)

    hf = tiny_hf_gemma3()
    path = tmp_path / "gemma3"
    hf.save_pretrained(path, safe_serialization=True)

    cfg = config_from_hf(str(path), name="test-gemma3")
    assert cfg.qk_norm and cfg.rope_local_theta == 10000.0
    assert cfg.rope_theta == 100000.0
    assert cfg.sliding_window == 8 and cfg.sliding_window_pattern == 2
    assert cfg.attn_logit_softcap == 0.0   # gemma3 dropped softcaps

    flat = import_hf_streaming(str(path), cfg)
    params = load_flat_params(flat, dtype=jnp.float32)
    params = unstack_layers(params)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 257, size=(1, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    positions = jnp.broadcast_to(jnp.arange(13), (1, 13))
    ours, _ = model.forward(params, jnp.asarray(tokens), positions,
                            backend.init_cache(1, cfg.max_seq_len),
                            backend.attn_fn)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.05,
                               rtol=5e-2)
