"""Engine integration tests (SURVEY.md §4 item 4): decode-with-cache ≡
full recompute, greedy determinism, EOS stop, chunked prefill, batch."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig,
    FrameworkConfig,
    RuntimeConfig,
    preset,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    DenseKVBackend,
    Engine,
    SamplingParams,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    DecoderModel,
    init_params,
)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def make_engine(model_name="llama-tiny", **runtime_kw):
    cfg = FrameworkConfig(
        model=preset(model_name),
        cache=CacheConfig(page_size=8, num_pages=128, max_pages_per_seq=16,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8, **runtime_kw),
    )
    cfg.model.dtype = "float32"
    return Engine(cfg, interpret=True)


@pytest.fixture(scope="module")
def engine():
    return make_engine()


def test_greedy_determinism(engine):
    prompt = [5, 9, 3, 14]
    a = engine.generate(prompt, 6, GREEDY)
    b = engine.generate(prompt, 6, GREEDY)
    assert a == b and len(a) == 6


def test_decode_equals_full_recompute(engine):
    """Tokens produced stepwise against the paged cache must equal
    greedy argmax of a full dense recompute at every step."""
    prompt = [2, 7, 1]
    out = engine.generate(prompt, 5, GREEDY)

    model = DecoderModel(engine.cfg)
    dense = DenseKVBackend(engine.cfg, kv_dtype="float32")
    seq = list(prompt)
    for expected in out:
        tokens = jnp.asarray([seq])
        positions = jnp.arange(len(seq))[None, :]
        logits, _ = model.forward(engine.params, tokens, positions,
                                  dense.init_cache(1, 64), dense.attn_fn)
        assert int(jnp.argmax(logits[0, -1])) == expected
        seq.append(expected)


def test_chunked_prefill_matches_unchunked():
    e1 = make_engine(prefill_chunk=4)
    e2 = make_engine(prefill_chunk=512)
    e2.params = e1.params
    prompt = list(range(2, 13))
    assert e1.generate(prompt, 4, GREEDY) == e2.generate(prompt, 4, GREEDY)


def test_eos_stops_stream(engine):
    # find the greedy continuation, then set eos to its 3rd token
    out = engine.generate([4, 4, 8], 6, GREEDY)
    eos = out[2]
    samp = SamplingParams(temperature=0.0, eos_token_id=eos)
    stopped = engine.generate([4, 4, 8], 6, samp)
    assert stopped == out[:3]


def test_batch_generation_matches_single(engine):
    p1, p2 = [3, 1, 4, 1, 5], [9, 2, 6]
    batch = engine.generate_batch([p1, p2], 5, GREEDY)
    assert batch[0] == engine.generate(p1, 5, GREEDY)
    assert batch[1] == engine.generate(p2, 5, GREEDY)


def test_pages_freed_after_generate(engine):
    free_before = engine.allocator.num_free
    engine.generate([1, 2, 3, 4, 5, 6, 7, 8, 9], 6, GREEDY)
    assert engine.allocator.num_free == free_before


def test_seeded_sampling_reproducible(engine):
    samp = SamplingParams(temperature=1.0, top_k=10, eos_token_id=-1)
    a = engine.generate([5, 6, 7], 6, samp, seed=123)
    b = engine.generate([5, 6, 7], 6, samp, seed=123)
    c = engine.generate([5, 6, 7], 6, samp, seed=124)
    assert a == b
    assert len(c) == 6


def test_fused_decode_loop_matches_stepwise(engine):
    p1, p2 = [3, 1, 4, 1, 5], [9, 2, 6]
    fused = engine.generate_batch_fused([p1, p2], 5, GREEDY)
    step = engine.generate_batch([p1, p2], 5, GREEDY)
    assert fused == step


def test_fused_decode_loop_eos_truncates(engine):
    out = engine.generate([4, 4, 8], 6, GREEDY)
    eos = out[2]
    samp = SamplingParams(temperature=0.0, eos_token_id=eos)
    fused = engine.generate_batch_fused([[4, 4, 8]], 6, samp)
    assert fused[0] == out[:3]


def test_hf_weights_generate_end_to_end():
    """HF GPT-2 state_dict -> engine -> greedy generation matches the
    HF model's own greedy continuation (random weights, offline)."""
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_import import (
        params_from_hf_gpt2)

    hf_cfg = GPT2Config(vocab_size=256, n_positions=128, n_embd=64,
                        n_layer=2, n_head=2)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()

    cfg = FrameworkConfig(
        model=preset("gpt2-tiny"),
        cache=CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8),
    )
    cfg.model.vocab_size = 256
    cfg.model.hidden_size = 64
    cfg.model.num_layers = 2
    cfg.model.num_heads = 2
    cfg.model.num_kv_heads = 2
    cfg.model.head_dim = 32
    cfg.model.intermediate_size = 256
    cfg.model.max_seq_len = 128
    cfg.model.dtype = "float32"
    params = params_from_hf_gpt2(hf.state_dict(), cfg.model,
                                 dtype=jnp.float32)
    eng = Engine(cfg, params=params, interpret=True)

    prompt = [5, 9, 11, 2]
    ours = eng.generate(prompt, 6, GREEDY)
    with torch.no_grad():
        ids = torch.tensor([prompt])
        hf_out = hf.generate(ids, max_new_tokens=6, do_sample=False,
                             pad_token_id=0)
    assert ours == hf_out[0, len(prompt):].tolist()


def test_engine_rewrap_quantized_params():
    """Re-wrapping one engine's (unstacked/fused) params in another
    engine must work for INT8 quant (regression: quantize_params used
    to assume the stacked dict layout)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, preset)

    cfg = FrameworkConfig()
    cfg.model = preset("llama-tiny")
    cfg.model.dtype = "float32"
    cfg.model.quant = "int8"
    cfg.cache = CacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8,
                            kv_dtype="int8")
    e1 = Engine(cfg, interpret=True, seed=0)
    e2 = Engine(cfg, params=e1.params, interpret=True)
    g = SamplingParams(temperature=0.0, eos_token_id=-1)
    assert e2.generate([1, 2, 3], 4, g) == e1.generate([1, 2, 3], 4, g)


def test_attention_maps_on_engine_params():
    """The attention-map debug export must accept the engine's
    unstacked/fused param layout (regression)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.debug import (
        attention_maps)

    eng = make_engine() if "make_engine" in globals() else None
    if eng is None:
        from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
            CacheConfig, FrameworkConfig, preset)

        cfg = FrameworkConfig()
        cfg.model = preset("llama-tiny")
        cfg.model.dtype = "float32"
        cfg.cache = CacheConfig(page_size=8, num_pages=32,
                                max_pages_per_seq=8, kv_dtype="float32")
        eng = Engine(cfg, interpret=True, seed=0)
    attn, logits = attention_maps(eng.model, eng.params, [1, 2, 3, 4])
    assert attn.shape[0] == eng.cfg.num_layers
    assert np.allclose(attn.sum(-1), 1.0, atol=1e-4)


def test_stop_token_ends_stream(engine):
    """A stop_token_ids hit ends generation like EOS (the stop token is
    delivered, nothing after it)."""
    base = engine.generate([5, 9, 3, 14], 8, GREEDY)
    stop = base[2]
    sp = dataclasses.replace(GREEDY, stop_token_ids=(stop,))
    out = engine.generate([5, 9, 3, 14], 8, sp)
    assert out == base[:3]


def test_repetition_penalty_changes_output(engine):
    """Penalties must flow through prefill seeding + decode bumping:
    greedy output with a strong repetition penalty never repeats a
    token (tiny-vocab models repeat constantly without it)."""
    prompt = [5, 9, 3, 14]
    base = engine.generate(prompt, 8, GREEDY)
    assert len(set(base)) < len(base)  # unpenalized model does repeat
    sp = dataclasses.replace(GREEDY, presence_penalty=1000.0)
    out = engine.generate(prompt, 8, sp)
    assert len(out) == 8
    assert len(set(out)) == len(out)          # no generated repeats
    assert not (set(out) & set(prompt))       # prompt tokens penalized


def test_fused_matches_stream_with_penalties(engine):
    """generate_batch_fused threads the same penalty histogram as the
    stepwise prefill/decode path (greedy ⇒ bit-identical)."""
    sp = dataclasses.replace(GREEDY, repetition_penalty=1.5,
                             frequency_penalty=0.2)
    prompts = [[5, 9, 3, 14], [2, 7, 1, 1]]
    fused = engine.generate_batch_fused(prompts, 6, sp)
    for p, f in zip(prompts, fused):
        assert f == engine.generate(p, 6, sp)


def test_fused_stop_tokens(engine):
    base = engine.generate_batch_fused([[5, 9, 3, 14]], 8, GREEDY)[0]
    stop = base[3]
    sp = dataclasses.replace(GREEDY, stop_token_ids=(stop,))
    out = engine.generate_batch_fused([[5, 9, 3, 14]], 8, sp)[0]
    assert out == base[:4]
