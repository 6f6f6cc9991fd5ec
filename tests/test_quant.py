"""INT8 quantization tests (SURVEY.md §4 item 3): round-trip error
bounds, linear-layer parity, end-to-end PPL delta, int8 KV engine."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, RuntimeConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine, SamplingParams)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    DecoderModel, init_params, quantize_params)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.linear import linear
from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.eval import (
    ppl_delta_report)
from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
    QTensor, dequantize, quantize_per_channel, quantize_per_row)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def test_per_channel_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 3, jnp.float32)
    q = quantize_per_channel(w)
    err = np.abs(np.asarray(dequantize(q)) - np.asarray(w))
    # absmax symmetric: per-channel error bounded by scale/2-ish
    bound = np.asarray(q.scales).squeeze() * 0.5 + 1e-6
    assert (err <= bound[None, :] + 1e-6).all()


def test_negative_dominant_tensor():
    """The reference's signed-max bug breaks negative-heavy tensors
    (int8_decoder.cpp:54); absmax must not."""
    w = jnp.asarray([[-10.0, -5.0], [-8.0, -1.0]])
    q = quantize_per_channel(w)
    np.testing.assert_allclose(np.asarray(dequantize(q)), np.asarray(w),
                               atol=0.05)


def test_linear_int8_modes_close_to_fp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    ref = np.asarray(linear(x, w))
    qw = quantize_per_channel(w)
    w8 = np.asarray(linear(x, qw))                 # weight-only
    w8a8 = np.asarray(linear(x, qw, w8a8=True))    # full int8
    scale = np.abs(ref).max()
    assert np.abs(w8 - ref).max() < 0.02 * scale
    assert np.abs(w8a8 - ref).max() < 0.04 * scale


def test_ppl_delta_small():
    cfg = preset("gpt2-tiny")
    cfg.dtype = "float32"
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, cfg.vocab_size, (2, 48)).tolist()
    report = ppl_delta_report(cfg, params, seqs)
    # random-weight model: ppl ~ vocab size; quantization must not move it
    assert report["fp"] > 0
    assert abs(report["int8_delta"]) < 0.1 * report["fp"]
    assert abs(report["int8-weight_delta"]) < 0.05 * report["fp"]


@pytest.mark.parametrize("quant", ["int8", "int8-weight"])
def test_engine_int8_generates(quant):
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                          kv_dtype="int8"),
        runtime=RuntimeConfig(max_new_tokens=6),
    )
    cfg.model.dtype = "float32"
    cfg.model.quant = quant
    cfg_fp = dataclasses.replace(cfg)
    cfg_fp.model = dataclasses.replace(cfg.model, quant="none")
    cfg_fp.cache = dataclasses.replace(cfg.cache, kv_dtype="float32")
    fp_params = init_params(cfg_fp.model, jax.random.key(0))
    eng = Engine(cfg, params=fp_params, interpret=True)  # quantizes copy
    out = eng.generate([3, 5, 7], 6, GREEDY)
    assert len(out) == 6

    # int8 KV + int8 weights should track the fp greedy path closely:
    # compare logits trace against fp engine on same weights
    eng_fp = Engine(cfg_fp, params=fp_params, interpret=True)
    state_q = eng.prefill([[3, 5, 7]])
    state_f = eng_fp.prefill([[3, 5, 7]])
    lq = np.asarray(state_q.prefill_logits)
    lf = np.asarray(state_f.prefill_logits)
    denom = np.abs(lf).max() + 1e-6
    assert np.abs(lq - lf).max() / denom < 0.15


def test_fused_generate_int8_kv_matches_stepwise():
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                          kv_dtype="int8"),
        runtime=RuntimeConfig(max_new_tokens=6),
    )
    cfg.model.dtype = "float32"
    eng = Engine(cfg, interpret=True)
    fused = eng.generate_batch_fused([[1, 2, 3], [4, 5]], 5, GREEDY)
    step = eng.generate_batch([[1, 2, 3], [4, 5]], 5, GREEDY)
    assert fused == step


def test_paged_score_matches_dense_oracle():
    """Engine.score_nll (paged, chunked) must agree with the dense
    full-attention oracle — same per-seq mean NLL on a ragged batch."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.eval import (
        sequence_nll)

    mcfg = preset("llama-tiny")
    mcfg.dtype = "float32"
    params = init_params(mcfg, jax.random.key(1))
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, mcfg.vocab_size, (n,)).tolist()
            for n in (21, 48)]

    cfg = FrameworkConfig(
        model=mcfg,
        cache=CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(prefill_chunk=16),   # forces 3+ chunks
    )
    eng = Engine(cfg, params=params, interpret=True)
    paged = eng.score_nll(seqs)
    model = DecoderModel(mcfg)
    dense = [sequence_nll(model, params, s) for s in seqs]
    np.testing.assert_allclose(paged, dense, rtol=2e-3, atol=2e-3)
    # pages must all be freed afterwards
    assert eng.allocator.num_live == 0


def test_ppl_delta_paged_backend():
    """The scalable (paged) eval path reports the same FP ppl as the
    dense oracle and a small INT8 delta."""
    cfg = preset("gpt2-tiny")
    cfg.dtype = "float32"
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, cfg.vocab_size, (2, 48)).tolist()
    dense = ppl_delta_report(cfg, params, seqs, modes=("int8-weight",))
    paged = ppl_delta_report(cfg, params, seqs, modes=("int8-weight",),
                             backend="paged")
    assert abs(paged["fp"] - dense["fp"]) / dense["fp"] < 0.02
    assert abs(paged["int8-weight_delta"]) < 0.05 * paged["fp"]
