"""Mixture-of-Experts (Mixtral-style): routing math vs a per-token
oracle, dense-MLP equivalence at E=1, paged engine paths, INT8 experts,
and expert-parallel sharding parity on the virtual mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig,
    FrameworkConfig,
    ParallelConfig,
    RuntimeConfig,
    preset,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine,
    SamplingParams,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    DecoderModel,
    init_params,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import (
    build_mesh,
)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def moe_cfg(**kw):
    cfg = preset("mixtral-tiny")
    cfg.dtype = "float32"
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _framework(cfg_model, **runtime_kw):
    cfg = FrameworkConfig(
        model=cfg_model,
        cache=CacheConfig(page_size=8, num_pages=256, max_pages_per_seq=16,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8, **runtime_kw),
    )
    return cfg


def _moe_oracle(lp, h2, cfg):
    """Per-token routing oracle in numpy: for each token, pick top-k
    experts, softmax their logits, sum gated SwiGLU outputs."""
    def silu(v):
        return v / (1.0 + np.exp(-v))

    h = np.asarray(h2, np.float32)
    B, T, D = h.shape
    r = h @ np.asarray(lp["router"], np.float32)          # [B,T,E]
    out = np.zeros_like(h)
    k = cfg.experts_per_tok
    for b in range(B):
        for t in range(T):
            idx = np.argsort(-r[b, t])[:k]
            logits = r[b, t, idx]
            g = np.exp(logits - logits.max())
            g = g / g.sum()
            for gi, e in zip(g, idx):
                wg = np.asarray(lp["we_gate"][e], np.float32)
                wu = np.asarray(lp["we_up"][e], np.float32)
                wd = np.asarray(lp["we_down"][e], np.float32)
                y = (silu(h[b, t] @ wg) * (h[b, t] @ wu)) @ wd
                out[b, t] += gi * y
    return out


def test_moe_matches_per_token_oracle():
    cfg = moe_cfg()
    model = DecoderModel(cfg)
    params = init_params(cfg, jax.random.key(0))
    lp = {k: v[0] for k, v in params["layers"].items()}
    h2 = jax.random.normal(jax.random.key(1), (2, 5, cfg.hidden_size),
                           jnp.float32)
    got = np.asarray(model._moe(lp, h2, w8a8=False))
    want = _moe_oracle(lp, h2, cfg)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_moe_single_expert_equals_dense_swiglu():
    """E=1, k=1: the router contributes a constant gate of 1.0, so the
    MoE block must equal the dense SwiGLU MLP with the same weights."""
    cfg = moe_cfg(num_experts=1, experts_per_tok=1)
    model = DecoderModel(cfg)
    params = init_params(cfg, jax.random.key(0))
    lp = {k: v[0] for k, v in params["layers"].items()}
    h2 = jax.random.normal(jax.random.key(1), (2, 3, cfg.hidden_size),
                           jnp.float32)
    got = np.asarray(model._moe(lp, h2, w8a8=False))

    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.linear import (
        linear,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.common import (
        activation_fn,
    )

    gate = activation_fn("silu")(linear(h2, lp["we_gate"][0]))
    want = np.asarray(linear(gate * linear(h2, lp["we_up"][0]),
                             lp["we_down"][0]))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_moe_engine_paged_paths_agree():
    """Greedy generation through the paged engine: static-batch loop,
    fused whole-request program, and speculative decoding all agree
    (covers prefill+decode KV paths and the fused we_gu layout)."""
    eng = Engine(_framework(moe_cfg()), interpret=True)
    prompts = [[5, 9, 3, 14, 5, 9, 3, 14], [1, 2, 3], [7] * 12]
    a = eng.generate_batch(prompts, 8, GREEDY)
    b = eng.generate_batch_fused(prompts, 8, GREEDY)
    c = eng.generate_batch_spec(prompts, 8, GREEDY, spec_k=3)
    assert a == b == c
    assert all(len(o) == 8 for o in a)


def test_moe_int8_engine_runs():
    params = init_params(moe_cfg(), jax.random.key(0))
    cfg = moe_cfg()
    cfg.quant = "int8"
    # same weights, quantized by the engine (quantize_params handles the
    # [E, in, out] expert leaves) — w8a8 experts through the paged path
    eng = Engine(_framework(cfg), params=params, interpret=True)
    out = eng.generate_batch_fused([[5, 9, 3, 14], [2, 4, 6, 1]], 6,
                                   GREEDY)
    assert all(len(o) == 6 for o in out)
    # INT8 expert error stays small vs the float engine on SAME weights
    fp = Engine(_framework(moe_cfg()), params=params, interpret=True)
    sf = fp.prefill([[5, 9, 3, 14]])
    si = eng.prefill([[5, 9, 3, 14]])
    lf, li = sf.prefill_logits, si.prefill_logits
    cos = float(np.sum(lf * li)
                / (np.linalg.norm(lf) * np.linalg.norm(li)))
    assert cos > 0.99, cos
    fp.free(sf), eng.free(si)


def test_moe_expert_parallel_logits_match_single_device():
    """EP over the 'model' axis: tp=2 shards hold 2 whole experts each;
    teacher-forced logits must match the single-device engine."""
    assert len(jax.devices()) >= 2
    cfg_m = moe_cfg()
    fw = _framework(cfg_m)
    fw.parallel = ParallelConfig(dp=1, tp=2)
    fw.runtime.prefill_chunk = 16
    params = init_params(cfg_m, jax.random.key(3))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    forced = [[100, 200, 300], [7, 8, 9]]

    def trace(engine):
        state = engine.prefill(prompts)
        out = [state.prefill_logits]
        for step in range(len(forced[0])):
            toks = np.asarray([f[step] for f in forced], np.int32)
            out.append(engine.decode_forced(state, toks))
        engine.free(state)
        return np.stack(out)

    ref = trace(Engine(fw, params=params))
    for attempt in range(2):   # documented CPU-client flake, conftest.py
        got = trace(Engine(fw, params=params, mesh=build_mesh(fw.parallel)))
        if np.allclose(got, ref, atol=2e-4, rtol=2e-4):
            break
        assert np.abs(got - ref).max() > 1.0, "systematic EP drift"
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_moe_preset_validates():
    cfg = preset("mixtral-8x7b").validate()
    assert cfg.num_experts == 8 and cfg.experts_per_tok == 2
    with pytest.raises(AssertionError):
        dataclasses.replace(preset("mixtral-tiny"),
                            activation="gelu").validate()


def test_mixtral_hf_streaming_import_parity(tmp_path):
    """Stream-import a tiny HF Mixtral (block_sparse_moe.gate +
    experts.{e}.w1/w2/w3) and match its logits — router top-k semantics,
    expert stacking, and transposes all verified against torch."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    from transformers import MixtralConfig, MixtralForCausalLM

    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.backends import (
        DenseKVBackend,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.hf_stream import (
        import_hf_streaming,
        load_flat_params,
    )

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=257,
        max_position_embeddings=96, rms_norm_eps=1e-5,
        rope_theta=10000.0, num_local_experts=4, num_experts_per_tok=2,
        tie_word_embeddings=False, attention_dropout=0.0,
        sliding_window=None, output_router_logits=False)
    hf = MixtralForCausalLM(hf_cfg).eval()
    path = tmp_path / "mixtral"
    hf.save_pretrained(path, safe_serialization=True)

    cfg = moe_cfg(vocab_size=257, max_seq_len=96)
    flat = import_hf_streaming(str(path), cfg, quant=None)
    params = load_flat_params(flat, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 257, size=(2, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.numpy()

    model = DecoderModel(cfg)
    backend = DenseKVBackend(cfg, kv_dtype="float32")
    kv = backend.init_cache(2, cfg.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(tokens.shape[1]),
                                 tokens.shape)
    ours, _ = model.forward(params, jnp.asarray(tokens), positions, kv,
                            backend.attn_fn)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3,
                               rtol=5e-2)


def test_moe_dispatch_matches_masked_loop():
    """The sorted grouped-matmul dispatch (ops/gmm.py, engaged above
    the row threshold) must equal the masked dense loop on the same
    weights — exact routing, no dropped tokens."""
    cfg = moe_cfg()
    model = DecoderModel(cfg)
    params = init_params(cfg, jax.random.key(0))
    lp = {k: v[0] for k, v in params["layers"].items()}
    # S = B*T*k = 2*256*2 = 1024 >= E_local*256 -> dispatch path
    h2 = jax.random.normal(jax.random.key(2), (2, 256, cfg.hidden_size),
                           jnp.float32)
    got = np.asarray(model._moe(lp, h2, w8a8=False))
    # force the masked path on identical inputs by shrinking T
    outs = []
    for t0 in range(0, 256, 32):      # masked loop in 32-token slices
        outs.append(np.asarray(model._moe(
            lp, h2[:, t0:t0 + 32], w8a8=False)))
    want = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_moe_dispatch_int8_and_fused_gu():
    """Dispatch with fused INT8 we_gu (engine layout) stays close to
    the float masked loop."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        fuse_projections,
        quantize_params,
        unstack_layers,
    )

    cfg = moe_cfg()
    params = init_params(cfg, jax.random.key(0))
    ep = fuse_projections(unstack_layers(quantize_params(params)))
    lp_q = ep["layers"][0]
    lp_f = {k: v[0] for k, v in params["layers"].items()}
    cfg_q = moe_cfg(quant="int8-weight")
    model_q = DecoderModel(cfg_q)
    model_f = DecoderModel(cfg)
    h2 = jax.random.normal(jax.random.key(3), (1, 512, cfg.hidden_size),
                           jnp.float32)
    got = np.asarray(model_q._moe(lp_q, h2, w8a8=False))
    want = np.asarray(model_f._moe(lp_f, h2[:, :32], w8a8=False))
    cos = float(np.sum(got[:, :32] * want)
                / (np.linalg.norm(got[:, :32]) * np.linalg.norm(want)))
    assert cos > 0.999, cos


def test_moe_engine_prefill_uses_dispatch_path():
    """Long prompts cross the dispatch threshold during chunked
    prefill; generation must agree with the decode-only masked path
    (greedy, same weights)."""
    cfg = _framework(moe_cfg())
    cfg.runtime.prefill_chunk = 256
    cfg.cache = CacheConfig(page_size=8, num_pages=256,
                            max_pages_per_seq=48, kv_dtype="float32")
    eng = Engine(cfg, interpret=True)
    long_prompt = list(np.random.default_rng(0).integers(
        0, 512, size=300))
    short = [5, 9, 3]
    out = eng.generate_batch([long_prompt, short], 6, GREEDY)
    # same engine, tiny chunks (masked path only: S < E*256)
    cfg2 = _framework(moe_cfg())
    cfg2.runtime.prefill_chunk = 32
    cfg2.cache = CacheConfig(page_size=8, num_pages=256,
                             max_pages_per_seq=48, kv_dtype="float32")
    eng2 = Engine(cfg2, params=eng.params, interpret=True)
    assert eng2.generate_batch([long_prompt, short], 6, GREEDY) == out


def test_moe_dispatch_expert_parallel_parity():
    """Dispatch path under expert parallelism: long-prompt prefill on
    a tp=2 mesh (non-local slots gate to 0 and psum-vanish) matches
    the single-device engine."""
    assert len(jax.devices()) >= 2
    cfg_m = moe_cfg()
    fw = _framework(cfg_m)
    fw.runtime.prefill_chunk = 256
    fw.cache = CacheConfig(page_size=8, num_pages=256,
                           max_pages_per_seq=48, kv_dtype="float32")
    params = init_params(cfg_m, jax.random.key(5))
    prompt = list(np.random.default_rng(1).integers(0, 512, size=300))

    ref_eng = Engine(fw, params=params, interpret=True)
    ref = ref_eng.generate_batch([prompt], 4, GREEDY)

    fw2 = _framework(cfg_m)
    fw2.runtime.prefill_chunk = 256
    fw2.cache = CacheConfig(page_size=8, num_pages=256,
                            max_pages_per_seq=48, kv_dtype="float32")
    fw2.parallel = ParallelConfig(dp=1, tp=2)
    for attempt in range(2):   # documented CPU-client flake
        eng = Engine(fw2, params=params, mesh=build_mesh(fw2.parallel))
        got = eng.generate_batch([prompt], 4, GREEDY)
        if got == ref:
            break
    assert got == ref
