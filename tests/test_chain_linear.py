"""Decode megakernel (ops/chain_linear.py): chained weight-stream
matmuls vs the per-op reference path — kernel-level parity, model
forward parity (GPT-2-shaped LN/GELU/bias and Llama-shaped
RMSNorm/SwiGLU, dense and INT8-weight), and engine greedy equivalence
with the megakernel enabled."""

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
    Engine,
    SamplingParams,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.chained import (
    build_decode_chains,
    chains_supported,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    fuse_projections,
    init_params,
    quantize_params,
    unstack_layers,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.chain_linear import (
    OP_D,
    OP_G,
    OP_O,
    OP_T,
    OP_U,
    chain_decode,
    pack_chain,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.common import (
    activation_fn,
    layernorm,
    rmsnorm,
)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * 0.1


def _ref_chain(attn_in, x, ws, cfg):
    """Per-op numpy/jnp reference of the chain semantics."""
    act_kind, norm_kind = cfg
    y = attn_in @ ws["wo"] + ws["bo"]
    x = x + y
    if norm_kind == "rmsnorm":
        h = rmsnorm(x, ws["ln2_s"], 1e-5)
    else:
        h = layernorm(x, ws["ln2_s"], ws["ln2_b"], 1e-5)
    if act_kind == "swiglu":
        g = h @ ws["w_gate"]
        u = h @ ws["w_up"]
        mid = activation_fn("silu")(g) * u
    else:
        mid = activation_fn(act_kind)(h @ ws["w_up"] + ws["b_up"])
    x = x + (mid @ ws["w_down"] + ws["b_down"])
    if "w_qkv" not in ws:
        return x, None
    if norm_kind == "rmsnorm":
        h2 = rmsnorm(x, ws["ln1_s"], 1e-5)
    else:
        h2 = layernorm(x, ws["ln1_s"], ws["ln1_b"], 1e-5)
    return x, h2 @ ws["w_qkv"] + ws["b_qkv"]


def _make_weights(D, I, Nq, act_kind):
    ws = {
        "wo": _rand(0, D, D), "bo": _rand(1, D),
        "w_down": _rand(2, I, D), "b_down": _rand(3, D),
        "ln2_s": 1.0 + 0.1 * _rand(4, D), "ln2_b": _rand(5, D),
        "ln1_s": 1.0 + 0.1 * _rand(6, D), "ln1_b": _rand(7, D),
        "w_qkv": _rand(8, D, Nq), "b_qkv": _rand(9, Nq),
        "w_up": _rand(10, D, I),
    }
    if act_kind == "swiglu":
        ws["w_gate"] = _rand(11, D, I)
    else:
        ws["b_up"] = _rand(12, I)
    return ws


def _pack(ws, D, I, act_kind, norm_kind, *, tail=True, bk=128, bn=128):
    ops = [(OP_O, ws["wo"], ws["bo"])]
    if act_kind == "swiglu":
        ops += [(OP_G, ws["w_gate"], None), (OP_U, ws["w_up"], None)]
    else:
        ops += [(OP_U, ws["w_up"], ws["b_up"])]
    ops += [(OP_D, ws["w_down"], ws["b_down"])]
    if tail:
        ops += [(OP_T, ws["w_qkv"], ws["b_qkv"])]
    ln_b = ws["ln2_b"] if norm_kind == "layernorm" else None
    ln1b = ws["ln1_b"] if norm_kind == "layernorm" else None
    return pack_chain(
        ops, D=D, I=I,
        ln_after_o=(ws["ln2_s"], ln_b),
        ln_after_down=(ws["ln1_s"], ln1b) if tail else None,
        act_kind=act_kind, norm_kind=norm_kind, eps=1e-5,
        bk=bk, bn=bn, w_dtype=jnp.float32)


@pytest.mark.parametrize("act_kind,norm_kind", [
    ("swiglu", "rmsnorm"),       # llama-shaped
    ("gelu", "layernorm"),       # gpt-2-shaped
    ("relu", "layernorm"),
])
def test_chain_kernel_matches_per_op_reference(act_kind, norm_kind):
    D, I, Nq, B = 256, 384, 192, 3
    ws = _make_weights(D, I, Nq, act_kind)
    attn_in = _rand(20, B, D)
    x = _rand(21, B, D)
    pc = _pack(ws, D, I, act_kind, norm_kind)
    got_x, got_t = chain_decode(pc, attn_in, x, interpret=True)
    want_x, want_t = _ref_chain(attn_in, x, ws, (act_kind, norm_kind))
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=2e-4, rtol=2e-4)


def test_chain_kernel_no_tail_and_unaligned_dims():
    """Last-layer chain (no qkv tail) + dims that need k/n padding."""
    D, I, B = 192, 320, 2                   # 320 % 128 != 0
    ws = _make_weights(D, I, 64, "swiglu")
    pc = _pack(ws, D, I, "swiglu", "rmsnorm", tail=False)
    got_x, got_t = chain_decode(pc, _rand(22, B, D), _rand(23, B, D),
                                interpret=True)
    assert got_t is None
    want_x, _ = _ref_chain(_rand(22, B, D), _rand(23, B, D),
                           {**ws, **{}}, ("swiglu", "rmsnorm"))
    # drop the tail comparison; x must still match
    ws2 = dict(ws)
    del ws2["w_qkv"]
    want_x, none = _ref_chain(_rand(22, B, D), _rand(23, B, D), ws2,
                              ("swiglu", "rmsnorm"))
    assert none is None
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=2e-4, rtol=2e-4)


def test_chain_kernel_int8_weights_close():
    """INT8-weight chain (per-channel scales applied in-kernel) tracks
    the f32 chain within quantization error."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
        quantize_per_channel,
    )

    D, I, Nq, B = 256, 384, 192, 4
    ws = _make_weights(D, I, Nq, "swiglu")
    attn_in, x = _rand(24, B, D), _rand(25, B, D)
    qs = dict(ws)
    for k in ("wo", "w_gate", "w_up", "w_down", "w_qkv"):
        qs[k] = quantize_per_channel(ws[k])
    ops = [(OP_O, qs["wo"], ws["bo"]),
           (OP_G, qs["w_gate"], None), (OP_U, qs["w_up"], None),
           (OP_D, qs["w_down"], ws["b_down"]),
           (OP_T, qs["w_qkv"], ws["b_qkv"])]
    pc = pack_chain(ops, D=D, I=I,
                    ln_after_o=(ws["ln2_s"], None),
                    ln_after_down=(ws["ln1_s"], None),
                    act_kind="swiglu", norm_kind="rmsnorm", eps=1e-5,
                    bk=128, bn=128, w_dtype=jnp.int8)
    got_x, got_t = chain_decode(pc, attn_in, x, interpret=True)
    # exact reference: the same chain math over DEQUANTIZED weights —
    # isolates kernel correctness from quantization error
    deq = dict(ws)
    for k in ("wo", "w_gate", "w_up", "w_down", "w_qkv"):
        deq[k] = qs[k].values.astype(jnp.float32) * qs[k].scales
    want_x, want_t = _ref_chain(attn_in, x, deq, ("swiglu", "rmsnorm"))
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=2e-4, rtol=2e-4)
    # and the quantized chain stays directionally faithful to f32
    fw_x, fw_t = _ref_chain(attn_in, x, ws, ("swiglu", "rmsnorm"))
    cos = float(np.sum(np.asarray(got_t) * np.asarray(fw_t))
                / (np.linalg.norm(got_t) * np.linalg.norm(fw_t)))
    assert cos > 0.999, cos


def test_chain_kernel_w8a8_matches_linear_path():
    """w8a8 chain (in-kernel per-row activation quant + s8xs8->s32) ==
    the ops/linear.py w8a8 per-op path with the same quantized weights,
    up to requantization rounding."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.linear import (
        linear,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
        quantize_per_channel,
    )

    D, I, Nq, B = 256, 384, 192, 3
    ws = _make_weights(D, I, Nq, "swiglu")
    attn_in, x = _rand(40, B, D), _rand(41, B, D)
    qs = {k: quantize_per_channel(ws[k])
          for k in ("wo", "w_gate", "w_up", "w_down", "w_qkv")}
    ops = [(OP_O, qs["wo"], ws["bo"]),
           (OP_G, qs["w_gate"], None), (OP_U, qs["w_up"], None),
           (OP_D, qs["w_down"], ws["b_down"]),
           (OP_T, qs["w_qkv"], ws["b_qkv"])]
    pc = pack_chain(ops, D=D, I=I,
                    ln_after_o=(ws["ln2_s"], None),
                    ln_after_down=(ws["ln1_s"], None),
                    act_kind="swiglu", norm_kind="rmsnorm", eps=1e-5,
                    bk=128, bn=128, w_dtype=jnp.int8, w8a8=True)
    assert pc.w8a8
    got_x, got_t = chain_decode(pc, attn_in, x, interpret=True)

    # reference: same ops through linear(..., w8a8=True)
    xr = x + linear(attn_in, qs["wo"], ws["bo"], w8a8=True)
    h = rmsnorm(xr, ws["ln2_s"], 1e-5)
    g = linear(h, qs["w_gate"], w8a8=True)
    u = linear(h, qs["w_up"], w8a8=True)
    mid = activation_fn("silu")(g) * u
    xr = xr + linear(mid, qs["w_down"], ws["b_down"], w8a8=True)
    h2 = rmsnorm(xr, ws["ln1_s"], 1e-5)
    t = linear(h2, qs["w_qkv"], ws["b_qkv"], w8a8=True)
    # both paths quantize activations dynamically; tiny drift comes
    # from the kernel quantizing the *normed/activated* rows once vs
    # linear() quantizing each op input independently (same tensors
    # here) — tolerances cover int8 rounding only
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(xr),
                               atol=0.02, rtol=0.02)
    cos = float(np.sum(np.asarray(got_t) * np.asarray(t))
                / (np.linalg.norm(got_t) * np.linalg.norm(t)))
    assert cos > 0.9999, cos


def test_engine_megakernel_w8a8_runs():
    """quant='int8' engine with megakernel (and dropped per-op
    weights): fused greedy output matches the megakernel-off w8a8
    engine (same weights, same dynamic-quant semantics -> identical
    argmax decisions at these scales)."""
    def fw(mega):
        cfg = FrameworkConfig(
            model=preset("llama-tiny"),
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=8, megakernel=mega,
                                  megakernel_drop_weights=mega))
        cfg.model.dtype = "float32"
        cfg.model.quant = "int8"
        return cfg

    eng_off = Engine(fw(False), interpret=True, seed=13)
    eng_on = Engine(fw(True), params=dict(eng_off.params),
                    interpret=True)
    assert "chains" in eng_on.params
    # w8a8 prefill runs through the w8a8 packed_linear kernel
    assert "wo" not in eng_on.params["layers"][1]
    prompts = [[5, 9, 3, 14], [1, 2, 3]]
    a = eng_off.generate_batch_fused(prompts, 8, GREEDY)
    b = eng_on.generate_batch_fused(prompts, 8, GREEDY)
    assert a == b


@pytest.mark.parametrize("name", ["gpt2-tiny", "llama-tiny"])
def test_model_forward_chained_matches_regular(name):
    """Full-model decode-step logits: chained path == per-op path."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.backends import (
        DenseKVBackend,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        DecoderModel,
    )

    cfg = preset(name)
    cfg.dtype = "float32"
    model = DecoderModel(cfg)
    params = fuse_projections(unstack_layers(
        init_params(cfg, jax.random.key(0))))
    assert chains_supported(cfg, params)
    chained = build_decode_chains(params, cfg)

    backend = DenseKVBackend(cfg, kv_dtype="float32")
    B, T = 2, 6
    tokens = jax.random.randint(jax.random.key(1), (B, T), 0,
                                cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))

    # prefill T tokens through the regular path on both caches, then
    # decode one token per path and compare logits
    kv_a = backend.init_cache(B, 64)
    kv_b = backend.init_cache(B, 64)
    _, kv_a = model.forward(params, tokens, positions, kv_a,
                            backend.attn_fn)
    _, kv_b = model.forward(chained, tokens, positions, kv_b,
                            backend.attn_fn)
    nxt = jnp.full((B, 1), 7, jnp.int32)
    pos = jnp.full((B, 1), T, jnp.int32)
    ref, _ = model.forward(params, nxt, pos, kv_a, backend.attn_fn)
    got, _ = model.forward(chained, nxt, pos, kv_b, backend.attn_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("name,quant", [
    ("gpt2-tiny", "none"),
    ("llama-tiny", "none"),
    ("llama-tiny", "int8-weight"),
])
def test_engine_megakernel_greedy_equivalence(name, quant):
    """End to end through the paged engine: megakernel on vs off must
    produce identical greedy tokens (same weights, same pages)."""
    def fw(mega):
        cfg = FrameworkConfig(
            model=preset(name),
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=8, megakernel=mega))
        cfg.model.dtype = "float32"
        cfg.model.quant = quant
        return cfg

    params = None
    eng_off = Engine(fw(False), interpret=True)
    params = eng_off.params
    # strip engine-layout params back through a fresh engine with the
    # megakernel enabled (same weights)
    eng_on = Engine(fw(True), params={k: v for k, v in params.items()},
                    interpret=True)
    assert "chains" in eng_on.params
    prompts = [[5, 9, 3, 14, 2], [1, 2, 3], [7] * 9]
    a = eng_off.generate_batch(prompts, 8, GREEDY)
    b = eng_on.generate_batch(prompts, 8, GREEDY)
    assert a == b
    c = eng_on.generate_batch_fused(prompts, 8, GREEDY)
    assert c == b


def test_packed_linear_matches_dense_ops():
    """Individual ops served out of the packed blocks == plain matmuls
    (including the (OP_G, OP_U) pair == the fused gate|up concat)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.chain_linear import (
        packed_linear,
    )

    D, I, Nq, B = 256, 384, 192, 5
    ws = _make_weights(D, I, Nq, "swiglu")
    pc = _pack(ws, D, I, "swiglu", "rmsnorm")
    x = _rand(30, B, D)
    mid = _rand(31, B, I)
    np.testing.assert_allclose(
        np.asarray(packed_linear(pc, (OP_O,), x, interpret=True)),
        np.asarray(x @ ws["wo"] + ws["bo"]), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(packed_linear(pc, (OP_G, OP_U), x, interpret=True)),
        np.asarray(jnp.concatenate([x @ ws["w_gate"], x @ ws["w_up"]],
                                   axis=-1)), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(packed_linear(pc, (OP_D,), mid, interpret=True)),
        np.asarray(mid @ ws["w_down"] + ws["b_down"]),
        atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(packed_linear(pc, (OP_T,), x, interpret=True)),
        np.asarray(x @ ws["w_qkv"] + ws["b_qkv"]), atol=2e-4, rtol=2e-4)
    # gelu epilogue + leading batch dims
    ws2 = _make_weights(D, I, Nq, "gelu")
    pc2 = _pack(ws2, D, I, "gelu", "layernorm")
    x3 = _rand(32, 2, B, D)
    np.testing.assert_allclose(
        np.asarray(packed_linear(pc2, (OP_U,), x3, act="gelu",
                                 interpret=True)),
        np.asarray(activation_fn("gelu")(x3 @ ws2["w_up"]
                                         + ws2["b_up"])),
        atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("name,quant", [
    ("gpt2-tiny", "none"),
    ("llama-tiny", "int8-weight"),
])
def test_engine_megakernel_drop_weights(name, quant):
    """One weight layout in HBM: per-op copies dropped, prefill and
    multi-token steps served by packed_linear, decode by the chain
    kernel — greedy tokens must match the regular engine, and the heavy
    per-op weights must actually be gone."""
    def fw(mega, drop):
        cfg = FrameworkConfig(
            model=preset(name),
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=8, prefill_chunk=8,
                                  megakernel=mega,
                                  megakernel_drop_weights=drop))
        cfg.model.dtype = "float32"
        cfg.model.quant = quant
        return cfg

    eng_off = Engine(fw(False, False), interpret=True, seed=11)
    eng_on = Engine(fw(True, True),
                    params=dict(eng_off.params), interpret=True)
    lp1 = eng_on.params["layers"][1]
    assert "wo" not in lp1 and "w_qkv" not in lp1
    assert "w_qkv" in eng_on.params["layers"][0]
    prompts = [[5, 9, 3, 14, 2, 8, 1, 4, 4, 13], [1, 2, 3], [7] * 6]
    a = eng_off.generate_batch(prompts, 8, GREEDY)
    b = eng_on.generate_batch(prompts, 8, GREEDY)
    assert a == b
    assert eng_on.generate_batch_fused(prompts, 8, GREEDY) == b
    # speculative decoding verifies multi-token spans through the
    # packed path (T = spec_k+1 > 1)
    c = eng_on.generate_batch_spec(prompts, 8, GREEDY, spec_k=3)
    assert c == b


def test_engine_drop_weights_nondivisible_intermediate():
    """TinyLlama-shaped geometry: intermediate_size NOT a multiple of
    the packed bn, so the dropped-weights prefill serves gate and up
    as separate packed ops (the fused pair would misalign on gate's
    padded columns). Greedy parity vs the regular engine."""
    import dataclasses

    def fw(mega):
        m = dataclasses.replace(preset("llama-tiny"),
                                intermediate_size=320)   # 320 % 128 != 0
        cfg = FrameworkConfig(
            model=m,
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=8, prefill_chunk=8,
                                  megakernel=mega,
                                  megakernel_drop_weights=mega))
        cfg.model.dtype = "float32"
        return cfg

    eng_off = Engine(fw(False), interpret=True, seed=17)
    eng_on = Engine(fw(True), params=dict(eng_off.params),
                    interpret=True)
    pc = eng_on.params["chains"][0]
    assert pc.I % pc.bn != 0
    prompts = [[5, 9, 3, 14, 2, 8, 1, 4, 4], [1, 2, 3]]
    assert (eng_on.generate_batch_fused(prompts, 8, GREEDY)
            == eng_off.generate_batch_fused(prompts, 8, GREEDY))


def test_scheduler_serves_through_megakernel():
    """The continuous-batching scheduler's decode bursts call the same
    T=1 forward, so chains engage transparently; tokens must match a
    megakernel-off scheduler run."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler import (
        RequestState,
        Scheduler,
    )

    def run(mega):
        cfg = FrameworkConfig(
            model=preset("llama-tiny"),
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=6, max_batch_size=4,
                                  decode_burst=4, megakernel=mega))
        cfg.model.dtype = "float32"
        eng = Engine(cfg, interpret=True, seed=5)
        sched = Scheduler(eng)
        reqs = [sched.submit(p, 6, GREEDY)
                for p in ([3, 1, 4, 1, 5], [9, 2, 6], [5] * 10)]
        sched.run_until_idle()
        assert all(r.state == RequestState.FINISHED for r in reqs)
        return [r.tokens for r in reqs]

    assert run(True) == run(False)


def test_beam_search_through_megakernel():
    """Beam search scores beams with T=1 teacher-forced decodes, so the
    chained path engages; hypotheses must match the regular engine."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.beam import (
        BeamSearcher,
    )

    def run(mega, drop):
        cfg = FrameworkConfig(
            model=preset("llama-tiny"),
            cache=CacheConfig(page_size=8, num_pages=256,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=6, megakernel=mega,
                                  megakernel_drop_weights=drop))
        cfg.model.dtype = "float32"
        eng = Engine(cfg, interpret=True, seed=7)
        hyps = BeamSearcher(eng, beam_width=3).search([3, 1, 4, 1, 5], 6)
        return [(h.tokens, round(h.score, 4)) for h in hyps]

    ref = run(False, False)
    assert run(True, False) == ref
    assert run(True, True) == ref


def test_sliding_window_preset_through_megakernel():
    """Mistral-style windowed attention only changes the attention op;
    chains must compose with it (greedy parity vs megakernel-off)."""
    import dataclasses

    def run(mega):
        m = dataclasses.replace(preset("llama-tiny"), sliding_window=16)
        cfg = FrameworkConfig(
            model=m,
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12,
                              kv_dtype="float32"),
            runtime=RuntimeConfig(max_new_tokens=8, megakernel=mega,
                                  megakernel_drop_weights=mega))
        cfg.model.dtype = "float32"
        eng = Engine(cfg, interpret=True, seed=9)
        return eng.generate_batch_fused([[5, 9, 3, 14] * 6, [1, 2, 3]],
                                        8, GREEDY)

    assert run(True) == run(False)


def test_engine_megakernel_benchmark_config_smoke():
    """The exact north-star bench combination at tiny dims: bf16
    activations, int8-weight quant, INT8 KV pages, megakernel with
    dropped per-op weights — runs and matches the megakernel-off
    engine (bf16 rounding can flip near-ties on random weights, so
    compare teacher-forced logits, not greedy tokens)."""
    def fw(mega):
        cfg = FrameworkConfig(
            model=preset("llama-tiny"),
            cache=CacheConfig(page_size=8, num_pages=128,
                              max_pages_per_seq=12, kv_dtype="int8"),
            runtime=RuntimeConfig(max_new_tokens=6, prefill_chunk=8,
                                  megakernel=mega,
                                  megakernel_drop_weights=mega))
        cfg.model.quant = "int8-weight"   # dtype stays bf16
        return cfg

    eng_off = Engine(fw(False), interpret=True, seed=19)
    eng_on = Engine(fw(True), params=dict(eng_off.params),
                    interpret=True)
    prompts = [[5, 9, 3, 14, 2], [1, 2, 3]]
    sf = eng_off.prefill(prompts)
    si = eng_on.prefill(prompts)
    np.testing.assert_allclose(np.asarray(si.prefill_logits),
                               np.asarray(sf.prefill_logits),
                               atol=0.15, rtol=0.15)
    forced = np.asarray([7, 9], np.int32)
    lo = eng_off.decode_forced(sf, forced)
    lm = eng_on.decode_forced(si, forced)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lo),
                               atol=0.15, rtol=0.15)
    eng_off.free(sf), eng_on.free(si)


def test_chains_supported_gates():
    cfg = preset("llama-tiny")
    params = fuse_projections(unstack_layers(
        init_params(cfg, jax.random.key(0))))
    assert chains_supported(cfg, params)
    assert not chains_supported(cfg, params, tp_axis="model")
    import dataclasses
    moe = dataclasses.replace(cfg, num_experts=4)
    assert not chains_supported(moe, params)
    w8a8 = dataclasses.replace(cfg, quant="int8")
    assert chains_supported(w8a8, params)      # w8a8 chains supported
    stacked = init_params(cfg, jax.random.key(0))
    assert not chains_supported(cfg, stacked)
