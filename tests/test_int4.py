"""INT4 weight quantization: packing, kernel, engine parity, PPL.

Int8 decode already streams at the chip's sustained-HBM floor
(BENCHMARKS.md round 3), so 4-bit weights are the remaining single-chip
throughput lever. No reference counterpart (its quantizer stops at
INT8, ``attention_cpu/int8_quant.hpp``); new-for-TPU capability.
"""

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
from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
    Q4Tensor,
    dequantize_int4,
    pack_int4,
    quantize_int4_groupwise,
    unpack_int4,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (32, 48)), jnp.int8)
    for bn in (4, 16, 48):
        rt = unpack_int4(pack_int4(q, bn), bn)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(q))


def test_groupwise_quant_error_bound():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    q4 = quantize_int4_groupwise(w, group=64)
    err = np.abs(np.asarray(dequantize_int4(q4)) - np.asarray(w))
    w3 = np.asarray(w).reshape(4, 64, 128)
    bound = np.abs(w3).max(axis=1, keepdims=True) / 7.0 / 2 * 1.01
    assert (err.reshape(4, 64, 128) <= bound + 1e-6).all()


@pytest.mark.parametrize("M,K,N,group,bn", [
    (3, 256, 384, 64, 128), (8, 512, 512, 128, 256),
    (5, 256, 768, 256, 768), (2, 64, 48, 128, 2048),
])
def test_w4_matmul_matches_dequant_oracle(M, K, N, group, bn):
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.int4_matmul import (
        w4_matmul,
    )

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32) / 8
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    q4 = quantize_int4_groupwise(w, group=group, bn=bn)
    ref = np.maximum(np.asarray(x @ dequantize_int4(q4) + bias), 0)
    got = w4_matmul(x, q4.packed, q4.scales, bias, group=q4.group,
                    bn=q4.bn, act="relu", out_dtype=jnp.float32,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3,
                               rtol=2e-3)


def _cfg(quant):
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8, temperature=0.0,
                              eos_token_id=-1),
    )
    cfg.model.dtype = "float32"
    cfg.model.quant = quant
    return cfg


def test_engine_int4_matches_dequantized_weights():
    """An int4 engine must generate exactly what a float engine with
    the DEQUANTIZED int4 weights generates (same effective weights)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
        Engine,
    )

    eng4 = Engine(_cfg("int4"), interpret=True, seed=0)
    layers = eng4.params["layers"]
    assert any(isinstance(v, Q4Tensor) for v in layers[0].values())

    def deq(tree):
        if isinstance(tree, Q4Tensor):
            return dequantize_int4(tree, jnp.float32)
        if isinstance(tree, dict):
            return {k: deq(v) for k, v in tree.items()}
        if isinstance(tree, (tuple, list)):
            return tuple(deq(v) for v in tree)
        return tree

    pf = {k: deq(v) for k, v in eng4.params.items()}
    engf = Engine(_cfg("none"), params=pf, interpret=True, seed=0)

    prompt = [3, 5, 7, 9, 11]
    t4 = eng4.generate(prompt, 8)
    tf = engf.generate(prompt, 8)
    assert t4 == tf, (t4, tf)


def test_int4_ppl_close_to_fp(tmp_path):
    """quant/eval-style check: int4 NLL within a few percent of fp on
    the same random-weight model (groupwise scales keep 4-bit sane)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
        Engine,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        quantize_params_int4,
    )

    engf = Engine(_cfg("none"), interpret=True, seed=0)
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 512, (48,)).tolist() for _ in range(2)]
    nll_f = engf.score_nll(seqs)

    p4 = quantize_params_int4(engf.params)
    eng4 = Engine(_cfg("int4"), params=p4, interpret=True, seed=0)
    nll_4 = eng4.score_nll(seqs)
    rel = np.abs(nll_4 - nll_f) / np.abs(nll_f)
    assert (rel < 0.05).all(), (nll_f, nll_4)


def test_int4_outlier_worst_case_nll_bound():
    """Synthetic worst case for int4 quality (VERDICT r3: pin a bound
    while real pretrained weights stay unreachable): weights with
    heavy-tailed OUTLIERS scattered inside columns — the case that
    inflates a group's absmax and coarsens every other row in it
    (per-column outliers alone are absorbed by the per-column scale).
    With 128-row groups the end-to-end NLL delta must stay within a
    pinned bound; this is the distribution class where group-wise
    scales earn their keep over per-column int8-style scaling."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
        Engine,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        quantize_params_int4,
    )

    engf = Engine(_cfg("none"), interpret=True, seed=0)
    rng = np.random.default_rng(7)

    def inject(tree):
        # 1% of entries scaled x16: a heavy-tailed (outlier) weight
        # distribution like real LLM down-projections exhibit
        if isinstance(tree, jnp.ndarray) and tree.ndim == 2 \
                and tree.shape[0] >= 32:
            m = rng.random(tree.shape) < 0.01
            return jnp.asarray(np.where(m, np.asarray(tree) * 16.0,
                                        np.asarray(tree)))
        if isinstance(tree, dict):
            return {k: inject(v) for k, v in tree.items()}
        if isinstance(tree, (tuple, list)):
            return tuple(inject(v) for v in tree)
        return tree

    pf = {k: (inject(v) if k == "layers" else v)
          for k, v in engf.params.items()}
    engf = Engine(_cfg("none"), params=pf, interpret=True, seed=0)
    seqs = [rng.integers(0, 512, (48,)).tolist() for _ in range(2)]
    nll_f = engf.score_nll(seqs)

    p4 = quantize_params_int4({k: v for k, v in engf.params.items()})
    eng4 = Engine(_cfg("int4"), params=p4, interpret=True, seed=0)
    nll_4 = eng4.score_nll(seqs)
    rel = np.abs(nll_4 - nll_f) / np.abs(nll_f)
    # pinned worst-case bound: <= 10% relative NLL delta under 1%
    # x16-outlier contamination (vanilla random weights sit under 5%,
    # test_int4_ppl_close_to_fp)
    assert (rel < 0.10).all(), (nll_f, nll_4)


def test_int4_checkpoint_roundtrip(tmp_path):
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.checkpoint import (
        load_params,
        save_params,
    )

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    q4 = quantize_int4_groupwise(w, group=64)
    params = {"layers": {"w_qkv": q4, "ln1_scale": jnp.ones((8,))}}
    path = str(tmp_path / "ck.npz")
    save_params(params, path)
    back = load_params(path)
    q = back["layers"]["w_qkv"]
    assert isinstance(q, Q4Tensor)
    assert q.group == 64 and q.bn == q4.bn
    np.testing.assert_array_equal(np.asarray(q.packed),
                                  np.asarray(q4.packed))
    np.testing.assert_allclose(np.asarray(q.scales),
                               np.asarray(q4.scales))
