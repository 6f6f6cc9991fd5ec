"""Pallas fused INT8 matmul vs f32 oracle (SURVEY.md §4 item 1).

Interpret mode on CPU; the identical kernel compiles on TPU (exercised
by bench.py --quant int8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.int8_matmul import (
    int8_matmul)
from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
    quantize_per_channel, quantize_per_row)

RNG = np.random.default_rng(7)


def run(M, K, N, act=None, bias=False, **kw):
    x = jnp.asarray(RNG.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(K, N)), jnp.float32)
    b = (jnp.asarray(RNG.normal(size=(N,)), jnp.float32) if bias else None)
    xq = quantize_per_row(x)
    wq = quantize_per_channel(w)
    out = int8_matmul(xq.values, xq.scales, wq.values, wq.scales, b,
                      act=act, out_dtype=jnp.float32, interpret=True, **kw)
    ref = x @ w + (b if bias else 0.0)
    if act == "relu":
        ref = jnp.maximum(ref, 0)
    elif act == "gelu":
        ref = jax.nn.gelu(ref, approximate=True)
    elif act == "silu":
        ref = jax.nn.silu(ref)
    return np.asarray(out), np.asarray(ref)


@pytest.mark.parametrize("shape", [(8, 768, 3072), (33, 256, 130),
                                   (128, 512, 512), (1, 64, 64)])
def test_matches_f32_oracle(shape):
    out, ref = run(*shape)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.03


@pytest.mark.parametrize("act", ["relu", "gelu", "silu"])
def test_fused_activation(act):
    out, ref = run(16, 128, 256, act=act, bias=True)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.03


def test_k_blocking_accumulates():
    """K larger than one block: s32 accumulation across grid steps."""
    out, ref = run(32, 2048, 256, bk=512)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.03


def test_matches_xla_w8a8_path():
    """The Pallas kernel and the XLA w8a8 path agree bit-closely
    (same quantized operands, same math)."""
    x = jnp.asarray(RNG.normal(size=(8, 256)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(256, 128)), jnp.float32)
    xq = quantize_per_row(x)
    wq = quantize_per_channel(w)
    ref = (jax.lax.dot_general(
        xq.values, wq.values, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
        * xq.scales * wq.scales.reshape(1, -1))
    out = int8_matmul(xq.values, xq.scales, wq.values, wq.scales,
                      out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
