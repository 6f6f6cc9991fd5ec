"""Pallas paged-attention kernel vs dense oracle (SURVEY.md §4 item 1).

Runs in interpret mode on CPU; the same code path compiles on TPU.
Pools use the combined layout ``[2, KH, P, page, dh]`` (axis 0 = K/V).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig,
    preset,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
    append_to_pages_at_layer,
    gather_kv_dense,
    quantize_kv,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.attention_ref import (
    dense_attention,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
    paged_attention,
)

PAGE = 8


def make_paged_state(rng, B, KH, dh, seq_lens, num_pages=64, max_pages=8,
                     int8=False):
    """Random KV content written into randomly-permuted pages (1 layer)."""
    if int8:
        kv = (jnp.zeros((1, 2, KH, num_pages, PAGE, dh), jnp.int8),
              jnp.zeros((1, 2, KH, num_pages, PAGE, 1), jnp.float32))
    else:
        kv = (jnp.zeros((1, 2, KH, num_pages, PAGE, dh), jnp.float32),)
    perm = rng.permutation(num_pages - 1)[: B * max_pages] + 1  # avoid page 0
    block_tables = jnp.asarray(perm.reshape(B, max_pages), jnp.int32)

    max_len = max(seq_lens)
    k = rng.normal(size=(B, max_len, KH, dh)).astype(np.float32)
    v = rng.normal(size=(B, max_len, KH, dh)).astype(np.float32)
    positions = np.broadcast_to(np.arange(max_len), (B, max_len)).copy()
    for b, L in enumerate(seq_lens):  # invalidate beyond each seq's length
        positions[b, L:] = -1
    kv = append_to_pages_at_layer(kv, jnp.asarray(k), jnp.asarray(v),
                                  jnp.int32(0), jnp.asarray(positions),
                                  block_tables)
    layer0 = tuple(x[0] for x in kv)
    return layer0, block_tables, k, v


@pytest.mark.parametrize("KH,G", [(2, 1), (2, 3)])
@pytest.mark.parametrize("T", [1, 5])
def test_paged_vs_dense(KH, G, T):
    rng = np.random.default_rng(42)
    B, dh = 3, 32
    H = KH * G
    seq_lens = [13, PAGE * 4, 1 + T]  # ragged; last one is a fresh sequence
    seq_lens = [max(s, T) for s in seq_lens]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens)

    q = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    q_offsets = sl - T  # q tokens are the last T of each sequence

    out = paged_attention(q, kv[0], block_tables, sl, q_offsets,
                          page_size=PAGE, num_q_heads=H, interpret=True)

    # oracle: dense attention over the same KV
    max_len = max(seq_lens)
    k_d, v_d = gather_kv_dense(kv, block_tables, max_len)
    np.testing.assert_allclose(np.asarray(k_d)[0, :seq_lens[0]],
                               k[0, :seq_lens[0]], atol=1e-6)
    positions = q_offsets[:, None] + jnp.arange(T)[None, :]
    ref = dense_attention(q, k_d, v_d, positions, sl, 1.0 / np.sqrt(dh))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_paged_attention_page_aligned_lengths():
    """Lengths exactly at page boundaries (off-by-one hotspot)."""
    rng = np.random.default_rng(7)
    B, KH, G, dh, T = 2, 1, 2, 16, 1
    H = KH * G
    seq_lens = [PAGE, PAGE * 2]
    kv, block_tables, _, _ = make_paged_state(rng, B, KH, dh, seq_lens)
    q = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    out = paged_attention(q, kv[0], block_tables, sl, sl - T,
                          page_size=PAGE, num_q_heads=H, interpret=True)
    k_d, v_d = gather_kv_dense(kv, block_tables, max(seq_lens))
    ref = dense_attention(q, k_d, v_d, (sl - T)[:, None], sl,
                          1.0 / np.sqrt(dh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_model_dense_vs_paged_backend():
    """Full model: paged backend ≡ dense backend (prefill + decode)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.backends import (
        DenseKVBackend,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.paged_backend import (
        PagedKVBackend,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        DecoderModel,
        init_params,
    )

    cfg = preset("llama-tiny")
    cfg.dtype = "float32"
    cache = CacheConfig(page_size=PAGE, num_pages=32, max_pages_per_seq=4,
                        kv_dtype="float32")
    model = DecoderModel(cfg)
    params = init_params(cfg, jax.random.key(0))

    B, T = 2, 9
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))

    dense = DenseKVBackend(cfg, kv_dtype="float32")
    dlogits, dkv = model.forward(params, tokens, positions,
                                 dense.init_cache(B, 64), dense.attn_fn)

    paged = PagedKVBackend(cfg, cache, interpret=True)
    block_tables = jnp.arange(1, B * 4 + 1, dtype=jnp.int32).reshape(B, 4)
    sl = jnp.full((B,), T, jnp.int32)
    attn = paged.make_attn_fn(block_tables, sl, jnp.zeros((B,), jnp.int32))
    plogits, pkv = model.forward(params, tokens, positions,
                                 paged.init_cache(), attn)
    np.testing.assert_allclose(np.asarray(plogits), np.asarray(dlogits),
                               atol=1e-4, rtol=1e-4)

    # one decode step
    tok = jnp.argmax(plogits[:, -1:], -1)
    pos = jnp.full((B, 1), T)
    dl2, _ = model.forward(params, tok, pos, dkv, dense.attn_fn)
    attn2 = paged.make_attn_fn(block_tables, sl + 1, sl)
    pl2, _ = model.forward(params, tok, pos, pkv, attn2)
    np.testing.assert_allclose(np.asarray(pl2), np.asarray(dl2),
                               atol=1e-4, rtol=1e-4)


def test_paged_attention_int8_kv():
    """INT8 KV pages with per-(token, head) scales dequantized in-kernel."""
    rng = np.random.default_rng(17)
    B, KH, G, dh, T = 2, 2, 2, 32, 1
    H = KH * G
    seq_lens = [11, 19]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens,
                                              num_pages=32, max_pages=4,
                                              int8=True)

    q = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    out = paged_attention(q, kv[0], block_tables, sl, sl - T,
                          kv[1], page_size=PAGE, num_q_heads=H,
                          interpret=True)

    # oracle over the dequantized KV (gather_kv_dense dequantizes)
    k_d, v_d = gather_kv_dense(kv, block_tables, max(seq_lens))
    ref = dense_attention(q, k_d, v_d, (sl - T)[:, None], sl,
                          1.0 / np.sqrt(dh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # and the quantization error itself is bounded
    kd, sc = quantize_kv(jnp.asarray(k))
    np.testing.assert_allclose(
        np.asarray(kd, np.float32) * np.asarray(sc), k,
        atol=np.abs(k).max() / 127 * 1.01)

@pytest.mark.parametrize("quantized", [False, True])
def test_rmw_append_matches_scatter(quantized):
    """The decode RMW append kernel (DMA slab out, patch row, DMA back)
    must write exactly what the functional scatter writes."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        append_to_pages_at_layer, stack_new_kv)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops import (
        kv_append as ka)

    L, KH, P, page, d, B = 3, 2, 8, 16, 128, 4
    key = jax.random.key(0)
    if quantized:
        kv = (jax.random.randint(key, (L, 2, KH, P, page, d), -100, 100,
                                 jnp.int8),
              jax.random.uniform(key, (L, 2, KH, P, page, 1), jnp.float32))
    else:
        kv = (jax.random.normal(key, (L, 2, KH, P, page, d), jnp.bfloat16),)
    k_new = jax.random.normal(jax.random.key(1), (B, 1, KH, d), jnp.float32)
    v_new = jax.random.normal(jax.random.key(2), (B, 1, KH, d), jnp.float32)
    positions = jnp.asarray([[3], [15], [0], [7]])
    bt = jnp.asarray(np.arange(B * 2).reshape(B, 2) % P)

    ref = append_to_pages_at_layer(kv, k_new, v_new, jnp.asarray(1),
                                   positions, bt)
    news = stack_new_kv(kv, k_new, v_new)
    pid = jnp.take_along_axis(bt, positions // page, axis=1)
    slot = positions % page
    # values pools ride their NATIVE layout; the lane-1 scales leaf
    # rides its lane-packed (S/128, 128) bitcast view (flats)
    if quantized:
        sc = kv[1]
        S = P * page
        ops = (kv[0], sc.reshape(L, 2, KH, S // 128, 128))
        flats = (False, True)
    else:
        ops, flats = kv, (False,)
    out = ka._append_tokens_rmw(
        ops, news, jnp.asarray([1], jnp.int32), pid.astype(jnp.int32),
        slot.astype(jnp.int32), page_size=page, flats=flats,
        interpret=True)
    out = tuple(o.reshape(p.shape) for o, p in zip(out, kv))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32))


def test_sliding_window_paged_vs_dense():
    """Windowed paged attention must match the dense sliding-window
    oracle (Mistral-style: key j visible iff p - w < j <= p)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.attention_ref import (
        dense_attention)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention)

    B, KH, G, dh, page, w = 2, 2, 2, 32, 8, 12
    H = KH * G
    lens = jnp.asarray([29, 17])
    S = 32
    key = jax.random.key(3)
    k = jax.random.normal(key, (B, S, KH, dh), jnp.float32)
    v = jax.random.normal(jax.random.key(4), (B, S, KH, dh), jnp.float32)
    q = jax.random.normal(jax.random.key(5), (B, 1, H, dh), jnp.float32)
    positions = (lens - 1)[:, None]

    ref = dense_attention(q, k, v, positions, lens, 1.0 / np.sqrt(dh),
                          window=w)

    n_pages = S // page
    kv = jnp.zeros((1, 2, KH, B * n_pages + 1, page, dh), jnp.float32)
    bt = np.zeros((B, n_pages), np.int32)
    for b in range(B):
        for j in range(n_pages):
            pid = 1 + b * n_pages + j
            bt[b, j] = pid
            kv = kv.at[0, 0, :, pid].set(
                jnp.swapaxes(k[b, j * page:(j + 1) * page], 0, 1))
            kv = kv.at[0, 1, :, pid].set(
                jnp.swapaxes(v[b, j * page:(j + 1) * page], 0, 1))

    out = paged_attention(q, kv, jnp.asarray(bt), lens, lens - 1,
                          None, layer=jnp.asarray(0), page_size=page,
                          num_q_heads=H, window=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_score_export_matches_oracle():
    """`return_scores=True`: the kernel's own per-page score export
    (TPU-native form of the reference's rerank_scores tile export,
    `paged_flash_attention_kernel_fused.cu:53-55`) equals the masked
    max scaled QK logit per page, computed densely in numpy."""
    rng = np.random.default_rng(11)
    B, KH, G, dh, T = 2, 2, 2, 32, 3
    H = KH * G
    seq_lens = [19, PAGE * 3]
    kv, block_tables, k, _ = make_paged_state(rng, B, KH, dh, seq_lens)
    q_np = rng.normal(size=(B, T, H, dh)).astype(np.float32)
    q = jnp.asarray(q_np)
    sl = jnp.asarray(seq_lens, jnp.int32)
    qo = sl - T

    out, scores = paged_attention(
        q, kv[0], block_tables, sl, qo, page_size=PAGE, num_q_heads=H,
        return_scores=True, interpret=True)
    base = paged_attention(
        q, kv[0], block_tables, sl, qo, page_size=PAGE, num_q_heads=H,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-6)   # export must not perturb out

    scale = 1.0 / np.sqrt(dh)
    max_pages = block_tables.shape[1]
    want = np.full((B, max_pages), -1e30, np.float32)
    for b in range(B):
        L = seq_lens[b]
        for t in range(T):
            p_q = int(qo[b]) + t
            for h in range(H):
                logits = (q_np[b, t, h] @ k[b, :L].transpose(1, 0, 2)
                          [h // G].T) * scale        # [L]
                for j in range(L):
                    if j > p_q:
                        continue
                    pg = j // PAGE
                    want[b, pg] = max(want[b, pg], logits[j])
    got = np.asarray(scores)
    live = want > -1e29
    np.testing.assert_allclose(got[live], want[live], atol=2e-4,
                               rtol=2e-4)
    assert (got[~live] < -1e29).all()


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("KH,G", [(2, 1), (2, 3)])
def test_decode_kernel_matches_general(KH, G, int8):
    """paged_attention_decode (in-kernel page loop, manual DMA) must be
    numerically identical to the general kernel at T=1."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode)

    rng = np.random.default_rng(23)
    B, dh = 3, 128          # decode kernel requires lane-aligned dh
    H = KH * G
    seq_lens = [13, PAGE * 4, 1]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens,
                                              int8=int8)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    scales = kv[1] if int8 else None

    ref = paged_attention(q, kv[0], block_tables, sl, sl - 1, scales,
                          page_size=PAGE, num_q_heads=H, interpret=True)
    out = paged_attention_decode(q, kv[0], block_tables, sl, scales,
                                 page_size=PAGE, num_q_heads=H,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_decode_kernel_window_softcap_pooled():
    """Sliding window + logit softcap + pooled [L,...] layout with a
    traced layer index, vs the general kernel."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode)

    rng = np.random.default_rng(5)
    B, KH, G, dh, w = 2, 2, 2, 128, 12
    H = KH * G
    seq_lens = [29, 17]
    layer0, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens)
    # fake a 2-layer pool with the data in layer 1
    pool = jnp.stack([jnp.zeros_like(layer0[0]), layer0[0]])
    sl = jnp.asarray(seq_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)

    ref = paged_attention(q, pool, block_tables, sl, sl - 1, None,
                          layer=jnp.asarray(1), page_size=PAGE,
                          num_q_heads=H, window=w, softcap=30.0,
                          interpret=True)
    out = paged_attention_decode(q, pool, block_tables, sl, None,
                                 layer=jnp.asarray(1), page_size=PAGE,
                                 num_q_heads=H, window=w, softcap=30.0,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_decode_fastpath_through_backend(kv_dtype):
    """dh=128 engages paged_attention_decode inside the paged backend's
    decode step (incl. the real kv_append + scales-gather flow); logits
    must match the dense backend."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.backends import (
        DenseKVBackend,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.paged_backend import (
        PagedKVBackend,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        DecoderModel,
        init_params,
    )

    cfg = preset("llama-tiny")
    cfg.hidden_size, cfg.head_dim = 512, 128   # lane-aligned head_dim
    cfg.num_heads, cfg.num_kv_heads = 4, 2
    cfg.intermediate_size = 256
    cfg.dtype = "float32"
    cache = CacheConfig(page_size=PAGE, num_pages=32, max_pages_per_seq=4,
                        kv_dtype=kv_dtype)
    model = DecoderModel(cfg)
    params = init_params(cfg, jax.random.key(0))

    B, T = 2, 9
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))

    dense = DenseKVBackend(cfg, kv_dtype="float32")
    _, dkv = model.forward(params, tokens, positions,
                           dense.init_cache(B, 64), dense.attn_fn)

    paged = PagedKVBackend(cfg, cache, interpret=True)
    block_tables = jnp.arange(1, B * 4 + 1, dtype=jnp.int32).reshape(B, 4)
    sl = jnp.full((B,), T, jnp.int32)
    attn = paged.make_attn_fn(block_tables, sl, jnp.zeros((B,), jnp.int32))
    plogits, pkv = model.forward(params, tokens, positions,
                                 paged.init_cache(), attn)

    # two decode steps through the T=1 fast path
    tok = jnp.argmax(plogits[:, -1:], -1)
    tol = dict(atol=1e-4, rtol=1e-4) if kv_dtype == "float32" else \
        dict(atol=2e-2, rtol=2e-2)
    for step in range(2):
        pos = jnp.full((B, 1), T + step)
        dl2, dkv = model.forward(params, tok, pos, dkv, dense.attn_fn)
        attn2 = paged.make_attn_fn(block_tables, sl + step + 1, sl + step)
        pl2, pkv = model.forward(params, tok, pos, pkv, attn2)
        np.testing.assert_allclose(np.asarray(pl2), np.asarray(dl2),
                                   **tol)
        tok = jnp.argmax(pl2, -1)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("J", [1, 2, 4])
def test_decode_grouped_matches_general(int8, J):
    """paged_attention_decode_grouped (J block-table pages per grid
    program) must match the general kernel at T=1 for sub-128 dh."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode_grouped)

    rng = np.random.default_rng(31)
    B, KH, G, dh = 3, 2, 3, 32
    H = KH * G
    seq_lens = [13, PAGE * 4, 1]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens,
                                              int8=int8)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    scales = kv[1] if int8 else None

    ref = paged_attention(q, kv[0], block_tables, sl, sl - 1, scales,
                          page_size=PAGE, num_q_heads=H, interpret=True)
    out = paged_attention_decode_grouped(
        q, kv[0], block_tables, sl, scales, page_size=PAGE,
        num_q_heads=H, group_pages=J, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_decode_grouped_window_pooled():
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode_grouped)

    rng = np.random.default_rng(6)
    B, KH, G, dh, w = 2, 2, 2, 32, 12
    H = KH * G
    seq_lens = [29, 17]
    layer0, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens)
    pool = jnp.stack([jnp.zeros_like(layer0[0]), layer0[0]])
    sl = jnp.asarray(seq_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)

    ref = paged_attention(q, pool, block_tables, sl, sl - 1, None,
                          layer=jnp.asarray(1), page_size=PAGE,
                          num_q_heads=H, window=w, softcap=20.0,
                          interpret=True)
    out = paged_attention_decode_grouped(
        q, pool, block_tables, sl, None, layer=jnp.asarray(1),
        page_size=PAGE, num_q_heads=H, window=w, softcap=20.0,
        group_pages=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_decode_fastpath_longcontext_dispatch():
    """Quantized decode with a >8k-token block table must route to the
    grouped kernel (the manual-DMA kernel's scales gather is
    O(max_pages_per_seq) VMEM) and still match the dense oracle."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.paged_backend import (
        PagedKVBackend,
    )

    cfg = preset("llama-tiny")
    cfg.hidden_size, cfg.head_dim = 512, 128
    cfg.num_heads, cfg.num_kv_heads = 4, 2
    cfg.dtype = "float32"
    # 256 pages/seq x page 64 = 16k-token tables > the 8k threshold
    cache = CacheConfig(page_size=64, num_pages=8, max_pages_per_seq=256,
                        kv_dtype="int8")
    paged = PagedKVBackend(cfg, cache, interpret=True)
    kv = paged.init_cache()

    B, T = 1, 33
    rng = np.random.default_rng(9)
    k = jnp.asarray(rng.normal(size=(B, T, 2, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, 2, 128)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, 4, 128)), jnp.float32)

    bt = np.zeros((B, 256), np.int32)
    bt[0, :2] = [3, 5]
    bt = jnp.asarray(bt)
    pos = jnp.arange(T)[None, :]
    attn = paged.make_attn_fn(bt, jnp.asarray([T]), jnp.asarray([0]))
    _, kv = attn(jnp.zeros((B, T, 4, 128), jnp.float32), k, v, kv,
                 0, pos)

    attn2 = paged.make_attn_fn(bt, jnp.asarray([T + 1]), jnp.asarray([T]))
    k1 = jnp.asarray(rng.normal(size=(B, 1, 2, 128)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(B, 1, 2, 128)), jnp.float32)
    out, kv = attn2(q, k1, v1, kv, 0, jnp.asarray([[T]]))

    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        gather_kv_dense,
    )
    layer0 = tuple(x[0] for x in kv)
    k_d, v_d = gather_kv_dense(layer0, bt, T + 1)
    ref = dense_attention(q, k_d, v_d, jnp.asarray([[T]]),
                          jnp.asarray([T + 1]), 1.0 / np.sqrt(128))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("dh", [32, 64])
def test_decode_packed_matches_general(int8, dh):
    """paged_attention_decode_packed (manual DMA of the pool's packed
    (page*dh/128, 128) rows, parity-class blocks) must match the
    general kernel at T=1 for sub-128 dh."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        packable_decode,
        paged_attention_decode_packed,
    )

    rng = np.random.default_rng(47)
    B, KH, G = 3, 2, 3
    H = KH * G
    assert packable_decode(PAGE, dh)
    seq_lens = [13, PAGE * 4, 1]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens,
                                              int8=int8)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    scales = kv[1] if int8 else None

    ref = paged_attention(q, kv[0], block_tables, sl, sl - 1, scales,
                          page_size=PAGE, num_q_heads=H, interpret=True)
    out = paged_attention_decode_packed(
        q, kv[0], block_tables, sl, scales, page_size=PAGE,
        num_q_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_decode_packed_window_softcap_pooled():
    """Sliding window + softcap + pooled [L,...] layout through the
    packed decode kernel."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode_packed,
    )

    rng = np.random.default_rng(53)
    B, KH, G, dh, w = 2, 2, 2, 64, 12
    H = KH * G
    seq_lens = [29, 17]
    layer0, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens)
    pool = jnp.stack([jnp.zeros_like(layer0[0]), layer0[0]])
    sl = jnp.asarray(seq_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)

    ref = paged_attention(q, pool, block_tables, sl, sl - 1, None,
                          layer=jnp.asarray(1), page_size=PAGE,
                          num_q_heads=H, window=w, softcap=20.0,
                          interpret=True)
    out = paged_attention_decode_packed(
        q, pool, block_tables, sl, None, layer=jnp.asarray(1),
        page_size=PAGE, num_q_heads=H, window=w, softcap=20.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("KH,G", [(2, 1), (2, 3)])
def test_decode_batched_matches_general(int8, KH, G):
    """paged_attention_decode_batched (whole batch in ONE grid program,
    every page DMA in flight) must match the general kernel at T=1."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode_batched,
    )

    rng = np.random.default_rng(61)
    B, dh = 3, 128
    H = KH * G
    seq_lens = [13, PAGE * 4, 1]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens,
                                              int8=int8)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)
    sl = jnp.asarray(seq_lens, jnp.int32)
    scales = kv[1] if int8 else None

    ref = paged_attention(q, kv[0], block_tables, sl, sl - 1, scales,
                          page_size=PAGE, num_q_heads=H, interpret=True)
    out = paged_attention_decode_batched(
        q, kv[0], block_tables, sl, scales, page_size=PAGE,
        num_q_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_decode_batched_window_softcap_pooled():
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode_batched,
    )

    rng = np.random.default_rng(67)
    B, KH, G, dh, w = 2, 2, 2, 128, 12
    H = KH * G
    seq_lens = [29, 17]
    layer0, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens)
    pool = jnp.stack([jnp.zeros_like(layer0[0]), layer0[0]])
    sl = jnp.asarray(seq_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)

    ref = paged_attention(q, pool, block_tables, sl, sl - 1, None,
                          layer=jnp.asarray(1), page_size=PAGE,
                          num_q_heads=H, window=w, softcap=20.0,
                          interpret=True)
    out = paged_attention_decode_batched(
        q, pool, block_tables, sl, None, layer=jnp.asarray(1),
        page_size=PAGE, num_q_heads=H, window=w, softcap=20.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("KH,G", [(2, 1), (2, 3)])
def test_decode_append_matches_split(KH, G, int8):
    """Fused append+attend (T=1) ≡ kv_append followed by the decode
    kernel: same output, same pool bytes. Runs the REAL kernel
    interpreted (PBT_DA_INTERP_KERNEL) so the in-kernel RMW/patch logic
    is covered, not just the functional fallback."""
    import os

    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        append_to_pages_at_layer)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode, paged_attention_decode_append)

    rng = np.random.default_rng(11)
    B, dh = 3, 128
    H = KH * G
    seq_lens = [13, PAGE * 2, 1]          # pre-append lengths
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens,
                                              int8=int8)
    kv = tuple(x[None] if x.ndim == 5 else x for x in kv)  # re-pool L=1
    kv = tuple(jnp.concatenate([jnp.zeros_like(x), x]) for x in kv)
    layer = jnp.asarray(1, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.float32)
    sl_old = jnp.asarray(seq_lens, jnp.int32)

    os.environ["PBT_DA_INTERP_KERNEL"] = "1"
    try:
        out_f, kv_f = paged_attention_decode_append(
            q, kv, k_new, v_new, block_tables, sl_old + 1,
            sl_old[:, None], layer, page_size=PAGE, num_q_heads=H,
            interpret=True)
    finally:
        del os.environ["PBT_DA_INTERP_KERNEL"]

    kv_r = append_to_pages_at_layer(kv, k_new, v_new, layer,
                                    sl_old[:, None], block_tables)
    out_r = paged_attention_decode(
        q, kv_r[0], block_tables, sl_old + 1,
        kv_r[1] if int8 else None, layer, page_size=PAGE,
        num_q_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=2e-6, rtol=2e-6)
    # interpret mode skips aliasing: outputs carry only the written
    # slabs — compare the appended slots exactly
    for b, L in enumerate(seq_lens):
        pid = int(block_tables[b, L // PAGE])
        slot = L % PAGE
        np.testing.assert_array_equal(
            np.asarray(kv_f[0][1, :, :, pid, slot]),
            np.asarray(kv_r[0][1, :, :, pid, slot]))
        if int8:
            np.testing.assert_allclose(
                np.asarray(kv_f[1][1, :, :, pid, slot]),
                np.asarray(kv_r[1][1, :, :, pid, slot]))


def test_decode_append_functional_path_through_backend():
    """Default interpret dispatch (functional append + unfused kernel)
    through the fused wrapper, window + softcap + GQA."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        append_to_pages_at_layer)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode, paged_attention_decode_append)

    rng = np.random.default_rng(12)
    B, KH, G, dh = 2, 2, 2, 128
    H = KH * G
    seq_lens = [29, 17]
    kv, block_tables, k, v = make_paged_state(rng, B, KH, dh, seq_lens)
    kv = tuple(jnp.concatenate([jnp.zeros_like(x[None])[0:0]] + [x[None]])
               for x in kv)
    layer = jnp.asarray(0, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.float32)
    sl_old = jnp.asarray(seq_lens, jnp.int32)

    out_f, kv_f = paged_attention_decode_append(
        q, kv, k_new, v_new, block_tables, sl_old + 1, sl_old[:, None],
        layer, page_size=PAGE, num_q_heads=H, window=12, softcap=20.0,
        interpret=True)
    kv_r = append_to_pages_at_layer(kv, k_new, v_new, layer,
                                    sl_old[:, None], block_tables)
    out_r = paged_attention_decode(
        q, kv_r[0], block_tables, sl_old + 1, None, layer,
        page_size=PAGE, num_q_heads=H, window=12, softcap=20.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=2e-6, rtol=2e-6)
    np.testing.assert_array_equal(np.asarray(kv_f[0]),
                                  np.asarray(kv_r[0]))
