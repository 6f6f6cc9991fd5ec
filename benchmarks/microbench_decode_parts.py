"""Slope-timed breakdown of one decode step's components.

Times each piece inside a lax.scan (slope of two iteration counts, so
the tunnel's fixed ~28 ms dispatch cost cancels — see
microbench_matmul.py): per-layer KV append, per-layer paged attention,
the vocab sampler, and the full fused decode step for comparison.

Usage: python benchmarks/microbench_decode_parts.py \
          [--model tinyllama-1.1b] [--batch 8] [--kv-dtype bfloat16]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from benchmarks._timing import slope
except ImportError:            # run as benchmarks/<script>.py directly
    from _timing import slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=160)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--quant", default="none")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--num-layers", type=int, default=0,
                    help="override layer count (shallow model, fast compile)")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-step probe (heaviest compile)")
    args = ap.parse_args()

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        SamplingParams, sample)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.kv_append import (
        kv_append)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.common import (
        cdiv)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.platform import (
        default_interpret)

    interp = default_interpret()

    B, page = args.batch, args.page_size
    cfg = FrameworkConfig()
    cfg.model = preset(args.model)
    if args.num_layers:
        cfg.model.num_layers = args.num_layers
    if args.quant != "none":
        cfg.model.quant = args.quant
    total = args.seq + 70
    cfg.cache = CacheConfig(page_size=page,
                            num_pages=B * cdiv(total, page) + 8,
                            max_pages_per_seq=cdiv(total, page),
                            kv_dtype=args.kv_dtype)
    cfg.runtime.prefill_chunk = page
    eng = Engine(cfg, seed=0)
    mc = cfg.model
    L, KH, dh = mc.num_layers, mc.num_kv_heads, mc.head_dim
    H = mc.num_heads

    state = eng.prefill([[7] * args.seq] * B)
    kv0 = state.kv
    bt = jnp.asarray(state.block_tables)
    sl = jnp.asarray(state.seq_lens)
    key = jax.random.key(0)
    k_new = jax.random.normal(key, (B, 1, KH, dh), jnp.bfloat16)
    q_new = jax.random.normal(key, (B, 1, H, dh), jnp.bfloat16)

    print(f"model={mc.name} L={L} B={B} seq={args.seq} "
          f"kv={args.kv_dtype} quant={mc.quant}")

    # 1) KV append (decode DUS), per layer
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_append(kv, n):
        def body(i, c):
            kv, pert = c
            kn = k_new + pert
            kv = kv_append(kv, kn, kn, i % L, sl[:, None], bt,
                           page_size=page, interpret=interp)
            return (kv, pert * 0.999)

        return jax.lax.fori_loop(0, n, body, (kv, jnp.float32(1.0)))

    kv = kv0
    def append_n(n):
        nonlocal kv
        kv = run_append(kv, n)[0]
        jax.block_until_ready(kv)

    slope("kv_append decode DUS (per layer)", append_n, args.iters * L)

    # 2) paged attention, per layer
    @jax.jit
    def run_attn(kv, q, n):
        scales = kv[1] if len(kv) == 2 else None

        def body(i, c):
            q, acc = c
            o = paged_attention(q, kv[0], bt, sl, sl - 1, scales,
                                layer=i % L, page_size=page,
                                num_q_heads=H, interpret=interp)
            return (q + o * 1e-3, acc)

        return jax.lax.fori_loop(0, n, body, (q, jnp.float32(0.0)))

    def attn_n(n):
        jax.block_until_ready(run_attn(kv, q_new, n))

    slope("paged_attention decode (per layer)", attn_n, args.iters * L)

    # 3) sampler over vocab — pass the static mode like the engine does
    # (without it, sample() compiles the everything-on default incl. the
    # full-vocab sort, ~4x slower than any real serving configuration)
    sp = eng._default_sampling()
    samp = sp.as_arrays(B)
    mode = sp.mode()
    logits0 = jax.random.normal(key, (B, cfg.model.vocab_size), jnp.float32)

    @jax.jit
    def run_sample(logits, n):
        def body(i, c):
            logits, rng = c
            rng, sub = jax.random.split(rng)
            t = sample(logits, sub, mode=mode, **samp)
            return (logits + t[:, None] * 1e-9, rng)

        return jax.lax.fori_loop(0, n, body, (logits, jax.random.key(1)))

    def sample_n(n):
        jax.block_until_ready(run_sample(logits0, n))

    # compact mode summary: only the enabled flags (the full dataclass
    # repr truncates unreadably at column width — ADVICE round 3)
    import dataclasses as _dc

    flags = ",".join(k if v is True else f"{k}={v}"
                     for k, v in _dc.asdict(mode).items() if v)
    slope(f"sample ({flags or 'plain'})", sample_n, args.iters)

    # 4) full decode step for reference
    if args.skip_full:
        return
    model, backend = eng.model, eng.backend

    # 4a) forward with attention+append stubbed out (attn_fn returns q,
    # which has the attention output's shape): isolates the matmul/norm/
    # embed/lm-head/sampler chain. full - this = in-situ attention cost.
    def stub_attn(q, k, v, kvt, layer, positions):
        return q, kvt

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run_step_noattn(tok, kv2, n):
        def body(i, c):
            tok, kv2, sl2, rng = c
            logits, kv2 = model.forward(eng.params, tok[:, None],
                                        sl2[:, None], kv2, stub_attn)
            rng, sub = jax.random.split(rng)
            nxt = jnp.argmax(logits[:, 0, :cfg.model.vocab_size], -1)
            return (nxt, kv2, sl2 + 1, rng)

        return jax.lax.fori_loop(0, n, body,
                                 (tok, kv2, sl, jax.random.key(2)))

    kv_na = jax.tree_util.tree_map(jnp.copy, kv)
    tok_na = jnp.zeros((B,), jnp.int32)

    def step_noattn_n(n):
        nonlocal kv_na
        out = run_step_noattn(tok_na, kv_na, n)
        kv_na = out[1]
        jax.block_until_ready(kv_na)

    slope("decode step MINUS attention (greedy)", step_noattn_n,
          args.iters)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run_step(tok, kv, n):
        def body(i, c):
            tok, kv, sl2, rng = c
            attn = backend.make_attn_fn(bt, sl2 + 1, sl2)
            logits, kv = model.forward(eng.params, tok[:, None],
                                       sl2[:, None], kv, attn)
            rng, sub = jax.random.split(rng)
            # greedy, matching the MINUS-attention probe: full - noattn
            # = in-situ attention + append cost
            nxt = jnp.argmax(logits[:, 0, :cfg.model.vocab_size], -1)
            return (nxt, kv, sl2 + 1, rng)

        return jax.lax.fori_loop(0, n, body, (tok, kv, sl, jax.random.key(2)))

    kv_step = kv
    tok0 = jnp.zeros((B,), jnp.int32)

    def step_n(n):
        nonlocal kv_step
        out = run_step(tok0, kv_step, n)
        kv_step = out[1]
        jax.block_until_ready(kv_step)

    slope("FULL decode step (fwd+append+attn, greedy)", step_n,
          args.iters)


if __name__ == "__main__":
    main()
