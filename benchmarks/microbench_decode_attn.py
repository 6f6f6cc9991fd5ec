"""Decompose decode paged-attention cost at small-model shapes.

GPT-2 B=8 measures 27 us/layer against a ~5 us DMA floor
(microbench_decode_parts.py). This probe separates:

* per-pallas_call fixed cost (B=1 vs B=8 at one program per sequence),
* per-grid-program cost (J=group size sweep),
* an XLA gather+dense alternative (no pallas call at all).

Slope-timed (see microbench_matmul.py) so the tunnel's fixed dispatch
cost cancels.

Usage: PYTHONPATH=. python benchmarks/microbench_decode_attn.py \
          [--model gpt2-124m] [--batch 8] [--seq 160]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

try:
    from benchmarks._timing import slope
except ImportError:            # run as benchmarks/<script>.py directly
    from _timing import slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2-124m")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=160)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
        paged_attention_decode_grouped)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.common import (
        cdiv)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.platform import (
        default_interpret)

    interp = default_interpret()
    B, page = args.batch, args.page_size
    cfg = FrameworkConfig()
    cfg.model = preset(args.model)
    total = args.seq + 70
    cfg.cache = CacheConfig(page_size=page,
                            num_pages=B * cdiv(total, page) + 8,
                            max_pages_per_seq=cdiv(total, page),
                            kv_dtype=args.kv_dtype)
    cfg.runtime.prefill_chunk = page
    eng = Engine(cfg, seed=0)
    mc = cfg.model
    KH, dh, H = mc.num_kv_heads, mc.head_dim, mc.num_heads

    state = eng.prefill([[7] * args.seq] * B)
    kv = state.kv
    pool, scales = kv[0], (kv[1] if len(kv) == 2 else None)
    bt = jnp.asarray(state.block_tables)
    sl = jnp.asarray(state.seq_lens)
    mp = bt.shape[1]
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, 1, H, dh), jnp.bfloat16)

    print(f"model={mc.name} B={B} seq={args.seq} mp={mp} page={page} "
          f"KH={KH} dh={dh}")
    page_bytes = 2 * KH * page * dh * pool.dtype.itemsize
    print(f"per-layer live KV ≈ {B * cdiv(args.seq, page) * page_bytes / 1e6:.2f} MB "
          f"(DMA floor ≈ {B * cdiv(args.seq, page) * page_bytes / 819e3:.1f} us)")

    def run_grouped(tag, gp, batch):
        qb, btb, slb = q[:batch], bt[:batch], sl[:batch]

        @jax.jit
        def run(qx, n):
            def body(i, c):
                qx, acc = c
                o = paged_attention_decode_grouped(
                    qx, pool, btb, slb, scales, layer=i % mc.num_layers,
                    page_size=page, num_q_heads=H, group_pages=gp,
                    interpret=interp)
                return (qx + o * 1e-3, acc)
            return jax.lax.fori_loop(0, n, body, (qx, jnp.float32(0.0)))

        def go(n):
            jax.block_until_ready(run(qb, n))
        slope(f"grouped J={gp} B={batch} ({tag})", go, args.iters)

    run_grouped("current: 1 program/seq", mp, B)
    run_grouped("1 program/page", 1, B)
    run_grouped("fixed-cost probe", mp, 1)

    # XLA gather + dense decode attention (no pallas). NB: this baseline
    # gathers and attends over all mp*page positions (clamped/padded
    # block-table entries included) in float32, while the pallas kernels
    # skip dead pages — when max_pages_per_seq exceeds the live length
    # the comparison is biased *against* XLA by that dead fraction.
    G = H // KH

    @jax.jit
    def run_xla(qx, n):
        def one(layer):
            kvl = pool[layer]                         # [2, KH, P, page, dh]
            g = kvl[:, :, bt]                         # [2, KH, B, mp, page, dh]
            if scales is not None:
                sc = scales[layer][:, :, bt]
                g = g.astype(jnp.float32) * sc
            g = g.astype(jnp.float32).transpose(2, 0, 1, 3, 4, 5).reshape(
                B, 2, KH, mp * page, dh)
            k, v = g[:, 0], g[:, 1]                   # [B, KH, S, dh]
            return k, v

        def body(i, c):
            qx, acc = c
            k, v = one(i % mc.num_layers)
            qr = qx.reshape(B, KH, G, dh).astype(jnp.float32)
            s = jnp.einsum("bhgd,bhsd->bhgs", qr, k) / (dh ** 0.5)
            pos = jnp.arange(mp * page)[None, None, None, :]
            s = jnp.where(pos < sl[:, None, None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhgs,bhsd->bhgd", p, v)
            o = o.reshape(B, 1, H, dh).astype(qx.dtype)
            return (qx + o * 1e-3, acc)
        return jax.lax.fori_loop(0, n, body, (qx, jnp.float32(0.0)))

    def go_xla(n):
        jax.block_until_ready(run_xla(q, n))
    slope("XLA gather+dense", go_xla, args.iters)


if __name__ == "__main__":
    main()
