"""Slope-timed decode-chain comparison: per-op XLA dots vs the chained
weight-stream megakernel (ops/chain_linear.py), at model dims.

Times one layer's post-attention chain (o -> norm -> gate|up/fc1 ->
down/fc2 -> next qkv) three ways inside a lax.fori_loop (slope of two
trip counts cancels the tunnel's ~28 ms dispatch cost — see
microbench_matmul.py):

  per-op   — the ops/linear.py XLA-dot path (today's default)
  chain    — ONE pallas_call streaming the packed blocks (megakernel)
  packed   — packed_linear per op (the dropped-weights prefill path),
             at --prefill-rows rows

Reports us/layer and effective weight-stream GB/s for each.

Usage: python benchmarks/microbench_chain.py [--model llama3-8b]
           [--batch 4] [--quant int8-weight] [--bk 1024] [--bn 2048]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope(name, run_n, iters, bytes_per, reps=3):
    lo = functools.partial(run_n, iters)
    hi = functools.partial(run_n, iters * 4)
    lo(), hi()
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); lo(); t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); hi(); t_hi = min(t_hi, time.perf_counter() - t0)
    per = (t_hi - t_lo) / (iters * 3)
    gbps = bytes_per / per / 1e9
    print(f"{name:34s} {per*1e6:9.1f} us   {gbps:7.1f} GB/s")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama3-8b")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--quant", default="int8-weight",
                    choices=("none", "int8-weight", "int8"))
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--bn", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--prefill-rows", type=int, default=256)
    ap.add_argument("--skip-packed", action="store_true")
    args = ap.parse_args()

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.chained import (
        build_decode_chains)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        fuse_projections, init_params, init_params_quantized,
        quantize_params, unstack_layers)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.chain_linear import (
        OP_D, OP_G, OP_O, OP_T, OP_U, chain_decode, packed_linear)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.common import (
        activation_fn)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.linear import (
        linear)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.platform import (
        default_interpret)

    interp = default_interpret()
    cfg = preset(args.model)
    cfg.num_layers = 2                      # two layers: chain needs l+1
    cfg.quant = args.quant
    if args.quant != "none":
        params = quantize_params(init_params_quantized(
            cfg, jax.random.key(0)))
    else:
        params = init_params(cfg, jax.random.key(0))
    params = fuse_projections(unstack_layers(params))
    params = build_decode_chains(params, cfg, bk=args.bk, bn=args.bn)
    pc = params["chains"][0]
    lp, nxt = params["layers"][0], params["layers"][1]
    B, D = args.batch, cfg.hidden_size
    wbytes = pc.w.size * pc.w.dtype.itemsize
    print(f"model={cfg.name} B={B} quant={cfg.quant} "
          f"bk={pc.bk} bn={pc.bn} chain={wbytes/1e6:.1f} MB "
          f"({pc.w.shape[0]} blocks)")

    attn_in = jax.random.normal(jax.random.key(1), (B, pc.K0),
                                jnp.bfloat16)
    x0 = jax.random.normal(jax.random.key(2), (B, D), jnp.bfloat16)

    # --- per-op XLA path (mirrors models/model.py:_block post-attn) ---
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.common import (
        layernorm, rmsnorm)

    w8a8 = cfg.quant == "int8"
    swiglu = cfg.activation == "swiglu"

    def norm(x, scale, bias):
        if cfg.norm == "rmsnorm":
            return rmsnorm(x, scale, cfg.norm_eps)
        return layernorm(x, scale, bias, cfg.norm_eps)

    @jax.jit
    def perop_n(x, ain, n):
        def body(i, c):
            x, ain = c
            x = x + linear(ain, lp["wo"], lp.get("bo"), w8a8=w8a8)
            h2 = norm(x, lp["ln2_scale"], lp.get("ln2_bias"))
            if swiglu:
                gu = linear(h2, lp["w_gu"], w8a8=w8a8)
                g, u = jnp.split(gu, 2, axis=-1)
                mid = activation_fn("silu")(g.astype(jnp.float32)
                                            ).astype(u.dtype) * u
            else:
                mid = linear(h2, lp["w_up"], lp.get("b_up"),
                             act=cfg.activation, w8a8=w8a8)
            x = x + linear(mid, lp["w_down"], lp.get("b_down"),
                           w8a8=w8a8)
            h1 = norm(x, nxt["ln1_scale"], nxt.get("ln1_bias"))
            qkv = linear(h1, nxt["w_qkv"], nxt.get("b_qkv"), w8a8=w8a8)
            return (x * 0.999, ain + qkv[:, :pc.K0] * 1e-6)

        return jax.lax.fori_loop(0, n, body, (x, ain))

    def run_perop(n):
        jax.block_until_ready(perop_n(x0, attn_in, n))

    slope("per-op XLA dots", run_perop, args.iters, wbytes)

    # --- chained megakernel ---
    @functools.partial(jax.jit, static_argnames=())
    def chain_n(x, ain, n):
        def body(i, c):
            x, ain = c
            x2, tail = chain_decode(pc, ain, x, interpret=interp)
            return (x2 * 0.999, ain + tail[:, :pc.K0] * 1e-6)

        return jax.lax.fori_loop(0, n, body, (x, ain))

    def run_chain(n):
        jax.block_until_ready(chain_n(x0, attn_in, n))

    slope("chain megakernel", run_chain, args.iters, wbytes)

    if args.skip_packed:
        return
    # --- packed_linear at prefill rows (dropped-weights prefill) ---
    R = args.prefill_rows
    xp = jax.random.normal(jax.random.key(3), (R, D), jnp.bfloat16)
    I = cfg.intermediate_size
    mid0 = jax.random.normal(jax.random.key(4), (R, I), jnp.bfloat16)

    up_ops = (OP_G, OP_U) if swiglu else (OP_U,)
    w_up = lp["w_gu"] if swiglu else lp["w_up"]

    @jax.jit
    def packed_n(x, mid, n):
        def body(i, c):
            x, mid = c
            o = packed_linear(pc, (OP_O,), x, interpret=interp)
            gu = packed_linear(pc, up_ops, x, interpret=interp)
            d = packed_linear(pc, (OP_D,), mid, interpret=interp)
            t = packed_linear(pc, (OP_T,), x, interpret=interp)
            return (x + o * 1e-6 + d * 1e-6 + t[:, :D] * 1e-6,
                    mid + gu[:, :I] * 1e-6)

        return jax.lax.fori_loop(0, n, body, (x, mid))

    def run_packed(n):
        jax.block_until_ready(packed_n(xp, mid0, n))

    @jax.jit
    def xla_prefill_n(x, mid, n):
        def body(i, c):
            x, mid = c
            o = linear(x, lp["wo"], w8a8=w8a8)
            gu = linear(x, w_up, w8a8=w8a8)
            d = linear(mid, lp["w_down"], w8a8=w8a8)
            t = linear(x, nxt["w_qkv"], w8a8=w8a8)
            return (x + o * 1e-6 + d * 1e-6 + t[:, :D] * 1e-6,
                    mid + gu[:, :I] * 1e-6)

        return jax.lax.fori_loop(0, n, body, (x, mid))

    def run_xla_prefill(n):
        jax.block_until_ready(xla_prefill_n(xp, mid0, n))

    print(f"-- prefill rows={R} (compute-bound: GB/s is nominal) --")
    slope("prefill per-op XLA", run_xla_prefill, args.iters, wbytes)
    slope("prefill packed_linear", run_packed, args.iters, wbytes)


if __name__ == "__main__":
    main()
