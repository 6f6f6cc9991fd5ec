"""Weight-streaming microbench for the decode-dominant matmuls.

Decode at small batch is HBM-bandwidth bound on the weight stream: each
step reads every weight byte once. This harness scans N dependent
iterations of one matmul inside ONE jitted program (a data dependency
through tanh defeats loop-invariant hoisting; one dispatch defeats the
tunnel's per-dispatch penalty) and reports achieved GB/s per variant:

  w8      — Pallas weight-only INT8 (`ops/int8_matmul.w8_matmul`)
  w8a8    — Pallas s8 x s8 (`ops/int8_matmul.int8_matmul`)
  xla-bf16— plain jnp.dot on bf16 weights (2x the bytes, same roofline %)
  xla-w8  — jnp.dot(x, wq.astype(bf16)) (XLA's own widening)

Usage: python benchmarks/microbench_matmul.py [--m 8] [--iters 32]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_variant(name, fn, x0, wbytes, iters, reps=3):
    # The tunnel charges ~28 ms per dispatch: time two iteration counts
    # and report the SLOPE so the fixed cost cancels.
    def make(n):
        @functools.partial(jax.jit, static_argnums=(1,))
        def run(x, n):
            def body(c, _):
                y = fn(c)
                # fold output back in: data dependency defeats hoisting
                c = c + jnp.tanh(y[:, : c.shape[1]]).astype(c.dtype) * 1e-3
                return c, ()

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return lambda: run(x0, n).block_until_ready()

    lo, hi = make(iters), make(iters * 4)
    lo(), hi()                            # compile both
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); lo(); t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); hi(); t_hi = min(t_hi, time.perf_counter() - t0)
    per_iter = (t_hi - t_lo) / (iters * 3)
    gbps = wbytes / per_iter / 1e9
    print(f"{name:34s} {per_iter*1e6:9.1f} us/iter  {gbps:8.1f} GB/s")
    return gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=14336)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.int8_matmul import (
        int8_matmul, w8_matmul)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import (
        quantize_per_row)

    M, K, N = args.m, args.k, args.n
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (K, N), jnp.float32) / 32
    wq = jnp.clip(jnp.round(w * 127), -127, 127).astype(jnp.int8)
    ws = jnp.full((1, N), 1 / 127, jnp.float32)
    wb = w.astype(jnp.bfloat16)

    print(f"shapes: x[{M},{K}] w[{K},{N}]  weight bytes int8={K*N/1e6:.1f}MB")

    bench_variant("w8 (pallas widen-in-kernel)",
                  lambda c: w8_matmul(c, wq, ws), x, K * N, args.iters)

    def w8a8(c):
        q = quantize_per_row(c)
        return int8_matmul(q.values, q.scales, wq, ws)

    bench_variant("w8a8 (pallas s8xs8)", w8a8, x, K * N, args.iters)

    bench_variant("xla bf16 dot (2x bytes)",
                  lambda c: jnp.dot(c, wb, preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16),
                  x, K * N * 2, args.iters)

    bench_variant("xla w8 widen+dot",
                  lambda c: jnp.dot(c, wq.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16),
                  x, K * N, args.iters)

    def xla_w8a8(c):
        q = quantize_per_row(c)
        y = jnp.dot(q.values, wq, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * q.scales * ws).astype(jnp.bfloat16)

    bench_variant("xla s8xs8 dot", xla_w8a8, x, K * N, args.iters)

    bench_variant("w8 pallas bn2048 bk512",
                  lambda c: w8_matmul(c, wq, ws, bn=2048, bk=512),
                  x, K * N, args.iters)

    # ---- int4 weight candidates (half the bytes of int8) ----
    try:
        w4 = jnp.clip(jnp.round(w * 7), -7, 7).astype(jnp.int4)
        jax.block_until_ready(w4)

        bench_variant("xla w4(int4) widen+dot",
                      lambda c: jnp.dot(c, w4.astype(jnp.bfloat16),
                                        preferred_element_type=jnp.float32
                                        ).astype(jnp.bfloat16),
                      x, K * N // 2, args.iters)

        def xla_w4a8(c):
            q = quantize_per_row(c)
            y = jnp.dot(q.values, w4.astype(jnp.int8),
                        preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * q.scales * ws
                    ).astype(jnp.bfloat16)

        bench_variant("xla s8 x s4->s8 dot", xla_w4a8, x, K * N // 2,
                      args.iters)
    except Exception as e:
        print("int4 native unsupported:", repr(e)[:160])

    # packed nibbles in an int8 carrier [K, N//2], unpacked in XLA
    try:
        rng4 = np.random.default_rng(4)
        wpk = jnp.asarray(
            rng4.integers(-128, 128, (K, N // 2)), jnp.int8)

        def unpack_dot(c):
            lo4 = (wpk & 0xF) - 8                      # [K, N/2] int8
            hi4 = ((wpk >> 4) & 0xF) - 8
            wfull = jnp.stack([lo4, hi4], -1).reshape(
                K, N).astype(jnp.bfloat16)
            return jnp.dot(c, wfull,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        bench_variant("xla packed-s8 nibble unpack+dot", unpack_dot,
                      x, K * N // 2, args.iters)
    except Exception as e:
        print("packed nibble unsupported:", repr(e)[:160])

    bench_variant("w8 pallas bn2048 bk1024",
                  lambda c: w8_matmul(c, wq, ws, bn=2048, bk=1024),
                  x, K * N, args.iters)

    def w8a8_big(c):
        q = quantize_per_row(c)
        return int8_matmul(q.values, q.scales, wq, ws, bn=2048, bk=1024)

    bench_variant("w8a8 pallas bn2048 bk1024", w8a8_big, x, K * N, args.iters)


if __name__ == "__main__":
    main()
