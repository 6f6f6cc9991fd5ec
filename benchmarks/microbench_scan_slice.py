"""Does scanning over stacked [L, K, N] weights cost a slice copy?

Compares three ways of running L weight-streaming matmuls per step:
  scan-xs    — weights as lax.scan xs (the model's current layout)
  scan-idx   — stacked weights closed over, dynamic_index inside scan
  unrolled   — per-layer weight arrays, Python loop

Usage: python benchmarks/microbench_scan_slice.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def slope(name, run_n, iters=8, reps=3):
    lo = functools.partial(run_n, iters)
    hi = functools.partial(run_n, iters * 4)
    lo(), hi()
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); lo(); t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); hi(); t_hi = min(t_hi, time.perf_counter() - t0)
    per = (t_hi - t_lo) / (iters * 3)
    print(f"{name:30s} {per*1e6:10.1f} us/step")
    return per


def main():
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.int8_matmul import (
        w8_matmul)

    L, M, K, N = 4, 8, 4096, 14336
    x0 = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    wL = (jax.random.normal(jax.random.key(1), (L, K, N), jnp.float32) / 32)
    wqL = jnp.clip(jnp.round(wL * 127), -127, 127).astype(jnp.int8)
    wsL = jnp.full((L, 1, N), 1 / 127, jnp.float32)
    per_layer = [(wqL[i], wsL[i]) for i in range(L)]

    def mm(x, wq, ws):
        y = w8_matmul(x, wq, ws)
        return x + jnp.tanh(y[:, :K]).astype(x.dtype) * 1e-3

    @functools.partial(jax.jit, static_argnums=(1,))
    def scan_xs(x, n):
        def outer(x, _):
            def body(c, xs):
                return mm(c, xs[0], xs[1]), ()
            x, _ = jax.lax.scan(body, x, (wqL, wsL))
            return x, ()
        x, _ = jax.lax.scan(outer, x, None, length=n)
        return x

    @functools.partial(jax.jit, static_argnums=(1,))
    def scan_idx(x, n):
        def outer(x, _):
            def body(c, i):
                return mm(c, wqL[i], wsL[i]), ()
            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            return x, ()
        x, _ = jax.lax.scan(outer, x, None, length=n)
        return x

    @functools.partial(jax.jit, static_argnums=(1,))
    def unrolled(x, n):
        def outer(x, _):
            for wq, ws in per_layer:
                x = mm(x, wq, ws)
            return x, ()
        x, _ = jax.lax.scan(outer, x, None, length=n)
        return x

    def mm_xla(x, wq, ws):
        y = (jnp.dot(x, wq.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) * ws)
        return x + jnp.tanh(y[:, :K]).astype(x.dtype) * 1e-3

    @functools.partial(jax.jit, static_argnums=(1,))
    def unrolled_xla(x, n):
        def outer(x, _):
            for wq, ws in per_layer:
                x = mm_xla(x, wq, ws)
            return x, ()
        x, _ = jax.lax.scan(outer, x, None, length=n)
        return x

    print(f"L={L} x[{M},{K}] w[{K},{N}] int8  "
          f"{L*K*N/1e6:.0f}MB/step  SOL ~{L*K*N/819e9*1e6:.0f}us/step")
    for name, fn in (("scan-xs (model today)", scan_xs),
                     ("scan-idx", scan_idx),
                     ("unrolled", unrolled),
                     ("unrolled-xla-dot", unrolled_xla)):
        def run_n(n, fn=fn):
            jax.block_until_ready(fn(x0, n))
        slope(name, run_n)


if __name__ == "__main__":
    main()
