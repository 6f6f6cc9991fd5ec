"""Sampler cost at large vocab: greedy / categorical / filter variants.

Slope-timed (fori_loop, one compile per variant). The full-sort
top-k/top-p filter is the serving-relevant worst case; the capped
variants bound the candidate set first.

Usage: python benchmarks/microbench_sampler.py [--batch 4] [--vocab 128256]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def slope(name, fn, logits, iters=64, reps=3):
    @jax.jit
    def run(logits, n):
        def body(i, c):
            logits, rng = c
            rng, sub = jax.random.split(rng)
            t = fn(logits, sub)
            return (logits + t[:, None].astype(jnp.float32) * 1e-9, rng)

        return jax.lax.fori_loop(0, n, body, (logits, jax.random.key(1)))

    lo = lambda: jax.block_until_ready(run(logits, iters))
    hi = lambda: jax.block_until_ready(run(logits, iters * 4))
    lo(), hi()
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); lo(); t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); hi(); t_hi = min(t_hi, time.perf_counter() - t0)
    per = (t_hi - t_lo) / (iters * 3)
    print(f"{name:40s} {per*1e6:10.1f} us")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=128256)
    args = ap.parse_args()

    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        SampleMode, sample)

    B, V = args.batch, args.vocab
    logits = jax.random.normal(jax.random.key(0), (B, V), jnp.float32) * 3
    samp = {
        "temperature": jnp.full((B,), 1.0),
        "top_k": jnp.full((B,), 5, jnp.int32),
        "top_p": jnp.full((B,), 0.9),
        "eos_token_id": jnp.full((B,), 2, jnp.int32),
        "eos_threshold": jnp.full((B,), 0.0),
    }
    print(f"B={B} V={V}")

    slope("greedy (argmax)",
          lambda l, r: sample(l, r, mode=SampleMode(False, False, False),
                              **{**samp, "temperature": jnp.zeros(B)}),
          logits)
    slope("categorical, no filter",
          lambda l, r: sample(l, r, mode=SampleMode(False, False, False),
                              **samp),
          logits)
    slope("filter: full sort (today)",
          lambda l, r: sample(l, r, mode=SampleMode(False, True, False),
                              **samp),
          logits)

    def capped(l, r, topk_fn, name):
        vals = topk_fn(l)
        k = jnp.clip(samp["top_k"], 1, vals.shape[-1])
        kth = jnp.take_along_axis(vals, (k - 1)[:, None], axis=-1)
        lse = jax.scipy.special.logsumexp(l, axis=-1, keepdims=True)
        probs = jnp.exp(vals - lse)
        cum_before = jnp.cumsum(probs, axis=-1) - probs
        cutoff = cum_before < samp["top_p"][:, None]
        min_kept = jnp.min(jnp.where(cutoff, vals, jnp.inf), axis=-1)
        keep = (l >= kth) & (l >= jnp.minimum(min_kept, kth[:, 0])[:, None])
        masked = jnp.where(keep, l, -jnp.inf)
        return jax.random.categorical(r, masked, axis=-1).astype(jnp.int32)

    slope("filter: lax.top_k cap 64",
          lambda l, r: capped(l, r, lambda x: jax.lax.top_k(x, 64)[0], "tk"),
          logits)
    slope("filter: approx_max_k cap 64",
          lambda l, r: capped(
              l, r, lambda x: jax.lax.approx_max_k(x, 64)[0], "amk"),
          logits)


if __name__ == "__main__":
    main()
