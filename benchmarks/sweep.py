"""Benchmark sweep: decode tokens/s/chip + p50 TTFT across batch sizes.

BASELINE.json's metric of record is "INT8 decode tokens/sec/chip + p50
TTFT (paged KV, batch sweep)". Produces a JSON report; ``bench.py`` at
the repo root remains the driver's single-line entry point.

    python benchmarks/sweep.py --model gpt2-124m --batches 1 4 8 16
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2-124m")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--quant", default="none")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        SamplingParams)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.common import (
        cdiv)

    samp = SamplingParams(temperature=0.0, eos_token_id=-1)
    rng = np.random.default_rng(0)
    rows = []
    total = args.prompt_len + args.steps + 1
    page = args.page_size
    maxB = max(args.batches)

    cfg = FrameworkConfig()
    cfg.model = preset(args.model)
    cfg.model.quant = args.quant
    cfg.cache = CacheConfig(
        page_size=page, num_pages=maxB * cdiv(total, page) + 16,
        max_pages_per_seq=cdiv(total, page) + 2, kv_dtype=args.kv_dtype)
    cfg.runtime.prefill_chunk = 256
    eng = Engine(cfg, seed=0)

    for B in args.batches:
        prompts = rng.integers(0, cfg.model.vocab_size,
                               (B, args.prompt_len)).tolist()
        # TTFT: prefill + first token
        eng.prefill(prompts, sampling=samp)            # compile
        ttfts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st = eng.prefill(prompts, sampling=samp)
            ttfts.append(time.perf_counter() - t0)
            eng.free(st)
        # throughput: fused decode
        eng.generate_batch_fused(prompts, max_new_tokens=args.steps,
                                 sampling=samp)        # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            eng.generate_batch_fused(prompts, max_new_tokens=args.steps,
                                     sampling=samp)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rows.append({
            "batch": B,
            "tokens_per_s": round(B * args.steps / dt, 1),
            "ms_per_step": round(dt / args.steps * 1e3, 3),
            "ttft_p50_ms": round(sorted(ttfts)[len(ttfts) // 2] * 1e3, 1),
        })
        print(json.dumps(rows[-1]))

    report = {"model": args.model, "quant": args.quant,
              "kv_dtype": args.kv_dtype, "prompt_len": args.prompt_len,
              "steps": args.steps, "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
