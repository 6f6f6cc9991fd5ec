"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the *roofline*: decode is HBM-bandwidth-bound, so
speed-of-light tokens/s/chip = batch * HBM_BW / bytes-touched-per-step
(weights + live KV). BASELINE.json's north star asks for >= 0.90 of
roofline; this number is directly that fraction.

Usage: python bench.py [--model gpt2-124m] [--batch 8] [--steps 128]
"""

from __future__ import annotations

import argparse
import json
import time


HBM_GBPS = {
    # chip HBM bandwidth, bytes/s
    "v5e": 819e9,
    "v5litepod": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
    "v6e": 1640e9,
}


def detect_bw() -> float:
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    for k, bw in HBM_GBPS.items():
        if gen.startswith(k):
            return bw
    return 819e9


def tree_bytes(tree) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def run_multihost(args) -> None:
    """N-process lockstep decode bench through the serving
    :class:`MultiHostPump` (the deployment path of ``cli serve
    --coordinator``): host 0 submits ``--batch`` requests per rep and
    pumps rounds inline; every process executes the same fused program
    over the global mesh. Emits ONE JSON line from host 0 with
    tokens/s/chip and, when ``--ref-tok-per-chip`` is given, the
    scaling efficiency vs the 1-chip bench."""
    import os
    import sys

    import jax

    # virtual-device plumbing proof: JAX_PLATFORMS=cpu
    # JAX_NUM_CPU_DEVICES=N must be applied before the first backend
    # touch (the axon plugin's init order ignores the env var alone)
    n_cpu = os.environ.get("JAX_NUM_CPU_DEVICES")
    if n_cpu and os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(n_cpu))

    import numpy as np

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        SamplingParams)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import (
        build_mesh)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel.mesh import (
        init_distributed)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel.multihost import (
        MultiHostPump, is_primary)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.common import (
        cdiv)

    init_distributed(coordinator=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    n_chips = len(jax.devices())

    cfg = FrameworkConfig()
    cfg.model = preset(args.model)
    total_len = args.prompt_len + args.steps + 1
    page = args.page_size
    n_pages = args.batch * cdiv(total_len, page) + 64
    grain = max(1, 1024 // page)
    n_pages = cdiv(n_pages, grain) * grain
    # pages shard over dp: keep the global pool dp-divisible
    dp = max(args.dp, 1)
    n_pages = cdiv(n_pages, dp * grain) * dp * grain
    cfg.cache = CacheConfig(
        page_size=page, num_pages=n_pages,
        max_pages_per_seq=cdiv(total_len, page) + 2,
        kv_dtype=args.kv_dtype)
    cfg.runtime.prefill_chunk = 256
    cfg.model.quant = args.quant
    cfg.runtime.max_batch_size = args.batch
    cfg.parallel.dp = args.dp
    cfg.parallel.tp = args.tp
    mesh = build_mesh(cfg.parallel)
    eng = Engine(cfg, seed=0, mesh=mesh)
    pump = MultiHostPump(eng, batch=args.batch)

    if not is_primary():
        pump.run_forever()              # exits on the stop round
        return

    samp = SamplingParams(temperature=0.0, eos_token_id=-1)
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, cfg.model.vocab_size,
                           (args.batch, args.prompt_len)).tolist()

    def serve_round():
        base = pump.n_finished
        reqs = [pump.submit(p, args.steps, samp) for p in prompts]
        while pump.n_finished - base < len(reqs):
            pump.run_round()
        for r in reqs:
            toks = list(r.stream())
            assert r.error is None, r.error
            assert len(toks) == args.steps

    serve_round()                       # compile all shapes
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        serve_round()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    pump._stop.set()
    pump.run_round()                    # broadcast the stop round

    toks_per_s = args.batch * args.steps / dt
    per_chip = toks_per_s / max(n_chips, 1)
    rec = {
        "metric": (f"multi-host decode tokens/s/chip ({args.model}, "
                   f"dp={args.dp} tp={args.tp}, "
                   f"{args.num_processes} processes, {n_chips} chips)"),
        "value": round(per_chip, 1),
        "unit": "tokens/s/chip",
        "tokens_per_s_total": round(toks_per_s, 1),
        "vs_baseline": round(per_chip / args.ref_tok_per_chip, 4)
        if args.ref_tok_per_chip else 0.0,
    }
    print(json.dumps(rec))


def main() -> None:
    ap = argparse.ArgumentParser()
    # default = BASELINE.json's north-star config: INT8 Llama-3-8B
    # decode tokens/s/chip vs the HBM roofline
    ap.add_argument("--model", default="llama3-8b")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--kv-dtype", default="int8")
    # w8a8 ("int8") is the default headline config: the s8 x s8 -> s32
    # MXU path streams weights faster than the widen-to-bf16 path (786
    # vs 737 GB/s microbenched) and measured 345.6 tok/s (0.906 of
    # roofline) vs 340.6 (0.893) for int8-weight on the same run; PPL
    # delta is validated in BENCHMARKS.md (+0.03% relative).
    ap.add_argument("--quant", default="int8",
                    choices=("none", "int8", "int8-weight", "int4"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--page-size", type=int, default=64)
    # A/B the sub-128 head-dim pool padding (CacheConfig.pad_head_dim)
    ap.add_argument("--no-pad-head-dim", action="store_true")
    ap.add_argument("--no-fallback", action="store_true")
    # "fused": whole batch as one device program (static batch).
    # "scheduler": the continuous-batching serving path — requests go
    # through Scheduler.submit + decode bursts (BASELINE config 3).
    # "beam": beam search width=--batch with refcount-shared KV pages +
    # log-prob reranking of the hypotheses (BASELINE config 4).
    # "spec": prompt-lookup speculative decoding on a pattern-heavy
    # prompt — greedy-exact; vs_baseline may exceed 1.0 because the
    # roofline assumes one token per weight stream.
    # "longctx": decode-only probe at long context — prefill runs as
    # the chunked host loop ONCE (the whole-request fused program at
    # 32k unrolls to ~10 MB of MLIR and OOMs the remote compile
    # helper), then timed fused decode bursts attend over the full
    # cached context (SURVEY §5.7 scale-sequence-length mandate).
    ap.add_argument("--mode", default="fused",
                    choices=("fused", "scheduler", "beam", "spec",
                             "longctx"))
    ap.add_argument("--decode-burst", type=int, default=16)
    ap.add_argument("--beam-burst-max", type=int, default=0)
    ap.add_argument("--spec-k", type=int, default=8)
    # scheduler mode with speculative bursts (pattern-heavy prompts)
    ap.add_argument("--scheduler-spec", action="store_true")
    # decode megakernel (ops/chain_linear.py) with the per-op weight
    # copies dropped (one layout in HBM; prefill via packed_linear)
    ap.add_argument("--megakernel", action="store_true")
    # skip the profiler-traced rep (device-time ground truth field)
    ap.add_argument("--no-trace", action="store_true")
    # -- multi-host scaling harness (BASELINE.md: >=85% at 2 hosts) --
    # run the SAME decode bench across N jax.distributed processes via
    # the serving MultiHostPump and report tokens/s/chip + efficiency.
    # Every process runs the same command with its own --process-id:
    #   host0: python bench.py --coordinator H:P --num-processes 2 \
    #            --process-id 0 --dp 2 --tp 8 [--ref-tok-per-chip 354.5]
    #   host1: same with --process-id 1
    # Plumbing proven on virtual CPU devices (2 OS processes, dp=2,
    # numbers meaningless there): see BENCHMARKS.md round 5.
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--dp", type=int, default=0)
    ap.add_argument("--tp", type=int, default=0)
    # the 1-chip tokens/s to compute scaling efficiency against
    ap.add_argument("--ref-tok-per-chip", type=float, default=0.0)
    args = ap.parse_args()

    if args.coordinator:
        run_multihost(args)
        return

    if not args.no_fallback and args.model == "llama3-8b":
        # the tunnel's compile helper occasionally dies mid-compile on
        # 8B-scale programs; make sure ONE json line always prints by
        # falling back to the fast TinyLlama config on any failure
        import subprocess
        import sys

        def run_sub(argv, timeout):
            try:
                r = subprocess.run(argv, capture_output=True, text=True,
                                   timeout=timeout)
                return (next((l for l in r.stdout.splitlines()
                              if l.startswith("{")), None),
                        r.stderr[-2000:])
            except subprocess.TimeoutExpired:
                return None, "timeout"

        line, err = run_sub(
            [sys.executable, __file__, "--no-fallback",
             "--model", args.model, "--batch", str(args.batch),
             "--steps", str(args.steps),
             "--prompt-len", str(args.prompt_len),
             "--kv-dtype", args.kv_dtype, "--quant", args.quant,
             "--reps", str(args.reps), "--page-size",
             str(args.page_size), "--mode", args.mode,
             "--decode-burst", str(args.decode_burst),
             "--beam-burst-max", str(args.beam_burst_max),
             "--spec-k", str(args.spec_k)]
            + (["--scheduler-spec"] if args.scheduler_spec else [])
            + (["--no-trace"] if args.no_trace else [])
            + (["--megakernel"] if args.megakernel else []), 2700)
        if line:
            print(line)
            return
        print("8B bench failed, falling back to tinyllama-1.1b:", err,
              file=sys.stderr)
        line, err = run_sub(
            [sys.executable, __file__, "--no-fallback",
             "--model", "tinyllama-1.1b", "--batch", "8",
             "--steps", "128", "--kv-dtype", "bfloat16",
             "--quant", "none"], 1800)
        if line:
            print(line)
        else:
            print("fallback bench failed too:", err, file=sys.stderr)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        SamplingParams)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.common import (
        cdiv)

    cfg = FrameworkConfig()
    cfg.model = preset(args.model)
    total_len = args.prompt_len + args.steps + 1
    page = args.page_size
    # pool size rounded so num_pages * page_size is a multiple of 1024:
    # the INT8-scales decode append then rides the RMW kernel's
    # 8-sublane flat slabs (ops/kv_append.py) instead of per-token DUS
    n_pages = args.batch * cdiv(total_len, page) + 64
    grain = max(1, 1024 // page)
    n_pages = cdiv(n_pages, grain) * grain
    cfg.cache = CacheConfig(
        page_size=page,
        num_pages=n_pages,
        max_pages_per_seq=cdiv(total_len, page) + 2,
        kv_dtype=args.kv_dtype,
        pad_head_dim=False if args.no_pad_head_dim else None)
    cfg.runtime.prefill_chunk = 256
    cfg.model.quant = args.quant
    cfg.runtime.max_batch_size = args.batch
    cfg.runtime.decode_burst = args.decode_burst
    if args.beam_burst_max:
        cfg.runtime.beam_burst_max = args.beam_burst_max
    if args.megakernel:
        cfg.runtime.megakernel = True
        cfg.runtime.megakernel_drop_weights = True

    if args.mode == "spec":
        # spec verify appends up to spec_k extra positions per lane
        cfg.cache.max_pages_per_seq += cdiv(args.spec_k, page) + 1
        cfg.cache.num_pages += args.batch * (cdiv(args.spec_k, page) + 1)
    if args.mode == "beam":
        # device beam bursts pre-allocate up to beam_burst_max * W
        # fresh pages per dispatch (unused ones return to the pool)
        cfg.cache.num_pages += cfg.runtime.beam_burst_max * args.batch

    eng = Engine(cfg, seed=0)
    samp = SamplingParams(temperature=0.0, eos_token_id=-1)
    rng = np.random.default_rng(0)
    prompts = rng.integers(
        0, cfg.model.vocab_size, (args.batch, args.prompt_len)).tolist()

    ttft_p50 = None
    ttfts: list = []
    if args.mode == "beam":
        # BASELINE config 4: beam=W (the --batch flag) + reranker over
        # one prompt; W rows share the prompt's KV pages by refcount.
        # Throughput counts all W rows' tokens (each step scores W rows
        # in one batched fused dispatch, like batch-W decode).
        from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.beam import (
            BeamSearcher)
        from pagedattention_based_transformer_decoder_inference_framework_tpu.reranker import (
            LogProbScorer, Reranker)

        reranker = Reranker(LogProbScorer(eng))

        def beam_round():
            searcher = BeamSearcher(eng, beam_width=args.batch)
            hyps = searcher.search(prompts[0], args.steps)
            assert len(hyps) >= 1
            ranked = reranker.rerank_scores(
                prompts[0], [h.tokens for h in hyps])
            assert len(ranked) == len(hyps)

        run_once = beam_round
    elif args.mode == "scheduler":
        from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler import (
            RequestState, Scheduler)

        if args.scheduler_spec:
            cfg.runtime.spec_k = args.spec_k
            motif = rng.integers(0, cfg.model.vocab_size,
                                 (args.batch, 16)).tolist()
            prompts = [(m * cdiv(args.prompt_len, 16))[:args.prompt_len]
                       for m in motif]
        sched = Scheduler(eng)

        def serve_round():
            reqs = [sched.submit(p, args.steps, samp) for p in prompts]
            sched.run_until_idle()
            assert all(r.state == RequestState.FINISHED for r in reqs), (
                [r.error for r in reqs])
            assert all(len(r.tokens) == args.steps for r in reqs)
            return [r.ttft_s for r in reqs]

        def run_once():
            ttfts.extend(serve_round())

    elif args.mode == "longctx":
        state = eng.prefill(prompts)               # chunked host loop
        B = args.batch
        for b in range(B):
            eng._alloc_pages(state, b,
                             int(state.seq_lens[b]) + args.steps + 1)
        bt = jnp.asarray(eng._block_tables(state.pages))
        sl = jnp.asarray(state.seq_lens)
        toks0 = jnp.asarray(state.last_tokens)
        emitted = jnp.zeros((B,), jnp.int32)
        budgets = jnp.full((B,), args.steps, jnp.int32)
        seeds = jnp.zeros((B,), jnp.int32)
        samp_arr = samp.as_arrays(B)
        mode_ = samp.mode()
        dummy = jnp.zeros((B, 1), jnp.int32)
        if eng._decode_loop_fn is None:
            eng._decode_loop_fn = eng._build_decode_loop()

        def run_once():
            # same seq_lens every rep: the burst re-decodes the same
            # window (identical program + traffic), so reps measure
            # decode at a FIXED cached context length
            out, state.kv, _ = eng._decode_loop_fn(
                eng.params, toks0, state.kv, bt, sl, emitted, budgets,
                seeds, samp_arr, jnp.zeros((B, 1), jnp.int32),
                num_steps=args.steps, mode=mode_)
            jax.block_until_ready(out)

    elif args.mode == "spec":
        # pattern-heavy prompts (a tiled random n-gram motif): the
        # realistic regime for prompt-lookup drafting (extraction,
        # code, quoting). Greedy outputs are token-identical to the
        # fused path; the win is fewer weight streams per token.
        motif = rng.integers(0, cfg.model.vocab_size,
                             (args.batch, 16)).tolist()
        prompts = [(m * cdiv(args.prompt_len, 16))[:args.prompt_len]
                   for m in motif]
        def run_once():
            out = eng.generate_batch_spec(prompts, args.steps, samp,
                                          spec_k=args.spec_k)
            assert all(len(o) == args.steps for o in out)

    else:
        # the fused whole-batch program; warmup below uses the same step
        # count (num_steps is a static arg — a different warmup length
        # would leave the measured rep paying full compilation)
        def run_once():
            eng.generate_batch_fused(prompts, max_new_tokens=args.steps,
                                     sampling=samp)


    run_once()                                      # compile all shapes
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    if ttfts:
        ttft_p50 = float(np.percentile(ttfts, 50))

    # device-time ground truth: one extra rep under a profiler trace;
    # the union of device-op spans excludes host/tunnel dispatch gaps,
    # which drift ~20% intra-day through the remote-chip tunnel
    # (BENCHMARKS.md) — vs_baseline decisions should read this field
    dev_s = None
    if not args.no_trace:
        from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.profiling import (
            traced_device_s)

        dev_s = traced_device_s(run_once)

    total_tokens = args.batch * args.steps
    toks_per_s = total_tokens / dt

    # roofline: each decode step streams all weights once + live KV
    param_bytes = tree_bytes(eng.params)
    c = cfg.model
    kv_elt = 1 if args.kv_dtype == "int8" else 2
    kv_bytes = (2 * c.num_layers * c.num_kv_heads * c.head_dim *
                (args.prompt_len + args.steps // 2) * kv_elt * args.batch)
    roofline_steps_per_s = detect_bw() / (param_bytes + kv_bytes)
    roofline_toks_per_s = roofline_steps_per_s * args.batch
    frac = toks_per_s / roofline_toks_per_s

    rec = {
        "metric": f"decode tokens/sec/chip ({args.model}, "
                  f"{'w8a8 int8, ' if args.quant == 'int8' else ''}"
                  f"{'int8 weights, ' if args.quant == 'int8-weight' else ''}"
                  f"{'int4 weights, ' if args.quant == 'int4' else ''}"
                  f"paged KV {args.kv_dtype}, "
                  f"{'beam' if args.mode == 'beam' else 'batch'} "
                  f"{args.batch}"
                  f"{', continuous batching' if args.mode == 'scheduler' else ''}"
                  f"{' + reranker' if args.mode == 'beam' else ''}"
                  f"{f', speculative k={args.spec_k}' if args.mode == 'spec' else ''})",
        "value": round(toks_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(frac, 4),
        # wall-clock spread across reps (the tunnel's hour decides
        # where in this range the headline lands)
        "wall_tok_s_min": round(total_tokens / max(times), 1),
        "wall_tok_s_median": round(
            total_tokens / float(np.median(times)), 1),
    }
    if dev_s:
        rec["device_tokens_per_s"] = round(total_tokens / dev_s, 1)
        rec["device_vs_baseline"] = round(
            total_tokens / dev_s / roofline_toks_per_s, 4)
    if ttft_p50 is not None:
        rec["p50_ttft_ms"] = round(ttft_p50 * 1e3, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
