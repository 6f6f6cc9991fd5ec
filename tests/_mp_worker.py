"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Each process: join the distributed runtime, build the global dp=2 x tp=2
mesh over 2 hosts x 2 CPU devices, run host-0-fed batched generation
through the sharded engine, and (host 0) dump prefill logits + tokens.
"""

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--coord", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # load-dependent buffer race in the virtual CPU client (conftest.py)
    jax.config.update("jax_cpu_enable_async_dispatch", False)

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, ParallelConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        SamplingParams)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        init_params)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import (
        build_mesh)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel.mesh import (
        init_distributed)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel.multihost import (
        distribute_prompts, is_primary)

    init_distributed(coordinator=args.coord, num_processes=args.nproc,
                     process_id=args.pid)
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.device_count() == 2 * args.nproc, jax.device_count()
    assert len(jax.local_devices()) == 2

    cfg = FrameworkConfig()
    cfg.model = preset("llama-shard-tiny")
    cfg.model.dtype = "float32"
    cfg.cache = CacheConfig(page_size=8, num_pages=128,
                            max_pages_per_seq=16, kv_dtype="float32")
    cfg.parallel = ParallelConfig(dp=2, tp=2)
    cfg.runtime.prefill_chunk = 16
    mesh = build_mesh(cfg.parallel)

    params = init_params(cfg.model, jax.random.key(3))
    eng = Engine(cfg, params=params, mesh=mesh)

    # host-0 request feeding: only process 0 knows the real prompts
    raw = ([[1, 2, 3, 4, 5], [9, 8, 7], [11, 12, 13, 14], [20, 21]]
           if is_primary() else None)
    prompts, lens = distribute_prompts(raw, batch=4, max_len=8)
    assert [len(p) for p in prompts] == [5, 3, 4, 2]

    g = SamplingParams(temperature=0.0, eos_token_id=-1)
    state = eng.prefill(prompts, sampling=g)
    logits = state.prefill_logits            # to_host'd: full global batch
    eng.free(state)
    toks = eng.generate_batch_fused(prompts, max_new_tokens=6, sampling=g)

    if is_primary():
        with open(args.out, "w") as f:
            json.dump({"logits": logits.tolist(), "tokens": toks}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
