"""Worker for the 2-process multi-host SERVING test
(test_multiprocess.py::test_two_process_server_core).

Unlike ``_mp_worker.py`` (which drives the engine directly), this
worker exercises the real serving stack end-to-end: process 0 builds a
:class:`ServerCore` over the lockstep :class:`MultiHostPump`, submits
through the actual endpoint methods (``generate``, ``stream_generate``,
``generate_batch``) and streams tokens back, while process 1 only runs
``pump.run_forever()`` — participating in every fused round over the
global dp=2 x tp=2 mesh and exiting on the broadcast stop round.
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
    jax.config.update("jax_cpu_enable_async_dispatch", False)

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        CacheConfig, FrameworkConfig, ParallelConfig, preset)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import (
        Engine)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        init_params)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import (
        build_mesh)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel.mesh import (
        init_distributed)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel.multihost import (
        MultiHostPump, is_primary)

    init_distributed(coordinator=args.coord, num_processes=args.nproc,
                     process_id=args.pid)

    cfg = FrameworkConfig()
    cfg.model = preset("llama-shard-tiny")
    cfg.model.dtype = "float32"
    cfg.cache = CacheConfig(page_size=8, num_pages=128,
                            max_pages_per_seq=16, kv_dtype="float32")
    cfg.parallel = ParallelConfig(dp=2, tp=2)
    cfg.runtime.prefill_chunk = 16
    cfg.runtime.max_batch_size = 4
    cfg.runtime.temperature = 0.0        # greedy: deterministic outputs
    cfg.runtime.eos_token_id = -1
    mesh = build_mesh(cfg.parallel)

    params = init_params(cfg.model, jax.random.key(3))
    eng = Engine(cfg, params=params, mesh=mesh)
    pump = MultiHostPump(eng)

    if not is_primary():
        pump.run_forever()               # exits on the stop round
        jax.distributed.shutdown()
        return

    # process 0: the real server surface over the pump
    from pagedattention_based_transformer_decoder_inference_framework_tpu.server.core import (
        ServerCore)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.server.schema import (
        BatchGenerateRequest, GenerateRequest)

    core = ServerCore(cfg, engine=eng, pump=pump)
    pump.start()

    one = core.generate(GenerateRequest(prompt="hi", max_new_tokens=6,
                                        temperature=0.0))
    frames = list(core.stream_generate(
        GenerateRequest(prompt="abc", max_new_tokens=5, temperature=0.0),
        sse=False))
    batch = core.generate_batch(BatchGenerateRequest(
        prompts=["xy", "qrs"], max_new_tokens=4, temperature=0.0))

    pump.stop()                          # broadcasts the stop round
    with open(args.out, "w") as f:
        json.dump({"one": one["tokens"],
                   "frames": frames,
                   "batch": [r["tokens"] for r in batch["results"]],
                   "rounds": pump.n_rounds,
                   "finished": pump.n_finished}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
