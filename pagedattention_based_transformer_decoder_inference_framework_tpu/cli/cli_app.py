"""Unified CLI launcher.

The reference ships seven CLI tools behind a subprocess launcher
(``cli/cli_app.py:6-28``: generate/chat/stream/log/batch/rerank/
build_jsonl); here they are subcommands of one argparse program sharing
a single engine build (no per-tool process spawn), plus ``serve``.

    python -m ...cli.cli_app generate --model gpt2-tiny --prompt "hi"
    python -m ...cli.cli_app chat --model llama-tiny
    python -m ...cli.cli_app stream --prompt "once upon"
    python -m ...cli.cli_app log --session chat.jsonl
    python -m ...cli.cli_app batch --input prompts.txt --output out.jsonl
    python -m ...cli.cli_app rerank --context "..." --candidates a b c
    python -m ...cli.cli_app build_jsonl --prompts p.txt --out train.jsonl
    python -m ...cli.cli_app serve --port 8000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List, Optional

from ..config import FrameworkConfig, load_config, preset
from ..engine.sampling import SamplingParams
from ..utils.tokenizer import get_tokenizer


def add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None, help="YAML/JSON config path")
    p.add_argument("--model", default=None, help="model preset name")
    p.add_argument("--tokenizer", default=None,
                   help="'byte' or HF tokenizer path")
    p.add_argument("--max-new-tokens", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--min-p", type=float, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--presence-penalty", type=float, default=None)
    p.add_argument("--frequency-penalty", type=float, default=None)
    p.add_argument("--stop-token-ids", type=int, nargs="*", default=None,
                   help="token ids that end generation like EOS")
    p.add_argument("--seed", type=int, default=None)


def build_config(args) -> FrameworkConfig:
    import os

    cfg = load_config(args.config)
    if args.model and os.path.isdir(args.model):
        # an HF checkpoint directory: geometry from its config.json,
        # weights stream-imported by the engine factory
        from ..models.hf_stream import config_from_hf

        cfg.model = config_from_hf(args.model)
        if not cfg.weights_path:
            cfg.weights_path = args.model
        if args.tokenizer is None and cfg.tokenizer == "byte":
            cfg.tokenizer = args.model   # use the checkpoint's tokenizer
    elif args.model:
        cfg.model = preset(args.model)
    if args.tokenizer:
        cfg.tokenizer = args.tokenizer
    for key in ("max_new_tokens", "temperature", "top_k", "top_p",
                "min_p", "repetition_penalty", "presence_penalty",
                "frequency_penalty"):
        v = getattr(args, key, None)
        if v is not None:
            setattr(cfg.runtime, key, v)
    return cfg


def build_engine(cfg: FrameworkConfig):
    from ..engine.router import build_engine as _build

    return _build(cfg)


def sampling(cfg: FrameworkConfig, tok,
             stop_token_ids=None) -> SamplingParams:
    r = cfg.runtime
    return SamplingParams(temperature=r.temperature, top_k=r.top_k,
                          top_p=r.top_p, min_p=r.min_p,
                          repetition_penalty=r.repetition_penalty,
                          presence_penalty=r.presence_penalty,
                          frequency_penalty=r.frequency_penalty,
                          stop_token_ids=tuple(stop_token_ids or ()),
                          eos_token_id=tok.eos_token_id,
                          eos_threshold=r.eos_threshold)


# -- subcommands ------------------------------------------------------------

def cmd_generate(args) -> int:
    cfg = build_config(args)
    tok = get_tokenizer(cfg.tokenizer)
    eng = build_engine(cfg)
    out = eng.generate(tok.encode(args.prompt), cfg.runtime.max_new_tokens,
                       sampling(cfg, tok, args.stop_token_ids), seed=args.seed)
    print(tok.decode(out))
    return 0


def cmd_stream(args) -> int:
    cfg = build_config(args)
    tok = get_tokenizer(cfg.tokenizer)
    eng = build_engine(cfg)
    for t in eng.generate_stream(tok.encode(args.prompt),
                                 cfg.runtime.max_new_tokens,
                                 sampling(cfg, tok, args.stop_token_ids), seed=args.seed):
        sys.stdout.write(tok.decode_token(t))
        sys.stdout.flush()
        if cfg.runtime.stream_delay_ms:
            time.sleep(cfg.runtime.stream_delay_ms / 1000)
    print()
    return 0


def _chat_loop(args, log_path: Optional[str]) -> int:
    cfg = build_config(args)
    tok = get_tokenizer(cfg.tokenizer)
    eng = build_engine(cfg)
    messages: List[dict] = []
    log_f = open(log_path, "a") if log_path else None
    print("(interactive chat; empty line or Ctrl-D to exit)")
    while True:
        try:
            user = input("you> ").strip()
        except EOFError:
            break
        if not user:
            break
        messages.append({"role": "user", "content": user})
        prompt = cfg.chat.render(messages)
        out = eng.generate(tok.encode(prompt), cfg.runtime.max_new_tokens,
                           sampling(cfg, tok, args.stop_token_ids), seed=args.seed)
        reply = tok.decode(out)
        print(f"bot> {reply}")
        messages.append({"role": "assistant", "content": reply})
        if log_f:
            log_f.write(json.dumps(
                {"ts": time.time(), "user": user, "assistant": reply})
                + "\n")
            log_f.flush()
    if log_f:
        log_f.close()
    return 0


def cmd_chat(args) -> int:
    return _chat_loop(args, None)


def cmd_log(args) -> int:
    """Chat with JSONL session logging (reference ``cli/log_cli.py``)."""
    return _chat_loop(args, args.session)


def cmd_batch(args) -> int:
    cfg = build_config(args)
    tok = get_tokenizer(cfg.tokenizer)
    eng = build_engine(cfg)
    prompts = [l.rstrip("\n") for l in open(args.input) if l.strip()]
    ids = [tok.encode(p) for p in prompts]
    sp = sampling(cfg, tok, args.stop_token_ids)
    if (cfg.runtime.spec_k > 0 and sp.mode().greedy and eng.mesh is None
            and not (sp.has_penalties or sp.stop_token_ids
                     or sp.logit_bias)):
        # prompt-lookup speculative decoding (greedy-exact, engine/spec.py)
        outs = eng.generate_batch_spec(ids, cfg.runtime.max_new_tokens, sp)
    else:
        outs = eng.generate_batch(ids, cfg.runtime.max_new_tokens, sp,
                                  seed=args.seed)
    with open(args.output, "w") as f:
        for p, o in zip(prompts, outs):
            f.write(json.dumps({"prompt": p, "completion": tok.decode(o)},
                               ensure_ascii=False) + "\n")
    print(f"wrote {len(outs)} completions to {args.output}")
    return 0


def cmd_rerank(args) -> int:
    from ..reranker import LogProbScorer, Reranker

    cfg = build_config(args)
    tok = get_tokenizer(cfg.tokenizer)
    if args.scorer == "cross-encoder":
        from ..reranker import CrossEncoderScorer

        path = args.reranker_model or cfg.runtime.reranker_model
        if not path:
            print("--reranker-model (or runtime.reranker_model) required "
                  "for --scorer cross-encoder")
            return 2
        rr = Reranker(CrossEncoderScorer(path, id_tokenizer=tok))
    else:
        eng = build_engine(cfg)
        rr = Reranker(LogProbScorer(eng))
    ctx = tok.encode(args.context)
    cands = [tok.encode(c) for c in args.candidates]
    scores = rr.rerank_scores(ctx, cands)
    best = int(max(range(len(scores)), key=lambda i: scores[i]))
    for i, (c, s) in enumerate(zip(args.candidates, scores)):
        mark = "*" if i == best else " "
        print(f"{mark} [{s:9.4f}] {c}")
    return 0


def cmd_build_jsonl(args) -> int:
    """Beam -> labeled JSONL dataset; best-reranked beam = positive
    (reference ``cli/rerank_jsonl_builder.py:19-36``, with real scores)."""
    from ..engine.beam import BeamSearcher
    from ..reranker import LogProbScorer, Reranker
    from ..reranker.export_jsonl import export_jsonl

    cfg = build_config(args)
    tok = get_tokenizer(cfg.tokenizer)
    eng = build_engine(cfg)
    rr = Reranker(LogProbScorer(eng))
    rows = []
    for line in open(args.prompts):
        prompt = line.strip()
        if not prompt:
            continue
        ids = tok.encode(prompt)
        beams = BeamSearcher(eng, beam_width=args.beam_width).search(
            ids, cfg.runtime.max_new_tokens,
            eos_token_id=tok.eos_token_id)
        cands = [b.tokens for b in beams]
        best = rr.select_best(ids, cands)
        for i, c in enumerate(cands):
            rows.append({"context": prompt, "candidate": tok.decode(c),
                         "label": int(i == best)})
    n = export_jsonl(rows, args.out)
    print(f"wrote {n} rows to {args.out}")
    return 0


def cmd_serve(args) -> int:
    cfg = build_config(args)
    if args.port:
        cfg.server.port = args.port
    if args.host:
        cfg.server.host = args.host
    core = None
    if getattr(args, "coordinator", None):
        # multi-host serving (SURVEY §7-M5 / BASELINE config 5): every
        # process joins one jax.distributed runtime and builds the same
        # engine over the global mesh; host 0 runs the HTTP frontend and
        # pumps lockstep rounds on a thread (parallel/multihost.py),
        # non-primary processes pump rounds forever and never return.
        #   host0: ... serve --coordinator H:P --num-processes 2 \
        #              --process-id 0 --dp 2 --tp 8
        #   host1: same with --process-id 1
        from ..parallel import build_mesh
        from ..parallel.mesh import init_distributed
        from ..parallel.multihost import MultiHostPump, is_primary
        from ..server.core import ServerCore

        init_distributed(coordinator=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
        if args.dp:
            cfg.parallel.dp = args.dp
        if args.tp:
            cfg.parallel.tp = args.tp
        mesh = build_mesh(cfg.parallel)
        eng = build_engine(cfg, mesh=mesh)
        pump = MultiHostPump(eng)
        if not is_primary():
            pump.run_forever()          # exits on a broadcast stop round
            return 0
        core = ServerCore(cfg, engine=eng, pump=pump)
        pump.start()
    try:
        import uvicorn

        from ..server.app import create_app

        uvicorn.run(create_app(cfg, core=core), host=cfg.server.host,
                    port=cfg.server.port)
    except ImportError:
        from ..server.basic import BasicServer

        srv = BasicServer(cfg, core=core)
        print(f"serving (stdlib) on {cfg.server.host}:{srv.port}")
        srv.serve_forever()
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="pagedattention-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("generate", help="one-shot generation")
    add_common(p)
    p.add_argument("--prompt", required=True)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("stream", help="token-at-a-time streaming")
    add_common(p)
    p.add_argument("--prompt", required=True)
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("chat", help="interactive multi-turn chat")
    add_common(p)
    p.set_defaults(fn=cmd_chat)

    p = sub.add_parser("log", help="chat with JSONL session logging")
    add_common(p)
    p.add_argument("--session", default="chat_session.jsonl")
    p.set_defaults(fn=cmd_log)

    p = sub.add_parser("batch", help="file of prompts -> JSONL")
    add_common(p)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("rerank", help="score candidates for a context")
    add_common(p)
    p.add_argument("--context", required=True)
    p.add_argument("--candidates", nargs="+", required=True)
    p.add_argument("--scorer", default="logprob",
                   choices=("logprob", "cross-encoder"))
    p.add_argument("--reranker-model", default="",
                   help="fine-tuned cross-encoder path (finetune.py)")
    p.set_defaults(fn=cmd_rerank)

    p = sub.add_parser("build_jsonl",
                       help="beam search -> labeled reranker dataset")
    add_common(p)
    p.add_argument("--prompts", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--beam-width", type=int, default=4)
    p.set_defaults(fn=cmd_build_jsonl)

    p = sub.add_parser("serve", help="start the REST/SSE server")
    add_common(p)
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    # multi-host serving (jax.distributed): run on every host with the
    # same --coordinator; process 0 serves HTTP, the rest join the mesh
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = from config)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel mesh size (0 = from config)")
    p.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
