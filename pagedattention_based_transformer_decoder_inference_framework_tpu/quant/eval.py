"""Quantization quality harness: FP-vs-INT8 perplexity delta.

The first-class check BASELINE.json mandates (<= 0.1 PPL delta INT8 vs
FP16) — the reference has no equivalent validation (its quantizer even
uses signed max instead of absmax, ``decoder/int8_decoder.cpp:54``,
silently breaking negative-dominant tensors).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.model import DecoderModel, Params, quantize_params


def sequence_nll(model: DecoderModel, params: Params,
                 tokens: Sequence[int]) -> float:
    """Mean negative log-likelihood of ``tokens[1:]`` given prefixes
    (teacher-forced full forward, dense attention oracle)."""
    from ..engine.backends import DenseKVBackend

    toks = jnp.asarray(tokens, jnp.int32)[None, :]
    T = toks.shape[1]
    positions = jnp.arange(T)[None, :]
    dense = DenseKVBackend(model.cfg, kv_dtype="float32")
    logits, _ = model.forward(params, toks, positions,
                              dense.init_cache(1, T), dense.attn_fn)
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[0, 1:, None], axis=-1).mean()
    return float(nll)


def perplexity(model: DecoderModel, params: Params,
               eval_seqs: Sequence[Sequence[int]]) -> float:
    nlls = [sequence_nll(model, params, s) for s in eval_seqs]
    return math.exp(float(np.mean(nlls)))


def paged_perplexity(cfg: ModelConfig, params: Params,
                     eval_seqs: Sequence[Sequence[int]],
                     batch: int = 4, page_size: int = 64) -> float:
    """Perplexity via the engine's paged teacher-forced scorer
    (:meth:`Engine.score_nll`) — O(chunk·V) logits and paged attention,
    so it scales to real checkpoints and long eval sets where the dense
    oracle above would materialize O(T²) attention and O(T·V) logits."""
    from ..config import CacheConfig, FrameworkConfig, RuntimeConfig
    from ..engine.engine import Engine
    from ..utils.common import cdiv

    max_len = max(len(s) for s in eval_seqs)
    pps = cdiv(max_len, page_size)
    fw = FrameworkConfig(
        model=cfg,
        cache=CacheConfig(page_size=page_size,
                          num_pages=pps * batch + 8,
                          max_pages_per_seq=pps,
                          kv_dtype="bfloat16"),
        runtime=RuntimeConfig())
    eng = Engine(fw, params=params)
    nlls: list = []
    counts: list = []
    for i in range(0, len(eval_seqs), batch):
        group = [list(s) for s in eval_seqs[i:i + batch]]
        nll = eng.score_nll(group)
        nlls.extend(float(x) for x in nll)
        counts.extend(len(s) - 1 for s in group)
    # token-weighted mean, matching corpus perplexity conventions
    total = sum(n * c for n, c in zip(nlls, counts))
    return math.exp(total / max(sum(counts), 1))


def ppl_delta_report(cfg: ModelConfig, params: Params,
                     eval_seqs: Sequence[Sequence[int]],
                     modes: Sequence[str] = ("int8", "int8-weight"),
                     backend: str = "dense",
                     ) -> Dict[str, float]:
    """Perplexity of the FP model and each quantized mode + deltas.

    ``backend='dense'`` uses the exact full-attention oracle (tiny
    models/tests); ``backend='paged'`` runs the scalable engine path."""
    import dataclasses

    def _ppl(mcfg: ModelConfig, p: Params) -> float:
        if backend == "paged":
            return paged_perplexity(mcfg, p, eval_seqs)
        return perplexity(DecoderModel(mcfg), p, eval_seqs)

    fcfg = dataclasses.replace(cfg, quant="none")
    report = {"fp": _ppl(fcfg, params)}
    qparams = quantize_params(params)
    for mode in modes:
        assert mode != "int4" or backend == "paged", (
            "int4 runs through the engine (paged backend): the dense "
            "oracle's scanned stacked layers have no nibble layout")
        qcfg = dataclasses.replace(cfg, quant=mode)
        # int4: the engine repacks the int8 QTensors group-wise at
        # build (double rounding is ~free against int4's step size)
        report[mode] = _ppl(qcfg, qparams)
        report[f"{mode}_delta"] = report[mode] - report["fp"]
    return report


def main() -> None:
    """CLI: PPL-delta on random or file-provided token sequences."""
    import argparse
    import json

    from ..config import preset
    from ..models.model import init_params

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2-tiny")
    ap.add_argument("--tokens-file", default=None,
                    help="JSONL with {'tokens': [...]} rows")
    ap.add_argument("--text-file", default=None,
                    help="plain text, tokenized with --tokenizer")
    ap.add_argument("--tokenizer", default="byte")
    ap.add_argument("--weights", default=None,
                    help="native .npz checkpoint (e.g. from hf_stream); "
                         "default = random init")
    ap.add_argument("--backend", default="dense",
                    choices=("dense", "paged"))
    ap.add_argument("--num-seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = preset(args.model)
    if args.backend == "dense":
        cfg.dtype = "float32"
    if args.weights:
        from ..models.checkpoint import load_params

        params = load_params(args.weights)
    else:
        params = init_params(cfg, jax.random.key(args.seed))
    if args.tokens_file:
        import json as _json

        seqs = [_json.loads(l)["tokens"] for l in open(args.tokens_file)]
    elif args.text_file:
        from ..utils.tokenizer import get_tokenizer

        tok = get_tokenizer(args.tokenizer)
        text = open(args.text_file).read()
        ids = tok.encode(text)
        L = args.seq_len
        seqs = [ids[i:i + L] for i in range(0, len(ids) - 1, L)]
        seqs = [s for s in seqs if len(s) >= 2][:args.num_seqs or None]
    else:
        rng = np.random.default_rng(args.seed)
        seqs = rng.integers(0, cfg.vocab_size,
                            (args.num_seqs, args.seq_len)).tolist()
    modes = ("int8", "int8-weight")
    if args.backend == "paged":
        modes = modes + ("int4",)
    print(json.dumps(ppl_delta_report(cfg, params, seqs, modes=modes,
                                      backend=args.backend), indent=2))


if __name__ == "__main__":
    main()
