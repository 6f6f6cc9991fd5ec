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


def ppl_delta_report(cfg: ModelConfig, params: Params,
                     eval_seqs: Sequence[Sequence[int]],
                     modes: Sequence[str] = ("int8", "int8-weight"),
                     ) -> Dict[str, float]:
    """Perplexity of the FP model and each quantized mode + deltas."""
    import dataclasses

    fp_model = DecoderModel(cfg)
    report = {"fp": perplexity(fp_model, params, eval_seqs)}
    qparams = quantize_params(params)
    for mode in modes:
        qcfg = dataclasses.replace(cfg, quant=mode)
        report[mode] = perplexity(DecoderModel(qcfg), qparams, eval_seqs)
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
    ap.add_argument("--num-seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = preset(args.model)
    cfg.dtype = "float32"
    params = init_params(cfg, jax.random.key(args.seed))
    if args.tokens_file:
        import json as _json

        seqs = [_json.loads(l)["tokens"] for l in open(args.tokens_file)]
    else:
        rng = np.random.default_rng(args.seed)
        seqs = rng.integers(0, cfg.vocab_size,
                            (args.num_seqs, args.seq_len)).tolist()
    print(json.dumps(ppl_delta_report(cfg, params, seqs), indent=2))


if __name__ == "__main__":
    main()
