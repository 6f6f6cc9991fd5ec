"""Reranker: score candidate continuations against a context.

Same surface as the reference's ``Reranker::{rerank_scores, select_best}``
(``reranker/reranker.hpp:5-13``) — but with a *real* scorer. The
reference's ``RerankerModel::score`` is a hash-seeded uniform random
placeholder (``reranker/reranker_model.cpp:22-28``, SURVEY.md App. A);
here the default scorer is the decoder itself: the length-normalized
log-probability of the candidate tokens given the context, computed by
teacher-forced decode against the paged KV cache. A cross-encoder
(BERT-class, via ``finetune.py``) can be plugged in through the same
:class:`RerankScorer` interface.
"""

from __future__ import annotations

import math
from typing import List, Optional, Protocol, Sequence

import numpy as np


class RerankScorer(Protocol):
    def score(self, context_ids: Sequence[int],
              candidate_ids: Sequence[int]) -> float:
        ...


class LogProbScorer:
    """Scores candidates by decoder log-prob(candidate | context).

    Runs over a private KV pool + page allocator, so scoring can happen
    while a continuous-batching scheduler drives the same engine from
    another thread (no shared mutable host state)."""

    def __init__(self, engine, length_normalize: bool = True):
        from ..kvcache.native import make_allocator

        self.engine = engine
        self.length_normalize = length_normalize
        self._allocator = make_allocator(
            engine.cache.num_pages, native=engine.cache.native_allocator)

    def score(self, context_ids: Sequence[int],
              candidate_ids: Sequence[int]) -> float:
        return self.score_batch(context_ids, [candidate_ids])[0]

    def score_batch(self, context_ids: Sequence[int],
                    candidates: Sequence[Sequence[int]]) -> List[float]:
        """Score every candidate in ONE teacher-forced pass: the
        context prefills once, candidate rows share its pages by
        refcount, and one chunked program scores all candidates
        (``Engine.score_candidates_nll``) — instead of a per-token
        ``decode_forced`` loop per candidate (a dispatch + host read
        per generated token)."""
        out = [-math.inf] * len(candidates)
        live = [(i, list(c)) for i, c in enumerate(candidates) if c]
        if not live:
            return out
        nll = self.engine.score_candidates_nll(
            list(context_ids), [c for _, c in live],
            mean=self.length_normalize, allocators=[self._allocator])
        for (i, _), v in zip(live, nll):
            out[i] = -float(v)
        return out


class CrossEncoderScorer:
    """HF sequence-classification cross-encoder (e.g. the model produced
    by ``finetune.py``; reference ``reranker/reranker.cpp:16-17`` intent).
    Requires torch+transformers; local path only.

    ``id_tokenizer`` (the framework tokenizer that produced the token
    ids) makes the id-based :class:`RerankScorer` interface work
    end-to-end: ids are decoded to text and fed to the cross-encoder."""

    def __init__(self, model_path: str, tokenizer=None,
                 id_tokenizer=None):
        import torch
        from transformers import (AutoModelForSequenceClassification,
                                  AutoTokenizer)

        self._torch = torch
        self.tok = tokenizer or AutoTokenizer.from_pretrained(model_path)
        self.id_tokenizer = id_tokenizer
        self.model = AutoModelForSequenceClassification.from_pretrained(
            model_path)
        self.model.eval()

    def score(self, context_ids: Sequence[int],
              candidate_ids: Sequence[int]) -> float:
        if self.id_tokenizer is None:
            raise ValueError(
                "CrossEncoderScorer.score over token ids needs "
                "id_tokenizer=<framework tokenizer>; or call score_text")
        return self.score_text(
            self.id_tokenizer.decode(list(context_ids)),
            self.id_tokenizer.decode(list(candidate_ids)))

    def score_text(self, context: str, candidate: str) -> float:
        torch = self._torch
        with torch.no_grad():
            enc = self.tok(context, candidate, return_tensors="pt",
                           truncation=True, max_length=512)
            out = self.model(**enc).logits[0]
            if out.numel() == 1:
                return float(out)
            return float(torch.softmax(out, -1)[-1])   # P(positive)


class Reranker:
    """``rerank_scores`` + ``select_best`` over token-id candidates."""

    def __init__(self, scorer: RerankScorer):
        self.scorer = scorer

    def rerank_scores(self, context_ids: Sequence[int],
                      candidates: Sequence[Sequence[int]]) -> List[float]:
        if hasattr(self.scorer, "score_batch"):
            return self.scorer.score_batch(context_ids, candidates)
        return [self.scorer.score(context_ids, c) for c in candidates]

    def select_best(self, context_ids: Sequence[int],
                    candidates: Sequence[Sequence[int]]) -> int:
        scores = self.rerank_scores(context_ids, candidates)
        return int(np.argmax(scores))


def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    m = x.max()
    return x - m - math.log(np.exp(x - m).sum())
