"""Beam search (COW pages) + reranker tests (SURVEY.md §4 item 4)."""

import numpy as np
import pytest

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, RuntimeConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine, SamplingParams)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.beam import (
    BeamSearcher)
from pagedattention_based_transformer_decoder_inference_framework_tpu.reranker import (
    LogProbScorer, Reranker)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


@pytest.fixture(scope="module")
def engine():
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=256, max_pages_per_seq=8,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8),
    )
    cfg.model.dtype = "float32"
    return Engine(cfg, interpret=True)


def test_beam1_equals_greedy(engine):
    """Beam width 1 must reproduce greedy decoding exactly."""
    prompt = [3, 5, 7, 9]
    greedy = engine.generate(prompt, 6, GREEDY)
    beams = BeamSearcher(engine, beam_width=1).search(prompt, 6)
    assert beams[0].tokens == greedy


def test_beam_width_returns_distinct_scored_candidates(engine):
    prompt = [4, 8, 15]
    beams = BeamSearcher(engine, beam_width=3).search(prompt, 5)
    assert len(beams) == 3
    assert len({tuple(b.tokens) for b in beams}) == 3
    scores = [b.score for b in beams]
    assert scores == sorted(scores, reverse=True)
    # beam-0 cumulative logprob must beat or match greedy's
    greedy = engine.generate(prompt, 5, GREEDY)
    scorer = LogProbScorer(engine, length_normalize=False)
    g = scorer.score(prompt, greedy)
    assert beams[0].score >= g - 1e-3


def test_beam_pages_all_freed(engine):
    free_before = engine.allocator.num_free
    BeamSearcher(engine, beam_width=4).search([1, 2, 3], 6)
    assert engine.allocator.num_free == free_before


def test_beam_eos_finishes(engine):
    prompt = [6, 6, 6]
    ref = BeamSearcher(engine, beam_width=2).search(prompt, 5)
    eos = ref[0].tokens[1]
    beams = BeamSearcher(engine, beam_width=2).search(
        prompt, 5, eos_token_id=eos)
    for b in beams:
        assert eos not in b.tokens[:-1]   # eos only ever terminal


def test_logprob_scorer_prefers_model_continuation(engine):
    """The model's own greedy continuation must outscore a random one."""
    prompt = [2, 4, 6, 8]
    greedy = engine.generate(prompt, 4, GREEDY)
    rng = np.random.default_rng(0)
    random_cand = [int(t) for t in
                   rng.integers(0, engine.cfg.vocab_size, 4)]
    rr = Reranker(LogProbScorer(engine))
    scores = rr.rerank_scores(prompt, [greedy, random_cand])
    assert scores[0] > scores[1]
    assert rr.select_best(prompt, [random_cand, greedy]) == 1


def test_reranker_select_best_api():
    class Fixed:
        def score(self, ctx, cand):
            return float(len(cand))

    rr = Reranker(Fixed())
    assert rr.select_best([1], [[1], [1, 2, 3], [1, 2]]) == 1
