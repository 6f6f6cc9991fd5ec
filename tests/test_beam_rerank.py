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
    """Beam search runs on a PRIVATE allocator (it coexists with the
    scheduler); its pages all free by the end, and the engine's own
    allocator is never touched."""
    free_before = engine.allocator.num_free
    searcher = BeamSearcher(engine, beam_width=4)
    searcher.search([1, 2, 3], 6)
    assert searcher.allocator.num_live == 0
    assert engine.allocator.num_free == free_before


def test_beam_prefills_prompt_once(engine):
    """The prompt is prefilled once at batch 1, not beam_width times
    (VERDICT round 1 Weak #3)."""
    calls = []
    real = engine._prefill_fn

    def spy(params, tokens, *a, **k):
        calls.append(tokens.shape)
        return real(params, tokens, *a, **k)

    engine._prefill_fn = spy
    try:
        BeamSearcher(engine, beam_width=4).search([1, 2, 3, 4, 5], 5)
    finally:
        engine._prefill_fn = real
    assert calls, "prefill never ran"
    assert all(shape[0] == 1 for shape in calls), calls


def test_beam_coexists_with_running_scheduler(engine):
    """A beam search must not pause or perturb a concurrently-serving
    scheduler (ADVICE round 1: stream_chat_beam stopped the pump)."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler import (
        RequestState, Scheduler)

    solo = BeamSearcher(engine, beam_width=2).search([7, 3, 1], 5)
    sched = Scheduler(engine)
    sched.start(poll_interval_s=0.001)
    try:
        req = sched.submit([2, 2, 2], 24, GREEDY)
        beams = BeamSearcher(engine, beam_width=2).search([7, 3, 1], 5)
        toks = list(req.stream())
    finally:
        sched.stop()
    assert req.state == RequestState.FINISHED and len(toks) == 24
    assert [b.tokens for b in beams] == [b.tokens for b in solo]
    assert req.tokens == engine.generate([2, 2, 2], 24, GREEDY)


def test_beam_eos_finishes(engine):
    prompt = [6, 6, 6]
    ref = BeamSearcher(engine, beam_width=2).search(prompt, 5)
    eos = ref[0].tokens[1]
    beams = BeamSearcher(engine, beam_width=2).search(
        prompt, 5, eos_token_id=eos)
    for b in beams:
        assert eos not in b.tokens[:-1]   # eos only ever terminal


def test_beam_burst_matches_per_step(engine):
    """Device beam bursts (selection + COW + block-table rewire on
    device, host replay of the page arithmetic) must reproduce the
    per-step path: same hypotheses, same scores, across page-boundary
    crossings (page_size 8, 12 steps) and partial final bursts."""
    prompt = [2, 4, 6, 8, 10]
    per_step = BeamSearcher(engine, beam_width=3, burst=1).search(
        prompt, 12)
    for K in (4, 16):                     # 12 steps: 3 bursts / overshoot
        burst = BeamSearcher(engine, beam_width=3, burst=K).search(
            prompt, 12)
        assert [b.tokens for b in burst] == [b.tokens for b in per_step]
        np.testing.assert_allclose(
            [b.score for b in burst], [b.score for b in per_step],
            rtol=1e-5, atol=1e-5)


def test_beam_burst_eos_and_pages_freed(engine):
    """EOS inside a burst records the hypothesis at the right step and
    the replayed page bookkeeping leaks nothing (unused fresh pages
    return to the pool)."""
    prompt = [6, 6, 6]
    ref = BeamSearcher(engine, beam_width=2, burst=1).search(prompt, 6)
    eos = ref[0].tokens[1]
    searcher = BeamSearcher(engine, beam_width=2, burst=4)
    beams = searcher.search(prompt, 6, eos_token_id=eos)
    assert searcher.allocator.num_live == 0
    expect = BeamSearcher(engine, beam_width=2, burst=1).search(
        prompt, 6, eos_token_id=eos)
    assert [b.tokens for b in beams] == [b.tokens for b in expect]
    for b in beams:
        assert eos not in b.tokens[:-1]


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


def test_cross_encoder_scorer_wired_end_to_end(tmp_path):
    """The fine-tuned-BERT reranker path (reference
    ``reranker/reranker.cpp:16-17`` + ``finetune.py``) plugs into the
    id-based Reranker API: ids decode to text through the framework
    tokenizer and score through the HF classifier — fully offline
    (random-weight tiny BERT, no downloads)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertForSequenceClassification

    from pagedattention_based_transformer_decoder_inference_framework_tpu.reranker import (
        CrossEncoderScorer)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.tokenizer import (
        get_tokenizer)

    path = tmp_path / "tiny-cross-encoder"
    model = BertForSequenceClassification(BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64, num_labels=2))
    model.save_pretrained(path)

    class ByteHFTok:
        """Minimal HF-tokenizer-call shim: bytes of the text pair."""

        def __call__(self, a, b, **kw):
            ids = ([2] + [c % 64 for c in a.encode()[:20]]
                   + [3] + [c % 64 for c in b.encode()[:20]])
            return {"input_ids": torch.tensor([ids]),
                    "attention_mask": torch.ones((1, len(ids)),
                                                 dtype=torch.long)}

    scorer = CrossEncoderScorer(str(path), tokenizer=ByteHFTok(),
                                id_tokenizer=get_tokenizer("byte"))
    rr = Reranker(scorer)
    ctx = get_tokenizer("byte").encode("the quick brown fox")
    cands = [get_tokenizer("byte").encode(t)
             for t in ("jumps over", "sells seashells", "jumps over it")]
    scores = rr.rerank_scores(ctx, cands)
    assert len(scores) == 3 and all(0.0 <= s <= 1.0 for s in scores)
    assert rr.select_best(ctx, cands) == int(np.argmax(scores))
    # id-path equals text-path (the decode adapter is lossless here)
    direct = scorer.score_text("the quick brown fox", "jumps over")
    assert abs(scores[0] - direct) < 1e-6


def test_score_candidates_nll_matches_separate_scoring(engine):
    """Shared-context candidate scoring (context prefilled once, pages
    refcount-shared) must equal scoring each context+candidate sequence
    separately, and must leave no live pages behind."""
    ctx = [3, 5, 7, 9, 11, 2, 4, 6, 8, 1, 3]      # crosses a page (8)
    cands = [[7, 7], [1, 2, 3, 4, 5], [9]]
    free_before = engine.allocator.num_free

    got = engine.score_candidates_nll(ctx, cands, mean=False)
    want = np.array([
        engine.score_nll([ctx + c], starts=[len(ctx)], mean=False)[0]
        for c in cands])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    got_m = engine.score_candidates_nll(ctx, cands, mean=True)
    np.testing.assert_allclose(got_m, want / [len(c) for c in cands],
                               atol=1e-4, rtol=1e-4)
    assert engine.allocator.num_free == free_before


def test_logprob_scorer_batch_matches_single(engine):
    """score_batch == per-candidate score (both normalizations), with
    empty candidates pinned to -inf."""
    ctx = [2, 4, 6, 8, 10]
    cands = [[5, 3], [], [1, 1, 1]]
    for norm in (True, False):
        s = LogProbScorer(engine, length_normalize=norm)
        batch = s.score_batch(ctx, cands)
        assert batch[1] == float("-inf")
        for i in (0, 2):
            assert abs(batch[i] - s.score(ctx, cands[i])) < 1e-4


def test_beam_burst_near_page_capacity(engine):
    """ADVICE r4 (medium): a request sized near max_pages_per_seq must
    not overshoot — the burst is clamped to the step/page budget, so
    replay never pushes block tables past their width and no pages
    leak."""
    page = engine.cache.page_size
    mp = engine.cache.max_pages_per_seq          # 8 pages x 8 = 64 max
    prompt = list(range(1, 41))                  # 40 tokens
    steps = mp * page - len(prompt) - 1          # fill to capacity - 1
    searcher = BeamSearcher(engine, beam_width=2)
    beams = searcher.search(prompt, steps)
    assert len(beams[0].tokens) == steps
    assert searcher.allocator.num_live == 0


def test_beam_search_frees_pages_on_error(engine):
    """ADVICE r4 (medium): an exception mid-search must not leak the
    search's live pages — search() frees its state on any exit."""
    searcher = BeamSearcher(engine, beam_width=2)

    def boom(*a, **k):
        raise RuntimeError("injected")

    searcher._search_steps = boom
    with pytest.raises(RuntimeError, match="injected"):
        searcher.search([1, 2, 3], 6)
    assert searcher.allocator.num_live == 0
