"""Sampler semantics (SURVEY.md §4 item 4): greedy determinism, top-k,
top-p, EOS threshold — on vocab logits (unlike the reference, which
filtered attention weights; Appendix A)."""

import numpy as np

import jax
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
    SamplingParams,
    filter_logits,
    sample,
)


def _arrs(B, **kw):
    return SamplingParams(**kw).as_arrays(B)


def test_greedy_is_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 50)), jnp.float32)
    toks = sample(logits, jax.random.key(0), **_arrs(4, temperature=0.0))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(logits).argmax(-1))


def test_top_k_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, 100)) * 3, jnp.float32)
    top3 = set(np.asarray(logits)[0].argsort()[-3:])
    seen = set()
    for i in range(64):
        t = sample(logits, jax.random.key(i),
                   **_arrs(1, temperature=1.5, top_k=3))
        seen.add(int(t[0]))
    assert seen <= top3
    assert len(seen) > 1  # actually samples, not greedy


def test_top_p_keeps_argmax_and_bounds_mass():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(2, 64)), jnp.float32)
    filtered = filter_logits(logits, jnp.zeros(2, jnp.int32),
                             jnp.full(2, 0.5, jnp.float32))
    f = np.asarray(filtered)
    l = np.asarray(logits)
    for b in range(2):
        kept = np.isfinite(f[b])
        assert kept[l[b].argmax()]  # argmax always kept
        probs = np.exp(l[b] - l[b].max())
        probs /= probs.sum()
        # mass before the least-likely kept token is < 0.5
        order = np.argsort(-l[b])
        kept_sorted = kept[order]
        n_kept = kept_sorted.sum()
        assert kept_sorted[:n_kept].all()  # kept set is a prefix
        assert probs[order][:n_kept - 1].sum() < 0.5


def test_eos_threshold_forces_eos():
    logits = jnp.asarray([[0.0, 5.0, 0.0, 3.0]], jnp.float32)
    toks = sample(logits, jax.random.key(0),
                  **_arrs(1, temperature=1.0, eos_token_id=3,
                          eos_threshold=0.05))
    assert int(toks[0]) == 3


def test_sampling_params_batch_broadcast():
    a = SamplingParams(temperature=0.7, top_k=5).as_arrays(3)
    assert a["temperature"].shape == (3,)
    assert int(a["top_k"][0]) == 5


def test_capped_filter_matches_full_sort():
    """For top_k <= cap the capped candidate-set filter must produce the
    same logit mask as the full-vocab sort."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        _filter_logits_capped, filter_logits)

    key = jax.random.key(0)
    logits = jax.random.normal(key, (5, 997), jnp.float32) * 4
    for k, p in ((1, 1.0), (5, 0.9), (64, 0.5), (17, 0.999), (3, 0.01)):
        tk = jnp.full((5,), k, jnp.int32)
        tp = jnp.full((5,), p, jnp.float32)
        full = filter_logits(logits, tk, tp)
        capped = _filter_logits_capped(logits, tk, tp, 64)
        np.testing.assert_array_equal(np.isfinite(np.asarray(full)),
                                      np.isfinite(np.asarray(capped)))


def test_min_p_restricts_support():
    """min_p keeps exactly the tokens with p >= min_p * p_max (the cut
    is a pure logit threshold; temperature applies first)."""
    logits = jnp.asarray([[3.0, 2.9, 1.0, -2.0]], jnp.float32)
    sp = SamplingParams(temperature=1.0, min_p=0.5)
    probs = np.exp(np.asarray(logits)[0])
    probs /= probs.sum()
    allowed = set(np.where(probs >= 0.5 * probs.max())[0])
    seen = set()
    for i in range(64):
        t = sample(logits, jax.random.key(i), mode=sp.mode(),
                   **sp.as_arrays(1))
        seen.add(int(t[0]))
    assert seen <= allowed
    assert len(allowed) == 2  # the test is non-trivial


def test_repetition_penalty_flips_argmax():
    """A seen token with the (slightly) best logit loses to an unseen
    runner-up once the repetition penalty divides it down."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        token_counts)

    logits = jnp.asarray([[2.0, 1.9, 0.0, 0.0]], jnp.float32)
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.3)
    counts = token_counts(jnp.asarray([[0, 0, 3]]),
                          jnp.asarray([3]), 4)
    np.testing.assert_array_equal(np.asarray(counts)[0], [2, 0, 0, 1])
    t = sample(logits, None, mode=sp.mode(), counts=counts,
               **sp.as_arrays(1))
    assert int(t[0]) == 1  # token 0 penalized: 2.0/1.3 < 1.9
    # without the penalty the argmax stays 0
    sp0 = SamplingParams(temperature=0.0)
    t0 = sample(logits, None, mode=sp0.mode(), **sp0.as_arrays(1))
    assert int(t0[0]) == 0


def test_frequency_and_presence_penalties():
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        apply_penalties)

    logits = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    counts = jnp.asarray([[0, 1, 3]], jnp.int32)
    out = np.asarray(apply_penalties(
        logits, counts,
        rep_pen=jnp.ones((1,), jnp.float32),
        presence_pen=jnp.full((1,), 0.5, jnp.float32),
        freq_pen=jnp.full((1,), 0.1, jnp.float32)))[0]
    np.testing.assert_allclose(out, [1.0, 1.0 - 0.5 - 0.1,
                                     1.0 - 0.5 - 0.3], rtol=1e-6)


def test_hit_stop_matches_eos_or_stop_set():
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        STOP_SLOTS, hit_stop)

    tok = jnp.asarray([5, 7, 9], jnp.int32)
    eos = jnp.asarray([5, -1, -1], jnp.int32)
    stops = jnp.asarray([[-1] * STOP_SLOTS,
                         [7, 11, -1, -1],
                         [-1, -1, -1, -1]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(hit_stop(tok, eos, stops)), [True, True, False])


def test_penalized_sampling_restricted_to_unseen():
    """With a huge presence penalty, sampling avoids every seen token."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import (
        token_counts)

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    hist = jnp.asarray([[0, 1, 2, 3, 4, 5], [10, 11, 12, 13, 14, 15]],
                       jnp.int32)
    counts = token_counts(hist, jnp.asarray([6, 6]), 16)
    sp = SamplingParams(temperature=1.0, presence_penalty=100.0)
    for i in range(16):
        t = np.asarray(sample(logits, jax.random.key(i), mode=sp.mode(),
                              counts=counts, **sp.as_arrays(2)))
        assert t[0] >= 6 and t[1] < 10


def test_logit_bias_shifts_and_bans():
    """+bias forces a token (greedy), -1e9 effectively bans one; unused
    slots (-1) are ignored."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, 0.5],
                          [2.0, 1.0, 0.0, 0.5]], jnp.float32)
    sp = SamplingParams(temperature=0.0, logit_bias=((2, 5.0),))
    t = sample(logits, None, mode=sp.mode(), **sp.as_arrays(2))
    assert list(map(int, t)) == [2, 2]
    ban = SamplingParams(temperature=0.0, logit_bias=((0, -1e9),))
    t = sample(logits, None, mode=ban.mode(), **ban.as_arrays(2))
    assert list(map(int, t)) == [1, 1]
    # without mode flag the bias must not leak in
    off = SamplingParams(temperature=0.0)
    t = sample(logits, None, mode=off.mode(), **off.as_arrays(2))
    assert list(map(int, t)) == [0, 0]
