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
