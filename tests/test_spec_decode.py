"""Speculative decoding (prompt-lookup drafting): greedy-exactness vs
the plain fused path, drafting unit tests, EOS/budget handling."""

import numpy as np
import jax.numpy as jnp

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig,
    FrameworkConfig,
    RuntimeConfig,
    preset,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine,
    SamplingParams,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.spec import (
    accept_counts,
    draft_ngram,
)

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def make_engine(**runtime_kw):
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=256, max_pages_per_seq=16,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=16, **runtime_kw),
    )
    cfg.model.dtype = "float32"
    return Engine(cfg, interpret=True)


# -- drafting unit tests ------------------------------------------------------

def test_draft_ngram_finds_most_recent_match():
    #      0  1  2  3  4  5  6  7  8
    buf = [[7, 8, 9, 1, 7, 8, 4, 7, 8]]
    # trailing bigram (7, 8) matches at j=0 and j=4; most recent earlier
    # occurrence is j=4 -> draft starts at 6: [4, 7, 8]
    d = draft_ngram(jnp.asarray(buf, jnp.int32), jnp.asarray([9]), k=3, n=2)
    assert d.tolist() == [[4, 7, 8]]


def test_draft_ngram_no_match_repeats_last():
    buf = [[1, 2, 3, 4, 5, 0, 0, 0]]
    d = draft_ngram(jnp.asarray(buf, jnp.int32), jnp.asarray([5]), k=2, n=2)
    assert d.tolist() == [[5, 5]]


def test_draft_ngram_excludes_trailing_self_match():
    # the trailing bigram must not match itself (j + n <= cur - 1)
    buf = [[3, 1, 2, 1, 2, 0]]
    # trailing (1,2) at j=3; earlier at j=1 -> draft from index 3: [1, 2]
    d = draft_ngram(jnp.asarray(buf, jnp.int32), jnp.asarray([5]), k=2, n=2)
    assert d.tolist() == [[1, 2]]


def test_accept_counts():
    d = jnp.asarray([[1, 2, 3], [1, 9, 3], [9, 9, 9]])
    t = jnp.asarray([[1, 2, 3], [1, 2, 3], [1, 2, 3]])
    assert accept_counts(d, t).tolist() == [3, 1, 0]


# -- end-to-end greedy exactness ---------------------------------------------

def test_spec_equals_fused_greedy():
    eng = make_engine()
    prompts = [
        [5, 9, 3, 14, 5, 9, 3, 14, 5, 9],    # self-repeating: drafts hit
        [1, 2, 3, 4, 5, 6, 7],               # no repeats: drafts miss
        list(range(20, 44)),                  # longer than one page
        [11],                                 # single token
    ]
    ref = eng.generate_batch_fused(prompts, 12, GREEDY)
    for k, n in ((4, 2), (3, 3), (1, 2)):
        out = eng.generate_batch_spec(prompts, 12, GREEDY, spec_k=k,
                                      ngram=n)
        assert out == ref, (k, n)


def test_spec_eos_truncation_matches_fused():
    eng = make_engine()
    prompts = [[5, 9, 3, 14], [2, 4, 6, 8]]
    ref = eng.generate_batch_fused(prompts, 12, GREEDY)
    # pick a token the greedy continuation actually emits mid-stream so
    # EOS truncation kicks in for at least one lane
    eos = ref[0][3]
    samp = SamplingParams(temperature=0.0, eos_token_id=eos)
    ref = eng.generate_batch_fused(prompts, 12, samp)
    out = eng.generate_batch_spec(prompts, 12, samp, spec_k=4)
    assert out == ref
    assert any(r[-1] == eos for r in ref)     # the EOS really fired


def test_spec_budget_exact():
    eng = make_engine()
    prompts = [[5, 9, 3, 14, 5, 9, 3, 14]]
    for max_new in (1, 2, 5):
        out = eng.generate_batch_spec(prompts, max_new, GREEDY, spec_k=4)
        assert len(out[0]) == max_new


def test_spec_runtime_config_default():
    eng = make_engine(spec_k=4, spec_ngram=2, temperature=0.0,
                      eos_token_id=-1)
    prompts = [[5, 9, 3, 14, 5, 9, 3, 14]]
    ref = eng.generate_batch_fused(prompts, 8, GREEDY)
    assert eng.generate_batch_spec(prompts, 8) == ref


def test_spec_pages_freed():
    eng = make_engine()
    free0 = eng.allocator.num_free
    eng.generate_batch_spec([[5, 9, 3, 14]], 8, GREEDY, spec_k=4)
    assert eng.allocator.num_free == free0


def test_server_core_routes_to_spec():
    """ServerCore (scheduler off) uses the spec path when spec_k > 0 and
    the request is greedy — output must equal the plain engine path."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.server.core import (
        ServerCore,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.server.schema import (
        BatchGenerateRequest,
    )

    eng = make_engine(spec_k=4, temperature=0.0, eos_token_id=-1,
                      enable_logging=False)
    core = ServerCore(eng.config, engine=eng, use_scheduler=False)
    req = BatchGenerateRequest(prompts=["abc abc abc", "xyz"],
                               max_new_tokens=8, temperature=0.0)
    out = core.generate_batch(req)
    ids = [core.tokenizer.encode(p) for p in req.prompts]
    ref = eng.generate_batch_fused(ids, 8, GREEDY)
    assert [r["tokens"] for r in out["results"]] == ref


def _flat(pool):
    L, _, KH, P, page, d = pool.shape
    return pool.reshape(L, 2, KH, (P * page * d) // 128, 128)


def test_rmw_multitoken_append_matches_scatter():
    """The T>1 RMW append kernel (speculative verify path on TPU) must
    equal the functional scatter, including slab- and page-crossing
    token spans (interpret mode). Values pools ride their NATIVE
    layout (ops/kv_append.py: reshaping them costs pool copies)."""
    import jax.numpy as jnp
    import numpy as np

    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        stack_new_kv,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.kv_append import (
        _append_tokens_dus,
        _append_tokens_rmw,
    )

    L, KH, P, page, dh = 2, 2, 6, 8, 128
    B, T = 3, 3
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.normal(size=(L, 2, KH, P, page, dh)
                                  ).astype(np.float32))
    k_new = jnp.asarray(rng.normal(size=(B, T, KH, dh)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(B, T, KH, dh)).astype(np.float32))
    news = stack_new_kv((pool,), k_new, v_new)
    pid = jnp.asarray([[1, 1, 1], [2, 2, 3], [4, 4, 4]], jnp.int32)
    slot = jnp.asarray([[5, 6, 7], [6, 7, 0], [0, 1, 2]], jnp.int32)
    layer_arr = jnp.asarray([1], jnp.int32)
    out_rmw = _append_tokens_rmw(
        (pool,), (news[0],), layer_arr, pid, slot,
        page_size=page, flats=(False,), interpret=True)[0]
    out_dus = _append_tokens_dus((pool,), (news[0],), jnp.asarray(1), pid,
                                 slot, page_size=page)[0]
    assert jnp.array_equal(out_rmw, out_dus)


def test_rmw_flat_scales_append_matches_scatter():
    """INT8 values (native layout) + lane-1 scales (flat bitcast view)
    both ride the RMW (T>1), equal to the functional scatter across
    slab and page crossings."""
    import jax.numpy as jnp
    import numpy as np

    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        stack_new_kv,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.kv_append import (
        _append_tokens_dus,
        _append_tokens_rmw,
    )

    L, KH, P, page, dh = 2, 2, 4, 32, 128
    B, T = 3, 2
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(-127, 127, (L, 2, KH, P, page, dh)),
                       jnp.int8)
    scales = jnp.asarray(rng.random((L, 2, KH, P, page, 1)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, T, KH, dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, T, KH, dh)), jnp.bfloat16)
    news = stack_new_kv((vals, scales), k_new, v_new)
    pid = jnp.asarray([[1, 1], [2, 3], [0, 0]], jnp.int32)
    slot = jnp.asarray([[30, 31], [31, 0], [7, 8]], jnp.int32)
    layer_arr = jnp.asarray([1], jnp.int32)

    v_rmw, s_rmw = _append_tokens_rmw(
        (vals, _flat(scales)), news, layer_arr, pid, slot,
        page_size=page, flats=(False, True), interpret=True)
    s_rmw = s_rmw.reshape(scales.shape)
    v_dus, s_dus = _append_tokens_dus(
        (vals, scales), news, jnp.asarray(1), pid, slot,
        page_size=page)
    assert jnp.array_equal(v_rmw, v_dus)
    assert jnp.array_equal(s_rmw, s_dus)


def test_rmw_batch_append_matches_scatter():
    """The single-program T=1 RMW (all sequences' slab DMAs in flight)
    must equal the scatter — INCLUDING sequences whose flat scale
    slabs overlap (adjacent pages share a slab; every copy is
    patch-merged, so duplicate write-backs are identical)."""
    import jax.numpy as jnp
    import numpy as np

    from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
        stack_new_kv,
    )
    from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.kv_append import (
        _append_tokens_dus,
        _append_tokens_rmw,
    )

    L, KH, P, page, dh = 2, 2, 8, 32, 128
    B = 4
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.integers(-127, 127, (L, 2, KH, P, page, dh)),
                       jnp.int8)
    scales = jnp.asarray(rng.random((L, 2, KH, P, page, 1)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.bfloat16)
    news = stack_new_kv((vals, scales), k_new, v_new)
    # scale slabs of pages 1/2 and 4/5 overlap (flat R = 2 rows)
    pid = jnp.asarray([[1], [2], [4], [5]], jnp.int32)
    slot = jnp.asarray([[31], [0], [13], [13]], jnp.int32)
    layer_arr = jnp.asarray([1], jnp.int32)

    v_rmw, s_rmw = _append_tokens_rmw(
        (vals, _flat(scales)), news, layer_arr, pid, slot,
        page_size=page, flats=(False, True), interpret=True)
    s_rmw = s_rmw.reshape(scales.shape)
    v_dus, s_dus = _append_tokens_dus(
        (vals, scales), news, jnp.asarray(1), pid, slot,
        page_size=page)
    assert jnp.array_equal(v_rmw, v_dus)
    assert jnp.array_equal(s_rmw, s_dus)


# -- scheduler spec bursts -----------------------------------------------------

def _sched_cfg(spec_k=0):
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=256, max_pages_per_seq=16,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=16, max_batch_size=4,
                              decode_burst=4, spec_k=spec_k, spec_ngram=2,
                              temperature=0.0, eos_token_id=-1),
    )
    cfg.model.dtype = "float32"
    return cfg


def _run_sched(spec_k, reqs):
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler import (
        RequestState,
        Scheduler,
    )

    eng = Engine(_sched_cfg(spec_k), interpret=True)
    sched = Scheduler(eng)
    handles = [sched.submit(p, n, s, seed=seed)
               for (p, n, s, seed) in reqs]
    sched.run_until_idle()
    assert all(h.state == RequestState.FINISHED for h in handles), (
        [h.error for h in handles])
    return [h.tokens for h in handles]


def test_scheduler_spec_burst_equals_plain():
    """The speculative scheduler path must be token-identical to the
    plain burst path — greedy lanes (draft acceptance) AND a seeded
    sampled lane (one request_key-seeded token per iteration) mixed in
    one batch."""
    sampled = SamplingParams(temperature=0.9, top_k=8, eos_token_id=-1)
    reqs = [
        ([5, 9, 3, 14, 5, 9, 3, 14, 5, 9], 12, GREEDY, 1),
        ([1, 2, 3, 4, 5, 6, 7], 9, GREEDY, 2),
        ([4, 4, 2, 4, 4, 2, 4, 4], 11, sampled, 7),
    ]
    plain = _run_sched(0, reqs)
    spec = _run_sched(3, reqs)
    assert spec == plain
    assert [len(t) for t in spec] == [12, 9, 11]


def test_stochastic_accept_preserves_distribution():
    """The accept/resample rule with a point-mass draft must leave each
    emitted token distributed EXACTLY as a plain draw from p: accept
    d with prob p(d), else resample from p with d removed/renormalized.
    Checked empirically on a fixed 6-token distribution: the marginal
    of the first emitted token over many keys matches p."""
    import jax

    from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.spec import (
        stochastic_accept)

    V, K = 6, 2
    logits = jnp.log(jnp.asarray([0.35, 0.25, 0.2, 0.1, 0.07, 0.03]))
    scaled = jnp.broadcast_to(logits, (1, K + 1, V))
    drafts = jnp.asarray([[2, 4]], jnp.int32)     # p(d0)=0.2: often rejected

    N = 4000
    counts = np.zeros(V)
    run = jax.jit(stochastic_accept)
    for i in range(N):
        k = jax.random.key(i)
        ku = jax.random.split(jax.random.fold_in(k, 1), K)[None]
        kr = jax.random.split(jax.random.fold_in(k, 2), K + 1)[None]
        a, fix = run(scaled, drafts, ku, kr)
        first = int(drafts[0, 0]) if int(a[0]) >= 1 else int(fix[0])
        counts[first] += 1
    p = np.exp(np.asarray(logits))
    emp = counts / N
    # 4000 draws: ~3 sigma on the largest cell is ~0.023
    np.testing.assert_allclose(emp, p, atol=0.03)


def test_scheduler_spec_stochastic_sampled_lanes():
    """With ``spec_stochastic`` on, sampled (temperature>0) requests run
    through spec bursts with draft acceptance: requests finish with the
    exact budget, remain per-seed deterministic, and greedy lanes stay
    bit-identical to the plain path."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler import (
        RequestState, Scheduler)

    sampled = SamplingParams(temperature=0.9, top_k=8, eos_token_id=-1)
    reqs = [
        ([5, 9, 3, 14, 5, 9, 3, 14, 5, 9], 12, GREEDY, 1),
        ([4, 4, 2, 4, 4, 2, 4, 4], 11, sampled, 7),
    ]

    def run():
        cfg = _sched_cfg(3)
        cfg.runtime.spec_stochastic = True
        eng = Engine(cfg, interpret=True)
        sched = Scheduler(eng)
        hs = [sched.submit(p, n, s, seed=seed) for (p, n, s, seed) in reqs]
        sched.run_until_idle()
        assert all(h.state == RequestState.FINISHED for h in hs), (
            [h.error for h in hs])
        return [h.tokens for h in hs]

    out1 = run()
    out2 = run()
    assert out1 == out2                       # per-seed deterministic
    assert [len(t) for t in out1] == [12, 11]
    plain = _run_sched(0, reqs[:1])
    assert out1[0] == plain[0]                # greedy lane unchanged


def test_scheduler_spec_eos_stops():
    probe = _run_sched(0, [([5, 9, 3, 14], 12, GREEDY, 1)])[0]
    eos = probe[4]
    samp = SamplingParams(temperature=0.0, eos_token_id=eos)
    plain = _run_sched(0, [([5, 9, 3, 14], 12, samp, 1)])
    spec = _run_sched(3, [([5, 9, 3, 14], 12, samp, 1)])
    assert spec == plain
    assert spec[0][-1] == eos and len(spec[0]) < 12


def test_scheduler_spec_more_requests_than_lanes():
    reqs = [([7 + i, 8, 7 + i, 8, 7 + i], 6, GREEDY, i) for i in range(6)]
    plain = _run_sched(0, reqs)
    spec = _run_sched(2, reqs)
    assert spec == plain


def test_scheduler_spec_fused_tick_fires_and_matches():
    """With spec_k > 0 the fused tick must handle the finishing-prefill
    + spec-burst chain itself (round 4 fell back to the 3-dispatch
    legacy path for any spec run), including a request joining a
    running lane mid-decode — outputs identical to the plain path."""
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler import (
        RequestState, Scheduler)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler.scheduler import (
        Scheduler as S)

    reqs = [
        ([5, 9, 3, 14, 5, 9, 3, 14, 5, 9], 12, GREEDY, 1),
        ([1, 2, 3, 4, 5, 6, 7], 9, GREEDY, 2),
    ]
    late = ([4, 4, 2, 4, 4, 2, 4, 4], 11, GREEDY, 7)
    plain_all = _run_sched(0, reqs + [late])

    eng = Engine(_sched_cfg(3), interpret=True)
    sched = Scheduler(eng)
    fused_ran = []
    orig = S._fused_tick

    def spy(self):
        out = orig(self)
        fused_ran.append(out is not None)
        return out

    S._fused_tick = spy
    try:
        handles = [sched.submit(p, n, s, seed=seed)
                   for (p, n, s, seed) in reqs]
        sched.step()
        sched.step()
        handles.append(sched.submit(*late[:3], seed=late[3]))
        sched.run_until_idle()
    finally:
        S._fused_tick = orig
    assert all(h.state == RequestState.FINISHED for h in handles), (
        [h.error for h in handles])
    assert any(fused_ran), "fused spec tick never fired"
    assert [h.tokens for h in handles] == plain_all
