"""Inference engine: jitted chunked prefill + fused decode steps over the
paged KV cache, with streaming generation.

The TPU-native replacement of the reference's decoder engines
(``decoder/cuda_decoder.cu:47-61``, ``decoder/int8_decoder.cpp:106-119``)
— with the structural inefficiency removed: the reference re-embeds and
re-runs the *entire* sequence every generated token
(``cuda_decoder.cu:52-57``); here prefill runs once (in chunks) and each
decode step feeds exactly one token per sequence against the page pool,
with the KV state donated so XLA updates pages in place. Sampling is
fused into the decode step (one device dispatch per token).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FrameworkConfig
from ..models.model import (DecoderModel, Params, fuse_projections,
                            init_params, unstack_layers)
from ..parallel.specs import kv_pspec, pad_vocab, param_pspecs, shard_params
from ..utils.common import cdiv, to_host
from .paged_backend import PagedKVBackend
from .sampling import (SampleMode, SamplingParams, bump_counts, hit_stop,
                       request_key, sample, token_counts)


@dataclasses.dataclass
class EngineState:
    """Host+device state of a running batch of sequences."""

    kv: object                      # device page pool pytree
    block_tables: np.ndarray        # [B, max_pages] int32 (host mirror)
    seq_lens: np.ndarray            # [B] int32 — tokens written so far
    pages: List[List[int]]          # per-sequence page ids (host)
    rng: jax.Array
    last_tokens: np.ndarray         # [B] int32 — last sampled token
    finished: np.ndarray            # [B] bool
    # [B, V] int32 token histogram (prompt + generated) feeding the
    # repetition/presence/frequency penalties; a [B, 1] zeros dummy
    # when the sampling mode compiles without penalties (the decode
    # step signature stays fixed either way)
    counts: Optional[jax.Array] = None
    prefill_logits: Optional[np.ndarray] = None   # [B, V] (debug/tests)
    # allocators owning this state's page ids (one per data shard);
    # None = the engine's own. A private allocator list gives a state
    # (e.g. a beam-search session) its own page-id space over its own
    # pool arrays, so it can run concurrently with the scheduler
    # without sharing any mutable host bookkeeping.
    allocators: Optional[List] = None

    @property
    def batch(self) -> int:
        return len(self.pages)


class Engine:
    """Construct-from-config, load weights, generate — the same three
    verbs as the reference's pybind engine facade (``src/bindings.cpp``),
    but batched, paged, and jitted."""

    def __init__(self, config: FrameworkConfig, params: Optional[Params] = None,
                 interpret: Optional[bool] = None, seed: int = 0,
                 mesh: Optional[Mesh] = None):
        self.config = config
        self.cfg = config.model
        self.cache = config.cache
        self.runtime = config.runtime
        self.mesh = mesh
        pcfg = config.parallel
        tp_axis = pcfg.model_axis if mesh is not None else None
        # RoPE table sized to what the cache can actually hold — except
        # under sliding windows, where positions keep growing past the
        # page budget (rolling reclamation) and need the full table
        rope_len = (None if self.cfg.sliding_window > 0 else
                    config.cache.max_pages_per_seq
                    * config.cache.page_size)
        self.model = DecoderModel(self.cfg, tp_axis=tp_axis,
                                  rope_len=rope_len)
        self.backend = PagedKVBackend(self.cfg, self.cache, interpret=interpret)
        # pages are sharded over the data axis: one allocator per data
        # shard handing out *local* page ids into that shard's sub-pool
        self.dp = mesh.shape[pcfg.data_axis] if mesh is not None else 1
        # sequence-parallel prefill shards ('seq' axis; params and KV
        # pool replicate along it — see ParallelConfig.sp)
        self.sp = (dict(mesh.shape).get(pcfg.seq_axis, 1)
                   if mesh is not None else 1)
        assert self.cache.num_pages % self.dp == 0
        from ..kvcache.native import make_allocator

        self.allocators = [make_allocator(self.cache.num_pages // self.dp,
                                          native=self.cache.native_allocator)
                           for _ in range(self.dp)]
        self.allocator = self.allocators[0]   # dp=1 convenience alias
        if params is not None:
            self.params = params
        elif self.cfg.quant in ("int8", "int8-weight", "int4"):
            # layerwise quantized init: peak memory = one layer's f32
            # (int4 starts from the int8 init and repacks post-fusion)
            from ..models.model import init_params_quantized

            self.params = init_params_quantized(self.cfg,
                                                jax.random.key(seed))
        else:
            self.params = init_params(self.cfg, jax.random.key(seed))
        if self.cfg.quant in ("int8", "int8-weight", "int4"):
            from ..models.model import quantize_params

            self.params = quantize_params(self.params)  # no-op if already
        if self.cfg.quant == "int4":
            assert not self.runtime.scan_layers, (
                "int4 repacking needs unrolled layers")
            assert not self.runtime.megakernel, (
                "int4 has no chain-megakernel variant")

        if mesh is not None:
            # TP layout over the mesh: pad vocab so it divides tp,
            # shard params, and shard the KV pool by kv-head.
            tp = mesh.shape[pcfg.model_axis]
            assert self.cfg.num_kv_heads % tp == 0, (
                f"num_kv_heads={self.cfg.num_kv_heads} not divisible by "
                f"tp={tp}")
            if self.cfg.num_experts > 0:
                assert self.cfg.num_experts % tp == 0, (
                    f"num_experts={self.cfg.num_experts} not divisible "
                    f"by tp={tp} (experts shard over the model axis)")
            self.params = dict(self.params)
            self.padded_vocab = pad_vocab(self.params, self.cfg, tp)
            self.params = shard_params(self.params, mesh, pcfg)
            if not self.runtime.scan_layers:
                self.params = unstack_layers(self.params)
                if self.runtime.fuse_projections:
                    self.params = fuse_projections(self.params, tp=tp)
            if self.cfg.quant == "int4":
                # repack to nibble-packed int4 AFTER the Megatron split
                # is fixed: column-parallel weights pack with blocks
                # that never straddle a shard (col_shards=tp), row-
                # parallel scales tile the per-shard K (models/model.py
                # quantize_params_int4); re-sharding then pins the new
                # packed/scales leaves to their TP layout.
                from ..models.model import quantize_params_int4

                self.params = quantize_params_int4(self.params, tp=tp)
                self.params = shard_params(self.params, mesh, pcfg)
            self._param_specs = param_pspecs(self.params, pcfg)
            self._kv_specs = kv_pspec(
                jax.eval_shape(self.backend.pool.init), pcfg)
            self._data_axis = pcfg.data_axis
            kv_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), self._kv_specs)
            self._kv_shardings = kv_shardings
            self._init_cache = jax.jit(self.backend.pool.init,
                                       out_shardings=kv_shardings)
        else:
            self.padded_vocab = self.cfg.vocab_size
            self._kv_shardings = None
            self._init_cache = self.backend.init_cache
            if not self.runtime.scan_layers:
                self.params = unstack_layers(self.params)
                if self.runtime.fuse_projections:
                    self.params = fuse_projections(self.params)
            if self.cfg.quant == "int4":
                # repack matmul weights to nibble-packed int4 with
                # group-wise scales (idempotent on re-wrapped params)
                from ..models.model import quantize_params_int4

                self.params = quantize_params_int4(self.params)
            if self.runtime.megakernel:
                from ..models.chained import (build_decode_chains,
                                              chains_supported)

                if "chains" in self.params:
                    pass                    # re-wrapped, already packed
                elif chains_supported(self.cfg, self.params):
                    self.params = build_decode_chains(
                        self.params, self.cfg,
                        drop=self.runtime.megakernel_drop_weights)

        self._prefill_fn = self._build_prefill()
        self._decode_fn = self._build_decode()
        self._decode_loop_fn = self._build_decode_loop()
        self._generate_fused_fn = self._build_generate_fused()
        self._decode_logits_fn = None     # built lazily (test/debug path)
        self._prefill_sample_fn = None    # built lazily (fused sched tick)
        self._scatter_tokens_fn = None    # built lazily (fused sched tick)
        self._scatter_hist_fn = None      # built lazily (fused spec tick)
        self._decode_beam_fn = None       # built lazily (beam search)
        self._decode_beam_burst_fn = None  # built lazily (beam bursts)
        self._copy_pages_fn = None        # built lazily (beam COW)
        self._score_fn = None             # built lazily (eval path)
        self._generate_spec_fn = None     # built lazily (speculative path)
        self._decode_spec_loop_fn = None  # built lazily (scheduler spec)
        self._sample_fn = jax.jit(sample, static_argnames=("mode",))

    # spec helpers for shard_map-wrapped steps ------------------------------

    def _samp_specs(self):
        keys = ("temperature", "top_k", "top_p", "min_p",
                "eos_token_id", "eos_threshold", "stop_ids",
                "rep_pen", "presence_pen", "freq_pen",
                "bias_ids", "bias_vals")
        return {k: P(self._data_axis) for k in keys}

    def _shard_step(self, fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    # -- jitted device steps -------------------------------------------------

    def _build_prefill(self):
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def prefill_chunk(params, tokens, positions, kv, block_tables,
                          seq_lens, q_offsets, prompt_lens):
            """One prefill chunk. Returns per-seq logits at the final
            prompt token if it falls inside this chunk (else zeros)."""
            attn = backend.make_attn_fn(block_tables, seq_lens, q_offsets)
            logits, kv = model.forward(params, tokens, positions, kv, attn)
            logits = logits[..., :V]     # drop TP vocab padding
            # gather logits at (prompt_len - 1 - chunk_offset) when inside
            idx = prompt_lens - 1 - q_offsets
            T = tokens.shape[1]
            inside = (idx >= 0) & (idx < T)
            safe = jnp.clip(idx, 0, T - 1)
            last = jnp.take_along_axis(
                logits, safe[:, None, None], axis=1)[:, 0]
            return jnp.where(inside[:, None], last, 0.0), kv

        if self.mesh is None:
            return functools.partial(jax.jit, donate_argnums=(3,))(
                prefill_chunk)

        d = self._data_axis
        if self.sp > 1:
            s = self.config.parallel.seq_axis

            def prefill_chunk_sp(params, tokens, positions, kv,
                                 block_tables, seq_lens, q_offsets,
                                 prompt_lens):
                """Sequence-parallel chunk (SURVEY.md §5.7 blockwise
                prefill): this body sees the LOCAL ``[B, C/sp]`` slice
                of the chunk's tokens/positions; per-layer K/V are
                all-gathered over 'seq' inside the attn fn so every
                shard appends the full chunk, while embeddings, q/k/v/
                o/MLP matmuls and attention each cover 1/sp of the
                positions."""
                sidx = jax.lax.axis_index(s)
                Csub = tokens.shape[1]
                q0 = q_offsets + sidx * Csub
                attn = backend.make_attn_fn(block_tables, seq_lens, q0,
                                            gather_axis=s)
                logits, kv = model.forward(params, tokens, positions,
                                           kv, attn)
                logits = logits[..., :V]
                idx = prompt_lens - 1 - q0
                inside = (idx >= 0) & (idx < Csub)
                safe = jnp.clip(idx, 0, Csub - 1)
                last = jnp.take_along_axis(
                    logits, safe[:, None, None], axis=1)[:, 0]
                # the final prompt token lives on exactly one (chunk,
                # shard); psum replicates its logits along 'seq'
                return jax.lax.psum(
                    jnp.where(inside[:, None], last, 0.0), s), kv

            sharded = self._shard_step(
                prefill_chunk_sp,
                in_specs=(self._param_specs, P(d, s), P(d, s),
                          self._kv_specs, P(d), P(d), P(d), P(d)),
                out_specs=(P(d), self._kv_specs))
            return functools.partial(jax.jit, donate_argnums=(3,))(sharded)

        sharded = self._shard_step(
            prefill_chunk,
            in_specs=(self._param_specs, P(d), P(d), self._kv_specs,
                      P(d), P(d), P(d), P(d)),
            out_specs=(P(d), self._kv_specs))
        return functools.partial(jax.jit, donate_argnums=(3,))(sharded)

    def _build_prefill_sample(self):
        """Prefill chunk + first-token sampling in ONE device program —
        the scheduler's *fused tick* (BASELINE config 3 path).

        The legacy flow pays a separate sampling dispatch after the
        last prefill chunk, and through a remote chip every dispatch
        that follows a device->host transfer costs ~28 ms
        (BENCHMARKS.md). Folding the sample into the chunk program —
        and chaining the decode burst on its *device* outputs with no
        intervening host sync — collapses a scheduler tick to one taxed
        dispatch. Rows sample only where ``sample_mask`` is set AND the
        last prompt token falls inside this chunk; others return -1.
        Per-request determinism: row ``i`` draws with
        ``request_key(seeds[i], 0)``, exactly like the legacy batched
        finish-sampler. Single-process engines only.
        """
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def chunk_sample(params, tokens, positions, kv, block_tables,
                         seq_lens, q_offsets, prompt_lens, sample_mask,
                         seeds, samp, counts, *, mode):
            attn = backend.make_attn_fn(block_tables, seq_lens, q_offsets)
            logits, kv = model.forward(params, tokens, positions, kv, attn)
            logits = logits[..., :V]
            idx = prompt_lens - 1 - q_offsets
            T = tokens.shape[1]
            inside = (idx >= 0) & (idx < T)
            safe = jnp.clip(idx, 0, T - 1)
            final = jnp.take_along_axis(
                logits, safe[:, None, None],
                axis=1)[:, 0].astype(jnp.float32)
            keys = jax.vmap(request_key)(seeds, jnp.zeros_like(seeds))
            tok = sample(final, None, row_keys=keys, mode=mode,
                         counts=counts if mode.use_penalties else None,
                         **samp)
            first = jnp.where(sample_mask & inside, tok, -1)
            return first, kv

        return functools.partial(jax.jit, static_argnames=("mode",),
                                 donate_argnums=(3,))(chunk_sample)

    def _build_scatter_tokens(self):
        """Tiny device merge for the fused tick: scatter the gang's
        sampled first tokens (``first [n]``) into the full-lane burst
        seed vector at ``rows [n]`` (row >= B drops — used for gang
        rows that did not sample). Runs between the gang and the burst
        with no host sync, so the burst consumes the sampled tokens
        without a device->host round-trip. With ``bump`` (static), the
        sampled first tokens are also counted into the penalty
        histogram rows the burst threads — the host cannot bincount a
        token it has not fetched."""

        def scatter(dec_tokens, first, rows, counts, *, bump: bool):
            out = dec_tokens.at[rows].set(first, mode="drop")
            if bump:
                live = (first >= 0).astype(counts.dtype)
                counts = counts.at[rows, jnp.clip(first, 0)].add(
                    live, mode="drop")
            return out, counts

        return functools.partial(jax.jit, static_argnames=("bump",),
                                 donate_argnums=(0, 3))(scatter)

    def _build_scatter_hist(self):
        """Fused SPEC tick variant of the token scatter: patch the
        gang's sampled first tokens into the history buffer the spec
        loop drafts from — row ``rows[i]``'s pending token sits at
        ``cur[row] - 1`` (rows >= B drop)."""

        def scatter(hist, cur, first, rows):
            safe = jnp.clip(rows, 0, cur.shape[0] - 1)
            pos = jnp.take(cur - 1, safe)
            return hist.at[rows, pos].set(first, mode="drop")

        return functools.partial(jax.jit, donate_argnums=(0,))(scatter)

    def _build_score(self):
        """Teacher-forced chunk scorer for perplexity eval: forwards one
        prefill chunk through the paged KV (appending, exactly like
        ``prefill_chunk``) and reduces the chunk's logits to a per-seq
        NLL sum + token count on device — so host/device traffic and
        logit memory are O(chunk), never O(T·V). This replaces the dense
        O(T²) oracle for anything bigger than tiny models (the reference
        has no quality harness at all; its quantizer went unvalidated,
        ``decoder/int8_decoder.cpp:54``)."""
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def score_chunk(params, tokens, targets, valid, positions, kv,
                        block_tables, seq_lens, q_offsets):
            attn = backend.make_attn_fn(block_tables, seq_lens, q_offsets)
            logits, kv = model.forward(params, tokens, positions, kv, attn)
            logp = jax.nn.log_softmax(
                logits[..., :V].astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[..., None], axis=-1)[..., 0]
            nll = jnp.where(valid, nll, 0.0)
            return nll.sum(axis=1), valid.sum(axis=1), kv

        if self.mesh is None:
            return functools.partial(jax.jit, donate_argnums=(5,))(
                score_chunk)

        d = self._data_axis
        sharded = self._shard_step(
            score_chunk,
            in_specs=(self._param_specs, P(d), P(d), P(d), P(d),
                      self._kv_specs, P(d), P(d), P(d)),
            out_specs=(P(d), P(d), self._kv_specs))
        return functools.partial(jax.jit, donate_argnums=(5,))(sharded)

    def _build_decode(self):
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size
        data_axis = self._data_axis if self.mesh is not None else None

        def decode_step(params, tokens, kv, block_tables, seq_lens, rng,
                        samp, counts, *, mode):
            """One fused decode step: forward 1 token/seq + sample.

            ``counts [B, V]`` is the penalty histogram (a ``[B, 1]``
            dummy when ``mode.use_penalties`` is off); the sampled
            token is folded in and the updated histogram returned."""
            positions = seq_lens[:, None]
            attn = backend.make_attn_fn(block_tables, seq_lens + 1, seq_lens)
            logits, kv = model.forward(params, tokens[:, None], positions,
                                       kv, attn)
            rng, sub = jax.random.split(rng)
            if data_axis is not None:
                sub = jax.random.fold_in(sub, jax.lax.axis_index(data_axis))
            next_tok = sample(logits[:, 0, :V], sub, mode=mode,
                              counts=counts if mode.use_penalties else None,
                              **samp)
            if mode.use_penalties:
                counts = bump_counts(counts, next_tok,
                                     jnp.ones_like(next_tok))
            return next_tok, kv, rng, counts

        if self.mesh is None:
            return functools.partial(jax.jit, static_argnames=("mode",),
                                     donate_argnums=(2, 7))(decode_step)

        d = self._data_axis

        @functools.partial(jax.jit, static_argnames=("mode",),
                           donate_argnums=(2, 7))
        def sharded(params, tokens, kv, block_tables, seq_lens, rng, samp,
                    counts, *, mode):
            fn = self._shard_step(
                functools.partial(decode_step, mode=mode),
                in_specs=(self._param_specs, P(d), self._kv_specs, P(d),
                          P(d), P(), self._samp_specs(), P(d)),
                out_specs=(P(d), self._kv_specs, P(), P(d)))
            return fn(params, tokens, kv, block_tables, seq_lens, rng,
                      samp, counts)

        return sharded

    def _build_decode_loop(self):
        """``num_steps`` fused decode steps entirely on device — no host
        round-trip per token (the per-token dispatch cost dominates
        decode through a remote chip). This is the continuous-batching
        scheduler's inner loop ("decode burst"):

        * ``emitted [B]``: tokens each lane has already generated (the
          prefill's first token counts); ``budgets [B]``: each lane's
          ``max_new_tokens``. A lane freezes on device once
          ``emitted >= budget`` or it samples its EOS — frozen lanes
          stop advancing ``seq_lens`` (their writes land one slot past
          live content or on the dump page, never on tagged pages) and
          emit ``max(eos, 0)`` fill the host discards. Idle lanes enter
          with ``emitted >= budget`` and stay frozen throughout.
        * ``seeds [B]``: per-request sampling seeds; token ``i`` of a
          request is drawn with ``request_key(seed, i)`` so sampled
          output is reproducible across batch composition, burst
          boundaries and preemption (ADVICE round 1: per-request seed
          was silently dropped on the scheduler path).

        Pages for all ``num_steps`` must be pre-allocated in
        ``block_tables``.
        """
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def decode_loop(params, tokens, kv, block_tables, seq_lens,
                        emitted, budgets, seeds, samp, counts, *,
                        num_steps: int, mode):
            eos = samp["eos_token_id"]

            def body(carry, _):
                tokens, kv, seq_lens, emitted, finished, counts = carry
                attn = backend.make_attn_fn(block_tables, seq_lens + 1,
                                            seq_lens)
                logits, kv = model.forward(params, tokens[:, None],
                                           seq_lens[:, None], kv, attn)
                keys = jax.vmap(request_key)(seeds, emitted)
                nxt = sample(logits[:, 0, :V], None, row_keys=keys,
                             mode=mode,
                             counts=counts if mode.use_penalties else None,
                             **samp)
                nxt = jnp.where(finished, jnp.maximum(eos, 0), nxt)
                live = (~finished).astype(jnp.int32)
                if mode.use_penalties:
                    counts = bump_counts(counts, nxt, live)
                emitted = emitted + live
                finished = (finished
                            | hit_stop(nxt, eos, samp.get("stop_ids"))
                            | (emitted >= budgets))
                return (nxt, kv, seq_lens + live, emitted, finished,
                        counts), nxt

            finished = emitted >= budgets
            (tokens, kv, seq_lens, emitted, finished, counts), toks = \
                jax.lax.scan(
                    body, (tokens, kv, seq_lens, emitted, finished,
                           counts), None, length=num_steps)
            return jnp.swapaxes(toks, 0, 1), kv, counts

        if self.mesh is None:
            return functools.partial(
                jax.jit, static_argnames=("num_steps", "mode"),
                donate_argnums=(2, 9))(decode_loop)

        d = self._data_axis

        @functools.partial(jax.jit, static_argnames=("num_steps", "mode"),
                           donate_argnums=(2, 9))
        def sharded(params, tokens, kv, block_tables, seq_lens, emitted,
                    budgets, seeds, samp, counts, *, num_steps: int, mode):
            fn = self._shard_step(
                functools.partial(decode_loop, num_steps=num_steps,
                                  mode=mode),
                in_specs=(self._param_specs, P(d), self._kv_specs, P(d),
                          P(d), P(d), P(d), P(d), self._samp_specs(),
                          P(d)),
                out_specs=(P(d), self._kv_specs, P(d)))
            return fn(params, tokens, kv, block_tables, seq_lens, emitted,
                      budgets, seeds, samp, counts)

        return sharded

    def _build_generate_fused(self):
        """The whole request in ONE device program: pool init -> chunked
        prefill -> first-token sample -> ``num_steps``-step decode scan.

        One dispatch + one device->host fetch per batch — the remote-chip
        dispatch latency (tens of ms per call through the TPU tunnel
        after any host transfer) makes multi-dispatch generation
        latency-bound regardless of kernel speed."""
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size
        page = self.cache.page_size
        data_axis = self._data_axis if self.mesh is not None else None
        sharded_mesh = self.mesh
        tp = (self.mesh.shape[self.config.parallel.model_axis]
              if self.mesh is not None else 1)
        dp = self.dp

        def gen(params, tokens_full, prompt_lens, block_tables, rng, samp,
                *, num_steps: int, chunk: int, mode):
            B, max_len = tokens_full.shape
            kv = backend.pool.init(tp=tp, dp=dp)

            final_logits = jnp.zeros((B, V), jnp.float32)
            for c0 in range(0, max_len, chunk):
                c1 = min(c0 + chunk, max_len)
                tok_chunk = tokens_full[:, c0:c1]
                pos = c0 + jnp.broadcast_to(jnp.arange(c1 - c0),
                                            (B, c1 - c0))
                pos = jnp.where(pos < prompt_lens[:, None], pos, -1)
                sl = jnp.clip(prompt_lens, 0, c1)
                qo = jnp.full((B,), c0, jnp.int32)
                attn = backend.make_attn_fn(block_tables, sl, qo)
                logits, kv = model.forward(params, tok_chunk, pos, kv, attn)
                logits = logits[..., :V]
                idx = prompt_lens - 1 - c0
                T = c1 - c0
                inside = (idx >= 0) & (idx < T)
                safe = jnp.clip(idx, 0, T - 1)
                last = jnp.take_along_axis(
                    logits, safe[:, None, None], axis=1)[:, 0]
                final_logits = final_logits + jnp.where(
                    inside[:, None], last, 0.0)

            rng, sub = jax.random.split(rng)
            if data_axis is not None:
                sub = jax.random.fold_in(sub, jax.lax.axis_index(data_axis))
            eos = samp["eos_token_id"]
            if mode.use_penalties:
                counts = token_counts(tokens_full, prompt_lens, V)
            else:
                counts = jnp.zeros((B, 1), jnp.int32)
            first = sample(final_logits, sub, mode=mode,
                           counts=counts if mode.use_penalties else None,
                           **samp)
            if mode.use_penalties:
                counts = bump_counts(counts, first,
                                     jnp.ones((B,), jnp.int32))
            finished = hit_stop(first, eos, samp.get("stop_ids"))
            seq_lens = prompt_lens

            def body(carry, _):
                tokens, kv, seq_lens, rng, finished, counts = carry
                attn = backend.make_attn_fn(block_tables, seq_lens + 1,
                                            seq_lens)
                logits, kv = model.forward(params, tokens[:, None],
                                           seq_lens[:, None], kv, attn)
                rng, sub = jax.random.split(rng)
                if data_axis is not None:
                    sub = jax.random.fold_in(
                        sub, jax.lax.axis_index(data_axis))
                nxt = sample(logits[:, 0, :V], sub, mode=mode,
                             counts=counts if mode.use_penalties else None,
                             **samp)
                nxt = jnp.where(finished, jnp.maximum(eos, 0), nxt)
                if mode.use_penalties:
                    counts = bump_counts(counts, nxt,
                                         (~finished).astype(jnp.int32))
                finished = finished | hit_stop(nxt, eos,
                                               samp.get("stop_ids"))
                return (nxt, kv, seq_lens + 1, rng, finished, counts), nxt

            (_, kv, _, rng, _, _), toks = jax.lax.scan(
                body, (first, kv, seq_lens, rng, finished, counts), None,
                length=num_steps)
            return jnp.concatenate(
                [first[:, None], jnp.swapaxes(toks, 0, 1)], axis=1)

        if self.mesh is None:
            return functools.partial(
                jax.jit, static_argnames=("num_steps", "chunk", "mode"))(gen)

        d = self._data_axis

        @functools.partial(jax.jit,
                           static_argnames=("num_steps", "chunk", "mode"))
        def sharded(params, tokens_full, prompt_lens, block_tables, rng,
                    samp, *, num_steps: int, chunk: int, mode):
            fn = self._shard_step(
                functools.partial(gen, num_steps=num_steps, chunk=chunk,
                                  mode=mode),
                in_specs=(self._param_specs, P(d), P(d), P(d), P(),
                          self._samp_specs()),
                out_specs=P(d))
            return fn(params, tokens_full, prompt_lens, block_tables, rng,
                      samp)

        return sharded

    def _build_decode_spec_loop(self):
        """Speculative decode burst for the continuous-batching
        scheduler: ``num_iters`` draft->verify steps as ONE device
        program over the fixed lanes. Mixed batches are fine — greedy
        lanes accept drafts (emitting up to ``spec_k+1`` tokens per
        iteration, greedy-exact); sampled lanes draw exactly one token
        per iteration with ``request_key(seed, emitted)``, so their
        output is bit-identical to the plain burst path. Lanes freeze
        on device at EOS or their budget (idle lanes enter frozen with
        ``budgets == 0``).

        Carries the per-lane token *history* ``hist [B, M]`` (drafting
        needs it); the host rebuilds it per burst and reads back the
        emitted slice ``hist[b, cur0:cur']``. ``kv_limits [B]`` bounds
        KV writes to each request's validated page budget — draft
        slots past it are redirected to the dump page.
        """
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size
        from .sampling import prepare_logits
        from .spec import (accept_counts, draft_ngram, gather_rows,
                           stochastic_accept, write_rows)

        def loop(params, hist, kv, block_tables, cur, emitted, budgets,
                 seeds, kv_limits, samp, *, num_iters: int, spec_k: int,
                 ngram: int, mode, stochastic: bool = False):
            K = spec_k
            eos = samp["eos_token_id"]
            idxs = jnp.arange(K + 1, dtype=jnp.int32)
            B = hist.shape[0]
            samp_rep = {kk: jnp.repeat(vv, K + 1)
                        for kk, vv in samp.items()}
            greedy_lane = samp["temperature"] <= 0.0

            def body(carry, _):
                hist, kv, cur, emitted, finished = carry
                drafts = draft_ngram(hist, cur, k=K, n=ngram)
                lastt = gather_rows(hist, cur - 1, 1)
                inp = jnp.concatenate([lastt, drafts], axis=1)
                pos = (cur - 1)[:, None] + idxs[None, :]
                pos = jnp.where(finished[:, None], -1, pos)
                pos = jnp.where(pos < kv_limits[:, None], pos, -1)
                attn = backend.make_attn_fn(block_tables, cur + K,
                                            cur - 1)
                logits, kv = model.forward(params, inp, pos, kv, attn)
                flat = logits[..., :V].reshape(B * (K + 1), V)
                base = jax.vmap(jax.vmap(request_key))(
                    jnp.broadcast_to(seeds[:, None], (B, K + 1)),
                    emitted[:, None] + idxs[None, :])
                y = sample(flat, None, row_keys=base.reshape(-1),
                           mode=mode, **samp_rep).reshape(B, K + 1)
                a = jnp.where(greedy_lane,
                              accept_counts(drafts, y[:, :K]), 0)
                if stochastic and not mode.greedy:
                    # sampled lanes accept drafts with the standard
                    # accept/resample rule (engine/spec.py:
                    # stochastic_accept) — each emitted token stays
                    # distributed exactly as a plain draw, but several
                    # can ride one weight stream
                    _, scaled = prepare_logits(flat, mode=mode,
                                               **samp_rep)
                    scaled = scaled.reshape(B, K + 1, V)
                    f1 = jax.vmap(jax.vmap(
                        lambda kk: jax.random.fold_in(kk, 1)))
                    f2 = jax.vmap(jax.vmap(
                        lambda kk: jax.random.fold_in(kk, 2)))
                    a_s, fix = stochastic_accept(
                        scaled, drafts, f1(base[:, :K]), f2(base))
                    y_s = jnp.where(
                        idxs[None, :] < a_s[:, None],
                        jnp.concatenate([drafts, drafts[:, -1:]], axis=1),
                        fix[:, None])
                    a = jnp.where(greedy_lane, a, a_s)
                    y = jnp.where(greedy_lane[:, None], y, y_s)
                ok = idxs[None, :] <= a[:, None]
                ok &= (emitted[:, None] + idxs[None, :]
                       ) < budgets[:, None]
                iseos = (eos[:, None] >= 0) & (y == eos[:, None])
                eos_before = (jnp.cumsum(iseos.astype(jnp.int32), axis=1)
                              - iseos.astype(jnp.int32)) > 0
                ok &= ~eos_before & ~finished[:, None]
                cnt = ok.sum(axis=1).astype(jnp.int32)
                hist = write_rows(hist, cur, y)
                emitted = emitted + cnt
                finished = (finished | (emitted >= budgets)
                            | (iseos & ok).any(axis=1))
                return (hist, kv, cur + cnt, emitted, finished), None

            finished = emitted >= budgets
            (hist, kv, cur, emitted, finished), _ = jax.lax.scan(
                body, (hist, kv, cur, emitted, finished), None,
                length=num_iters)
            return hist, cur, emitted, kv

        if self.mesh is None:
            return functools.partial(
                jax.jit,
                static_argnames=("num_iters", "spec_k", "ngram", "mode",
                                 "stochastic"),
                donate_argnums=(2,))(loop)

        d = self._data_axis

        @functools.partial(jax.jit,
                           static_argnames=("num_iters", "spec_k",
                                            "ngram", "mode",
                                            "stochastic"),
                           donate_argnums=(2,))
        def sharded(params, hist, kv, block_tables, cur, emitted,
                    budgets, seeds, kv_limits, samp, *, num_iters: int,
                    spec_k: int, ngram: int, mode,
                    stochastic: bool = False):
            fn = self._shard_step(
                functools.partial(loop, num_iters=num_iters,
                                  spec_k=spec_k, ngram=ngram, mode=mode,
                                  stochastic=stochastic),
                in_specs=(self._param_specs, P(d), self._kv_specs, P(d),
                          P(d), P(d), P(d), P(d), P(d),
                          self._samp_specs()),
                out_specs=(P(d), P(d), P(d), self._kv_specs))
            return fn(params, hist, kv, block_tables, cur, emitted,
                      budgets, seeds, kv_limits, samp)

        return sharded

    def _build_generate_spec(self):
        """Whole-request *speculative* generation in ONE device program:
        chunked prefill, then a while-loop of draft->verify steps
        (prompt-lookup drafting, ``engine/spec.py``). Each iteration
        drafts ``spec_k`` tokens from the sequence's own history,
        verifies them in a single ``(spec_k+1)``-token forward (weight
        traffic ~= one decode step), and emits the accepted prefix plus
        the bonus token — greedy-exact: outputs equal the plain fused
        path token-for-token. The loop exits as soon as every lane hits
        EOS or its budget, so high acceptance finishes in fewer
        iterations (the fused path always runs ``max_new`` steps).

        Single-process engines only: the early-exit condition is a
        global ``any`` over lanes (meshed engines would need a psum in
        the loop condition; they keep the plain fused path).
        """
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size
        from .spec import (accept_counts, draft_ngram, gather_rows,
                           write_rows)

        def gen(params, tokens_full, prompt_lens, block_tables, samp, *,
                max_new: int, spec_k: int, ngram: int, chunk: int,
                prompt_pad: int, mode):
            B, M = tokens_full.shape
            K = spec_k
            kv = backend.pool.init()
            eos = samp["eos_token_id"]

            # chunked prefill (identical to the fused path)
            final_logits = jnp.zeros((B, V), jnp.float32)
            for c0 in range(0, prompt_pad, chunk):
                c1 = min(c0 + chunk, prompt_pad)
                tok_chunk = tokens_full[:, c0:c1]
                pos = c0 + jnp.broadcast_to(jnp.arange(c1 - c0),
                                            (B, c1 - c0))
                pos = jnp.where(pos < prompt_lens[:, None], pos, -1)
                sl = jnp.clip(prompt_lens, 0, c1)
                qo = jnp.full((B,), c0, jnp.int32)
                attn = backend.make_attn_fn(block_tables, sl, qo)
                logits, kv = model.forward(params, tok_chunk, pos, kv, attn)
                logits = logits[..., :V]
                idx = prompt_lens - 1 - c0
                T = c1 - c0
                inside = (idx >= 0) & (idx < T)
                safe = jnp.clip(idx, 0, T - 1)
                last = jnp.take_along_axis(
                    logits, safe[:, None, None], axis=1)[:, 0]
                final_logits = final_logits + jnp.where(
                    inside[:, None], last, 0.0)

            first = sample(final_logits, None, mode=mode, **samp)
            buf = write_rows(tokens_full, prompt_lens, first[:, None])
            cur = prompt_lens + 1             # tokens in buf (incl. first)
            emitted = jnp.ones((B,), jnp.int32)
            budgets = jnp.full((B,), max_new, jnp.int32)
            finished = (((eos >= 0) & (first == eos))
                        | (emitted >= budgets))
            idxs = jnp.arange(K + 1, dtype=jnp.int32)

            def cond(c):
                _, _, _, _, finished, it = c
                return (~finished).any() & (it < max_new)

            def body(c):
                buf, kv, cur, emitted, finished, it = c
                drafts = draft_ngram(buf, cur, k=K, n=ngram)
                lastt = gather_rows(buf, cur - 1, 1)            # [B, 1]
                inp = jnp.concatenate([lastt, drafts], axis=1)  # [B, K+1]
                # KV writes for the verify chunk land at cur-1 .. cur-1+K
                # (slot cur-1 holds the last *sampled* token's KV, written
                # here exactly like a normal decode step would); frozen
                # lanes redirect to the dump page via pos = -1
                pos = (cur - 1)[:, None] + idxs[None, :]
                pos = jnp.where(finished[:, None], -1, pos)
                attn = backend.make_attn_fn(block_tables, cur + K, cur - 1)
                logits, kv = model.forward(params, inp, pos, kv, attn)
                flat = logits[..., :V].reshape(B * (K + 1), V)
                samp_w = {kk: jnp.repeat(vv, K + 1)
                          for kk, vv in samp.items()}
                y = sample(flat, None, mode=mode, **samp_w
                           ).reshape(B, K + 1)
                a = accept_counts(drafts, y[:, :K])             # [B]
                # emit positions: accepted prefix + bonus, capped by the
                # budget, cut at the first EOS, frozen lanes emit none
                ok = idxs[None, :] <= a[:, None]
                ok &= (emitted[:, None] + idxs[None, :]) < budgets[:, None]
                iseos = (eos[:, None] >= 0) & (y == eos[:, None])
                eos_before = (jnp.cumsum(iseos.astype(jnp.int32), axis=1)
                              - iseos.astype(jnp.int32)) > 0
                ok &= ~eos_before & ~finished[:, None]
                cnt = ok.sum(axis=1).astype(jnp.int32)
                # write all K+1 candidates; slots past cnt are stale and
                # get overwritten by the next iteration before any read
                buf = write_rows(buf, cur, y)
                emitted = emitted + cnt
                finished = (finished | (emitted >= budgets)
                            | (iseos & ok).any(axis=1))
                return (buf, kv, cur + cnt, emitted, finished, it + 1)

            buf, kv, cur, emitted, finished, _ = jax.lax.while_loop(
                cond, body,
                (buf, kv, cur, emitted, finished,
                 jnp.zeros((), jnp.int32)))
            return buf, emitted

        return functools.partial(
            jax.jit, static_argnames=("max_new", "spec_k", "ngram",
                                      "chunk", "prompt_pad", "mode"))(gen)

    # -- host orchestration ---------------------------------------------------

    def _shard_of(self, b: int, batch: int) -> int:
        """Data shard owning sequence ``b`` (contiguous batch split)."""
        return b * self.dp // batch

    def _state_allocators(self, state: EngineState) -> List:
        return state.allocators or self.allocators

    def _alloc_pages(self, state: EngineState, b: int,
                     new_len: int) -> None:
        pages = state.pages[b]
        need = cdiv(new_len, self.cache.page_size) - len(pages)
        if need > 0:
            alloc = self._state_allocators(state)[
                self._shard_of(b, state.batch)]
            pages.extend(alloc.alloc_many(need))

    def _block_tables(self, pages: List[List[int]]) -> np.ndarray:
        bt = np.zeros((len(pages), self.cache.max_pages_per_seq), np.int32)
        for b, ps in enumerate(pages):
            bt[b, :len(ps)] = ps
        return bt

    def prefill(self, prompts: Sequence[Sequence[int]],
                seed: Optional[int] = None,
                sampling: Optional[SamplingParams] = None,
                allocators: Optional[List] = None) -> EngineState:
        """Chunked prefill; samples the first generated token.
        ``allocators`` (one per data shard) gives the returned state a
        private page-id space (see :class:`EngineState`)."""
        B = len(prompts)
        lens = np.array([len(p) for p in prompts], np.int32)
        assert lens.min() >= 1
        page = self.cache.page_size
        # chunks must stay page-aligned: the kv-append kernel writes
        # whole pages during prefill (ops/kv_append.py). Under
        # sequence-parallel prefill every chunk additionally splits
        # into sp equal per-shard slices.
        grain = math.lcm(page, self.sp)
        chunk = cdiv(max(self.runtime.prefill_chunk, 1), grain) * grain
        max_len = cdiv(int(lens.max()), grain) * grain

        assert B % self.dp == 0, f"batch {B} must divide dp={self.dp}"
        allocs = allocators or self.allocators
        pages: List[List[int]] = [
            allocs[self._shard_of(b, B)].alloc_many(
                cdiv(int(L), self.cache.page_size))
            for b, L in enumerate(lens)
        ]
        bt_np = self._block_tables(pages)
        bt = jnp.asarray(bt_np)
        kv = self._init_cache()

        tokens = np.zeros((B, max_len), np.int32)
        for b, p in enumerate(prompts):
            tokens[b, :len(p)] = np.asarray(p, np.int32)

        prompt_lens = jnp.asarray(lens)
        final_logits = jnp.zeros((B, self.cfg.vocab_size), jnp.float32)
        for c0 in range(0, max_len, chunk):
            c1 = min(c0 + chunk, max_len)
            tok_chunk = jnp.asarray(tokens[:, c0:c1])
            pos = c0 + np.broadcast_to(np.arange(c1 - c0), (B, c1 - c0))
            pos = np.where(pos < lens[:, None], pos, -1)
            sl = jnp.asarray(np.clip(lens, 0, c1))
            qo = jnp.full((B,), c0, jnp.int32)
            logits, kv = self._prefill_fn(
                self.params, tok_chunk, jnp.asarray(pos), kv, bt, sl, qo,
                prompt_lens)
            final_logits = final_logits + logits

        rng = jax.random.key(self.runtime.seed if seed is None else seed)
        rng, sub = jax.random.split(rng)
        sp = sampling or self._default_sampling()
        mode = sp.mode()
        if mode.use_penalties:
            counts = token_counts(jnp.asarray(tokens), prompt_lens,
                                  self.cfg.vocab_size)
        else:
            counts = jnp.zeros((B, 1), jnp.int32)
        final_np = to_host(final_logits)     # multi-process: allgather
        first = self._sample_fn(jnp.asarray(final_np), sub, mode=mode,
                                counts=counts if mode.use_penalties
                                else None,
                                **sp.as_arrays(B))
        first_np = np.asarray(first)
        if mode.use_penalties:
            counts = bump_counts(counts, first, jnp.ones((B,), jnp.int32))

        state = EngineState(
            kv=kv, block_tables=bt_np, seq_lens=lens.copy(), pages=pages,
            rng=rng, last_tokens=first_np,
            finished=np.zeros((B,), bool),
            prefill_logits=final_np,
            counts=counts,
            allocators=allocators)
        self._mark_finished(state, first_np, sampling)
        return state

    def score_nll(self, prompts: Sequence[Sequence[int]],
                  starts: Optional[Sequence[int]] = None,
                  mean: bool = True,
                  allocators: Optional[List] = None) -> np.ndarray:
        """Per-sequence NLL of ``tokens[start:]`` given their prefixes,
        teacher-forced through the paged chunked-prefill path
        (``starts`` defaults to 1 = every target; the reranker scores
        candidate-given-context by passing ``starts=len(context)``).
        ``mean=False`` returns the NLL *sum* (un-normalized log-prob).

        Unlike :func:`quant.eval.sequence_nll`'s dense oracle this
        scales to real models/eval sets: attention reads the page pool
        (O(T) KV per chunk) and only one chunk of logits ever exists.
        Pages are freed on return."""
        if self._score_fn is None:
            self._score_fn = self._build_score()
        B = len(prompts)
        lens = np.array([len(p) for p in prompts], np.int32)
        start_arr = (np.ones((B,), np.int32) if starts is None
                     else np.asarray(list(starts), np.int32))
        assert lens.min() >= 2, "scoring needs at least 2 tokens/seq"
        assert (start_arr >= 1).all() and (start_arr < lens).all(), (
            "starts must leave at least one target per sequence")
        assert B % self.dp == 0, f"batch {B} must divide dp={self.dp}"
        page = self.cache.page_size
        chunk = cdiv(max(self.runtime.prefill_chunk, 1), page) * page
        max_len = cdiv(int(lens.max()), page) * page

        allocs = allocators or self.allocators
        pages: List[List[int]] = [
            allocs[self._shard_of(b, B)].alloc_many(
                cdiv(int(L), page))
            for b, L in enumerate(lens)
        ]
        bt = jnp.asarray(self._block_tables(pages))
        kv = self._init_cache()

        tokens = np.zeros((B, max_len), np.int32)
        for b, p in enumerate(prompts):
            tokens[b, :len(p)] = np.asarray(p, np.int32)
        # targets[t] = token at t+1 (last column pads with 0, masked off)
        targets = np.zeros((B, max_len), np.int32)
        targets[:, :-1] = tokens[:, 1:]

        nll_sum = np.zeros((B,), np.float64)
        cnt = np.zeros((B,), np.int64)
        try:
            for c0 in range(0, max_len, chunk):
                c1 = min(c0 + chunk, max_len)
                T = c1 - c0
                pos = c0 + np.broadcast_to(np.arange(T), (B, T))
                valid = ((pos + 1 < lens[:, None])   # target must exist
                         & (pos + 1 >= start_arr[:, None]))
                pos_in = np.where(pos < lens[:, None], pos, -1)
                sl = jnp.asarray(np.clip(lens, 0, c1))
                qo = jnp.full((B,), c0, jnp.int32)
                s, c, kv = self._score_fn(
                    self.params, jnp.asarray(tokens[:, c0:c1]),
                    jnp.asarray(targets[:, c0:c1]), jnp.asarray(valid),
                    jnp.asarray(pos_in), kv, bt, sl, qo)
                nll_sum += np.asarray(s, np.float64)
                cnt += np.asarray(c, np.int64)
        finally:
            for b, ps in enumerate(pages):
                alloc = allocs[self._shard_of(b, B)]
                for p in ps:
                    alloc.free(p)
        if not mean:
            return nll_sum.astype(np.float64)
        return (nll_sum / np.maximum(cnt, 1)).astype(np.float64)

    def score_candidates_nll(self, context_ids: Sequence[int],
                             candidates: Sequence[Sequence[int]],
                             mean: bool = True,
                             allocators: Optional[List] = None
                             ) -> np.ndarray:
        """NLL of each candidate continuation given ONE shared context.

        The context is prefilled once (batch 1); candidate rows then
        share its full pages by refcount (``PageAllocator.fork`` — the
        beam-search page-sharing machinery) and only the pages from the
        last chunk boundary before the context's end are private per
        row (they straddle context and candidate tokens, so each row
        re-appends that chunk into its own pages). Versus scoring
        ``context + candidate`` per row this pays the context prefill
        ONCE and allocates ``ctx_pages + W x (candidate + 1 chunk)``
        pages instead of ``W x (ctx + candidate)``."""
        assert self.dp == 1, "candidate scoring runs per data shard"
        if self._score_fn is None:
            self._score_fn = self._build_score()
        allocs = allocators or self.allocators
        alloc = allocs[0]
        W = len(candidates)
        L = len(context_ids)
        assert L >= 1 and W >= 1
        assert all(len(c) >= 1 for c in candidates)
        page = self.cache.page_size
        chunk = cdiv(max(self.runtime.prefill_chunk, 1), page) * page

        state = self.prefill([list(context_ids)], allocators=[alloc])
        kv = state.kv
        ctx_pages = state.pages[0]
        c0 = ((L - 1) // chunk) * chunk    # first (re-)scored chunk
        n_shared = c0 // page              # pages fully below c0
        lens = np.array([L + len(c) for c in candidates], np.int32)
        max_len = cdiv(int(lens.max()), page) * page
        assert cdiv(int(lens.max()), page) <= self.cache.max_pages_per_seq

        rows_pages: List[List[int]] = []
        try:
            for c in candidates:
                shared = alloc.fork(ctx_pages[:n_shared])
                try:
                    fresh = alloc.alloc_many(
                        cdiv(L + len(c), page) - n_shared)
                except Exception:
                    for p in shared:
                        alloc.free(p)
                    raise
                rows_pages.append(shared + fresh)
        except Exception:
            # release everything acquired so far (incl. the context
            # row) — a partial failure must not leak pages from the
            # caller's (possibly private) allocator
            for ps in rows_pages:
                for p in ps:
                    alloc.free(p)
            for p in ctx_pages:
                alloc.free(p)
            raise
        for p in ctx_pages:                # release the context row
            alloc.free(p)
        bt = jnp.asarray(self._block_tables(rows_pages))

        tokens = np.zeros((W, max_len), np.int32)
        for i, c in enumerate(candidates):
            seq = list(context_ids) + list(c)
            tokens[i, :len(seq)] = np.asarray(seq, np.int32)
        targets = np.zeros_like(tokens)
        targets[:, :-1] = tokens[:, 1:]

        nll_sum = np.zeros((W,), np.float64)
        cnt = np.zeros((W,), np.int64)
        try:
            for cs in range(c0, max_len, chunk):
                ce = min(cs + chunk, max_len)
                T = ce - cs
                pos = cs + np.broadcast_to(np.arange(T), (W, T))
                valid = ((pos + 1 >= L)    # targets = candidate tokens
                         & (pos + 1 < lens[:, None]))
                pos_in = np.where(pos < lens[:, None], pos, -1)
                sl = jnp.asarray(np.clip(lens, 0, ce))
                qo = jnp.full((W,), cs, jnp.int32)
                s, c_, kv = self._score_fn(
                    self.params, jnp.asarray(tokens[:, cs:ce]),
                    jnp.asarray(targets[:, cs:ce]), jnp.asarray(valid),
                    jnp.asarray(pos_in), kv, bt, sl, qo)
                nll_sum += np.asarray(s, np.float64)
                cnt += np.asarray(c_, np.int64)
        finally:
            for ps in rows_pages:
                for p in ps:
                    alloc.free(p)
        if not mean:
            return nll_sum.astype(np.float64)
        return (nll_sum / np.maximum(cnt, 1)).astype(np.float64)

    def _default_sampling(self) -> SamplingParams:
        r = self.runtime
        return SamplingParams(
            temperature=r.temperature, top_k=r.top_k, top_p=r.top_p,
            min_p=r.min_p, repetition_penalty=r.repetition_penalty,
            presence_penalty=r.presence_penalty,
            frequency_penalty=r.frequency_penalty,
            eos_token_id=self.config.eos_token_id,
            eos_threshold=r.eos_threshold)

    def _mark_finished(self, state: EngineState, toks: np.ndarray,
                       sampling: Optional[SamplingParams]) -> None:
        sp = sampling or self._default_sampling()
        if sp.eos_token_id >= 0:
            state.finished |= toks == sp.eos_token_id
        if sp.stop_token_ids:
            state.finished |= np.isin(
                toks, np.asarray(sp.stop_token_ids, np.int32))

    def decode(self, state: EngineState,
               sampling: Optional[SamplingParams] = None) -> np.ndarray:
        """Advance every sequence one token. Returns sampled tokens [B]."""
        B = state.batch
        # grow pages to hold the token being appended this step
        for b in range(B):
            self._alloc_pages(state, b, int(state.seq_lens[b]) + 1)
        state.block_tables = self._block_tables(state.pages)

        sp = sampling or self._default_sampling()
        mode = sp.mode()
        if state.counts is None or (mode.use_penalties
                                    and state.counts.shape[1] == 1):
            # states prefillled without penalties that decode with them:
            # seed from nothing (prompt history unavailable here)
            state.counts = jnp.zeros(
                (B, self.cfg.vocab_size if mode.use_penalties else 1),
                jnp.int32)
        next_tok, state.kv, state.rng, state.counts = self._decode_fn(
            self.params, jnp.asarray(state.last_tokens), state.kv,
            jnp.asarray(state.block_tables), jnp.asarray(state.seq_lens),
            state.rng, sp.as_arrays(B), state.counts, mode=mode)
        state.seq_lens += 1
        toks = to_host(next_tok)
        state.last_tokens = toks
        self._mark_finished(state, toks, sampling)
        return toks

    def _build_decode_logits(self):
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def step(params, tokens, kv, block_tables, seq_lens):
            positions = seq_lens[:, None]
            attn = backend.make_attn_fn(block_tables, seq_lens + 1, seq_lens)
            logits, kv = model.forward(params, tokens[:, None], positions,
                                       kv, attn)
            return logits[:, 0, :V], kv

        if self.mesh is None:
            return functools.partial(jax.jit, donate_argnums=(2,))(step)
        d = self._data_axis
        sharded = self._shard_step(
            step,
            in_specs=(self._param_specs, P(d), self._kv_specs, P(d), P(d)),
            out_specs=(P(d), self._kv_specs))
        return functools.partial(jax.jit, donate_argnums=(2,))(sharded)

    def _build_decode_scored(self):
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def step(params, tokens, kv, block_tables, seq_lens):
            sink: list = []
            attn = backend.make_attn_fn(block_tables, seq_lens + 1,
                                        seq_lens, score_sink=sink)
            logits, kv = model.forward(params, tokens[:, None],
                                       seq_lens[:, None], kv, attn)
            return logits[:, 0, :V], jnp.stack(sink), kv

        if self.mesh is None:
            return functools.partial(jax.jit, donate_argnums=(2,))(step)
        d = self._data_axis
        sharded = self._shard_step(
            step,
            in_specs=(self._param_specs, P(d), self._kv_specs, P(d), P(d)),
            out_specs=(P(d), P(None, d), self._kv_specs))
        return functools.partial(jax.jit, donate_argnums=(2,))(sharded)

    def decode_scored(self, state: EngineState, tokens: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Teacher-forced decode step that also returns the attention
        kernel's own per-page score export: ``(logits [B, V],
        scores [L, B, max_pages])`` where ``scores[l, b, p]`` is the max
        causally-masked scaled QK logit of page ``p`` at layer ``l``
        (``-1e30`` for dead pages). Advances the KV state exactly like
        :meth:`decode_forced`.

        Capability parity with the reference kernel's ``rerank_scores``
        output (``attention/paged_flash_attention_kernel_fused.cu:53-55``)
        — there a per-(batch, tile) logit dump intended for beam /
        reranker integration; here the export rides the flash pass (no
        dense re-run) and feeds attention introspection and
        page-importance policies."""
        if getattr(self, "_decode_scored_fn", None) is None:
            assert not self.runtime.scan_layers, \
                "score export needs the unrolled layer loop"
            self._decode_scored_fn = self._build_decode_scored()
        B = state.batch
        for b in range(B):
            self._alloc_pages(state, b, int(state.seq_lens[b]) + 1)
        state.block_tables = self._block_tables(state.pages)
        logits, scores, state.kv = self._decode_scored_fn(
            self.params, jnp.asarray(np.asarray(tokens, np.int32)),
            state.kv, jnp.asarray(state.block_tables),
            jnp.asarray(state.seq_lens))
        state.seq_lens += 1
        state.last_tokens = np.asarray(tokens, np.int32)
        return to_host(logits), to_host(scores)

    def _build_decode_beam(self):
        """Fused beam-expansion step: forward one token per beam row,
        then select the top ``2W`` (parent, token) continuations by
        cumulative log-probability ON DEVICE — one dispatch and a
        ``3 x 2W`` transfer per step instead of shipping the full
        ``[W, V]`` logits to the host (2 MB/step at a 128k vocab).
        Single-process engines only (the flat cross-row ``top_k`` does
        not shard over a data axis); meshed engines keep the
        ``decode_forced`` + host-selection path.

        The jitted step is cached on the engine: every
        :class:`~.beam.BeamSearcher` instance must share it, or each
        beam request would recompile the full step (measured ~3.5 s per
        step at 8B — BENCHMARKS.md round 3)."""
        if self._decode_beam_fn is not None:
            return self._decode_beam_fn
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size

        def step(params, tokens, kv, block_tables, seq_lens,
                 beam_scores, alive, copies_src, copies_dst):
            # the previous selection's COW page copies (dump-page
            # self-copies in unused slots) execute first inside the
            # same program — one dispatch per beam step, not two
            from ..kvcache.pool import copy_pages_tree

            kv = copy_pages_tree(kv, copies_src, copies_dst)
            attn = backend.make_attn_fn(block_tables, seq_lens + 1,
                                        seq_lens)
            logits, kv = model.forward(params, tokens[:, None],
                                       seq_lens[:, None], kv, attn)
            lp = jax.nn.log_softmax(
                logits[:, 0, :V].astype(jnp.float32), axis=-1)
            lp = jnp.where(alive[:, None], lp, -jnp.inf)
            cand = beam_scores[:, None] + lp              # [W, V]
            W = tokens.shape[0]
            vals, idx = jax.lax.top_k(cand.reshape(-1), 2 * W)
            return idx // V, idx % V, vals, kv

        self._decode_beam_fn = functools.partial(
            jax.jit, donate_argnums=(2,))(step)
        return self._decode_beam_fn

    def _build_decode_beam_burst(self):
        """``num_steps`` beam-expansion steps entirely ON DEVICE — the
        beam twin of the scheduler's decode burst. Each scan iteration:
        apply the previous selection's pending COW page copies, forward
        one token per beam row, select the top-W (parent, token) pairs
        by cumulative log-probability, and REWIRE THE BLOCK TABLES ON
        DEVICE: each row gathers its parent's table; the page that the
        next append will write gets replaced by a host-preallocated
        fresh page when (a) the rows cross into a new page, or (b) the
        row is not the first chooser of its parent (copy-on-write — the
        data copy of the old tail rides the next iteration's
        ``copy_pages_tree``). The host replays the identical
        deterministic page arithmetic afterwards to sync the allocator
        (``BeamSearcher._replay_burst``).

        Round 3 measured the per-beam-step floor as *host interaction*
        (block-table rewiring + uploads between steps — BENCHMARKS.md);
        this program touches the host once per ``num_steps`` instead of
        once per step. Invariant maintained: after every rewire each
        row's next-append page is exclusive to that row, so sibling
        beams never clobber shared pages. Single-process engines only.

        ``fresh [num_steps, W]``: preallocated page ids; row ``w``
        consumes ``fresh[k, w]`` at step ``k`` iff crossing/COW (the
        host replay frees unused ones). Dead rows (EOS / all-dead
        garbage steps) are masked out of the candidate pool exactly
        like the per-step path. Returns the per-step
        ``(parents, tokens, scores, alive)`` traces, the final-step
        carry the next burst resumes from, and the KV state.
        """
        if self._decode_beam_burst_fn is not None:
            return self._decode_beam_burst_fn
        model, backend = self.model, self.backend
        V = self.cfg.vocab_size
        page = self.cache.page_size
        from ..kvcache.pool import copy_pages_tree

        def loop(params, tokens, kv, bt, seq_lens, scores, alive,
                 csrc, cdst, fresh, eos, *, num_steps: int):
            W = tokens.shape[0]
            tril = jnp.tril(jnp.ones((W, W), bool), k=-1)
            rows_i = jnp.arange(W, dtype=jnp.int32)

            def body(carry, fresh_k):
                tokens, kv, bt, sl, scores, alive, csrc, cdst = carry
                kv = copy_pages_tree(kv, csrc, cdst)
                attn = backend.make_attn_fn(bt, sl + 1, sl)
                logits, kv = model.forward(params, tokens[:, None],
                                           sl[:, None], kv, attn)
                lp = jax.nn.log_softmax(
                    logits[:, 0, :V].astype(jnp.float32), axis=-1)
                lp = jnp.where(alive[:, None], lp, -jnp.inf)
                cand = scores[:, None] + lp
                vals, idx = jax.lax.top_k(cand.reshape(-1), W)
                par = (idx // V).astype(jnp.int32)
                tok = (idx % V).astype(jnp.int32)
                new_bt = bt[par]
                sl1 = sl + 1
                tidx = sl1[0] // page            # beam rows are uniform
                crossing = (sl1[0] % page) == 0
                taken_before = ((par[:, None] == par[None, :])
                                & tril).any(axis=1)
                old_tail = new_bt[rows_i, tidx]
                use_fresh = crossing | taken_before
                new_bt = new_bt.at[rows_i, tidx].set(
                    jnp.where(use_fresh, fresh_k, old_tail))
                # data copy only for COW; crossing pages start empty
                cow = taken_before & ~crossing
                csrc2 = jnp.where(cow, old_tail, 0)
                cdst2 = jnp.where(cow, fresh_k, 0)
                now_eos = (eos >= 0) & (tok == eos)
                alive2 = (vals > -1e29) & ~now_eos
                return ((tok, kv, new_bt, sl1, vals, alive2, csrc2,
                         cdst2), (par, tok, vals, alive2))

            carry, ys = jax.lax.scan(
                body, (tokens, kv, bt, seq_lens, scores, alive, csrc,
                       cdst), fresh, length=num_steps)
            tokens, kv, bt, sl, scores, alive, csrc, cdst = carry
            pars, toks, vals, alives = ys
            return pars, toks, vals, alives, tokens, scores, csrc, cdst, kv

        self._decode_beam_burst_fn = functools.partial(
            jax.jit, static_argnames=("num_steps",),
            donate_argnums=(2,))(loop)
        return self._decode_beam_burst_fn

    def decode_forced(self, state: EngineState,
                      tokens: np.ndarray) -> np.ndarray:
        """Teacher-forced decode step: feed ``tokens [B]``, return the
        next-token logits ``[B, V]``. Advances the KV state. Used by
        parity tests (greedy token equality is brittle when a random
        model's top-2 logits nearly tie) and by the reranker's
        log-prob scorer."""
        if self._decode_logits_fn is None:
            self._decode_logits_fn = self._build_decode_logits()
        B = state.batch
        for b in range(B):
            self._alloc_pages(state, b, int(state.seq_lens[b]) + 1)
        state.block_tables = self._block_tables(state.pages)
        logits, state.kv = self._decode_logits_fn(
            self.params, jnp.asarray(np.asarray(tokens, np.int32)),
            state.kv, jnp.asarray(state.block_tables),
            jnp.asarray(state.seq_lens))
        state.seq_lens += 1
        state.last_tokens = np.asarray(tokens, np.int32)
        return to_host(logits)

    def free(self, state: EngineState) -> None:
        B = state.batch
        allocs = self._state_allocators(state)
        for b, ps in enumerate(state.pages):
            alloc = allocs[self._shard_of(b, B)]
            for p in ps:
                alloc.free(p)
        state.pages = [[] for _ in state.pages]

    # -- user-facing generation ------------------------------------------------

    def generate_stream(self, prompt: Sequence[int],
                        max_new_tokens: Optional[int] = None,
                        sampling: Optional[SamplingParams] = None,
                        seed: Optional[int] = None) -> Iterator[int]:
        """Token-at-a-time streaming generation for one sequence."""
        sampling = sampling or self._default_sampling()
        max_new = max_new_tokens or self.runtime.max_new_tokens
        state = self.prefill([prompt], seed=seed, sampling=sampling)
        try:
            tok = int(state.last_tokens[0])
            yield tok
            for _ in range(max_new - 1):
                if state.finished[0]:
                    return
                tok = int(self.decode(state, sampling)[0])
                yield tok
        finally:
            self.free(state)

    def generate(self, prompt: Sequence[int],
                 max_new_tokens: Optional[int] = None,
                 sampling: Optional[SamplingParams] = None,
                 seed: Optional[int] = None) -> List[int]:
        return list(self.generate_stream(prompt, max_new_tokens, sampling,
                                         seed=seed))

    def generate_batch_fused(self, prompts: Sequence[Sequence[int]],
                             max_new_tokens: Optional[int] = None,
                             sampling: Optional[SamplingParams] = None,
                             seed: Optional[int] = None) -> List[List[int]]:
        """The whole request batch in ONE device dispatch: pool init,
        chunked prefill, sampling, and all ``max_new_tokens`` decode
        steps run as a single jitted program; pages are pre-allocated
        for the full horizon. Used by benchmarks and batch endpoints;
        per-token streaming uses ``generate_stream``.
        """
        sampling = sampling or self._default_sampling()
        max_new = max_new_tokens or self.runtime.max_new_tokens
        B = len(prompts)
        assert B % self.dp == 0, f"batch {B} must divide dp={self.dp}"
        lens = np.array([len(p) for p in prompts], np.int32)
        assert lens.min() >= 1
        page = self.cache.page_size
        chunk = cdiv(max(self.runtime.prefill_chunk, 1), page) * page
        max_len = cdiv(int(lens.max()), page) * page

        allocs = self.allocators
        pages: List[List[int]] = [
            allocs[self._shard_of(b, B)].alloc_many(
                cdiv(int(L) + max_new, page))
            for b, L in enumerate(lens)
        ]
        tokens = np.zeros((B, max_len), np.int32)
        for b, p in enumerate(prompts):
            tokens[b, :len(p)] = np.asarray(p, np.int32)
        rng = jax.random.key(self.runtime.seed if seed is None else seed)
        try:
            toks = self._generate_fused_fn(
                self.params, jnp.asarray(tokens), jnp.asarray(lens),
                jnp.asarray(self._block_tables(pages)), rng,
                sampling.as_arrays(B), num_steps=max_new - 1,
                chunk=min(chunk, max_len), mode=sampling.mode())
            toks = to_host(toks)
            outs: List[List[int]] = []
            for b in range(B):
                row: List[int] = []
                stops = set(sampling.stop_token_ids)
                for t in map(int, toks[b]):
                    row.append(t)
                    if (t == sampling.eos_token_id >= 0) or t in stops:
                        break
                outs.append(row)
            return outs
        finally:
            for b, ps in enumerate(pages):
                alloc = allocs[self._shard_of(b, B)]
                for p in ps:
                    alloc.free(p)

    def generate_batch_spec(self, prompts: Sequence[Sequence[int]],
                            max_new_tokens: Optional[int] = None,
                            sampling: Optional[SamplingParams] = None,
                            spec_k: Optional[int] = None,
                            ngram: Optional[int] = None
                            ) -> List[List[int]]:
        """Speculative (prompt-lookup) batch generation, one dispatch.

        Greedy-exact: returns token-for-token the same output as
        :meth:`generate_batch_fused` with greedy sampling, in fewer
        device steps whenever the text re-uses its own n-grams
        (extraction, code, summaries, chat with quoting). See
        ``engine/spec.py`` and ``RuntimeConfig.spec_k``.
        """
        sampling = sampling or self._default_sampling()
        assert sampling.mode().greedy, \
            "speculative decoding is greedy-exact only (temperature=0)"
        assert not (sampling.has_penalties or sampling.stop_token_ids
                    or sampling.logit_bias), \
            "speculative decoding does not support penalties/stop sets/" \
            "logit bias (they change the greedy pick per emitted " \
            "token); use generate_batch_fused"
        assert self.mesh is None, \
            "speculative decoding runs on single-process engines"
        K = spec_k if spec_k is not None else (self.runtime.spec_k or 4)
        n = ngram if ngram is not None else self.runtime.spec_ngram
        assert K >= 1 and n >= 1
        max_new = max_new_tokens or self.runtime.max_new_tokens
        B = len(prompts)
        lens = np.array([len(p) for p in prompts], np.int32)
        assert lens.min() >= 1
        page = self.cache.page_size
        chunk = cdiv(max(self.runtime.prefill_chunk, 1), page) * page
        prompt_pad = cdiv(int(lens.max()), page) * page
        # history buffer: every lane writes K+1 candidates at cur<=
        # prompt+max_new, so the buffer must not clamp that slice
        M = prompt_pad + max_new + K + 1

        horizon = [cdiv(int(L) + max_new + K, page) for L in lens]
        assert max(horizon) <= self.cache.max_pages_per_seq, (
            f"prompt+max_new+spec_k needs {max(horizon)} pages > "
            f"max_pages_per_seq={self.cache.max_pages_per_seq}")
        pages: List[List[int]] = [
            self.allocator.alloc_many(h) for h in horizon]
        tokens = np.zeros((B, M), np.int32)
        for b, p in enumerate(prompts):
            tokens[b, :len(p)] = np.asarray(p, np.int32)
        if self._generate_spec_fn is None:
            self._generate_spec_fn = self._build_generate_spec()
        try:
            buf, emitted = self._generate_spec_fn(
                self.params, jnp.asarray(tokens), jnp.asarray(lens),
                jnp.asarray(self._block_tables(pages)),
                sampling.as_arrays(B), max_new=max_new, spec_k=K,
                ngram=n, chunk=min(chunk, prompt_pad),
                prompt_pad=prompt_pad, mode=sampling.mode())
            buf = to_host(buf)
            emitted = to_host(emitted)
            return [buf[b, lens[b]:lens[b] + int(emitted[b])].tolist()
                    for b in range(B)]
        finally:
            for ps in pages:
                for p in ps:
                    self.allocator.free(p)

    def generate_batch(self, prompts: Sequence[Sequence[int]],
                       max_new_tokens: Optional[int] = None,
                       sampling: Optional[SamplingParams] = None,
                       seed: Optional[int] = None) -> List[List[int]]:
        """Static-batch generation (continuous batching lives in
        ``scheduler/``)."""
        sampling = sampling or self._default_sampling()
        max_new = max_new_tokens or self.runtime.max_new_tokens
        state = self.prefill(prompts, seed=seed, sampling=sampling)
        outs: List[List[int]] = [[int(t)] for t in state.last_tokens]
        try:
            for _ in range(max_new - 1):
                if state.finished.all():
                    break
                prev_finished = state.finished.copy()
                toks = self.decode(state, sampling)
                for b, t in enumerate(toks):
                    if not prev_finished[b]:
                        outs[b].append(int(t))
            return outs
        finally:
            self.free(state)
