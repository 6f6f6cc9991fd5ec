"""Stepwise beam search with copy-on-write KV pages.

What the reference *intended* (beam-keyed page table
``kv_cache/page_table.hpp:14,41``, per-tile rerank scores in the kernel)
but never built — its "beam search" is N independent full generations
re-streamed afterwards (``api/router.py:58-80``, SURVEY.md §3.3). Here:

* the prompt is prefilled **once**; all beams share its pages by
  refcount (``PageAllocator.fork``);
* each step scores all beams in one batched teacher-forced decode,
  expands to the top ``beam_width`` (parent, token) pairs by cumulative
  log-probability, and re-wires the beams' block tables to their
  parents' pages — sharing full pages read-only;
* before a beam appends into a page another beam also references, the
  page goes through ``ensure_exclusive`` and is copied on device
  (copy-on-write) — only partial tail pages are ever copied;
* finished beams (EOS) are frozen and the final candidates can be
  re-scored by a :mod:`..reranker` scorer.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.common import cdiv
from .engine import Engine, EngineState


@dataclasses.dataclass
class BeamHypothesis:
    tokens: List[int]
    score: float                       # cumulative log-prob

    @property
    def normalized_score(self) -> float:
        return self.score / max(len(self.tokens), 1)


def _copy_pages_fn(engine: Engine):
    """Jitted device copy of pool pages src[i] -> dst[i] (COW).

    Cached on the engine: a fresh jit per BeamSearcher would recompile
    per beam request (and per distinct copy count)."""
    if engine._copy_pages_fn is not None:
        return engine._copy_pages_fn

    from ..kvcache.pool import copy_pages_tree

    @functools.partial(jax.jit, donate_argnums=(0,))
    def copy_pages(kv, src, dst):
        return copy_pages_tree(kv, src, dst)

    engine._copy_pages_fn = copy_pages
    return copy_pages


class BeamSearcher:
    """Beam decoding against one :class:`Engine` (single data shard).

    Runs over its own KV pool *and* its own page allocator (a private
    :class:`EngineState`), so beam requests coexist with a live
    continuous-batching scheduler on the same engine — no shared mutable
    host state, no pausing (ADVICE round 1: ``stream_chat_beam`` used to
    stop the scheduler pump for the whole search)."""

    def __init__(self, engine: Engine, beam_width: int = 4,
                 length_penalty: float = 0.0,
                 burst: Optional[int] = None):
        assert engine.dp == 1, "beam search runs per data shard"
        self.engine = engine
        self.W = beam_width
        self.length_penalty = length_penalty
        self._copy_pages = _copy_pages_fn(engine)
        from ..kvcache.native import make_allocator

        self.allocator = make_allocator(
            engine.cache.num_pages,
            native=engine.cache.native_allocator)
        # fused device-side expansion (forward + flat top-2W in one
        # dispatch); meshed engines keep decode_forced + host selection
        self._beam_step = (engine._build_decode_beam()
                           if engine.mesh is None else None)
        # multi-step beam bursts (selection + COW + block-table rewire
        # on device, host touched once per burst); 1 disables
        self.burst = (engine.config.runtime.beam_burst
                      if burst is None else burst)
        # an explicit ctor burst pins the length; the config default
        # extends to beam_burst_max when the step budget allows
        self.burst_max = (max(self.burst,
                              engine.config.runtime.beam_burst_max)
                          if burst is None else self.burst)
        self._beam_burst = (engine._build_decode_beam_burst()
                            if engine.mesh is None and self.burst > 1
                            else None)

    # -- page bookkeeping ---------------------------------------------------

    def _fork_rows(self, state: EngineState, parents: np.ndarray,
                   defer: bool = False):
        """Re-wire each beam row to its parent's pages (shared), making
        the tail page exclusive (device COW copy) so the next append
        cannot clobber a sibling."""
        alloc = self.allocator
        page_size = self.engine.cache.page_size
        old_pages = state.pages
        new_pages: List[List[int]] = []
        copies_src: List[int] = []
        copies_dst: List[int] = []
        for p in parents:
            shared = alloc.fork(old_pages[int(p)])
            new_pages.append(shared)
        # release the old rows' references
        for ps in old_pages:
            for pg in ps:
                alloc.free(pg)
        # make each row's tail page exclusive (it will be appended into)
        for row, ps in enumerate(new_pages):
            if not ps:
                continue
            tail = ps[-1]
            excl, copied = alloc.ensure_exclusive(tail)
            if copied:
                copies_src.append(tail)
                copies_dst.append(excl)
                ps[-1] = excl
        # pad to W so one program shape serves every step (a no-op
        # dump-page self-copy fills unused slots)
        while len(copies_src) < len(new_pages):
            copies_src.append(0)
            copies_dst.append(0)
        state.pages = new_pages
        state.block_tables = self.engine._block_tables(new_pages)
        if defer:
            # caller folds the copies into its next fused device step
            return (np.asarray(copies_src, np.int32),
                    np.asarray(copies_dst, np.int32))
        if any(copies_src):
            state.kv = self._copy_pages(
                state.kv, jnp.asarray(copies_src, jnp.int32),
                jnp.asarray(copies_dst, jnp.int32))
        return None

    # -- search ---------------------------------------------------------------

    def search(self, prompt: Sequence[int], max_new_tokens: int,
               eos_token_id: int = -1,
               num_return: Optional[int] = None) -> List[BeamHypothesis]:
        """Run beam search; returns hypotheses sorted by normalized score."""
        eng, W = self.engine, self.W
        # the prompt is prefilled ONCE (batch 1); the W beam rows then
        # share its pages by refcount (the reference's intent — beam-
        # keyed page table, kv_cache/page_table.hpp:14,41 — where its
        # actual implementation regenerated per beam, api/router.py:64)
        state = eng.prefill([prompt], allocators=[self.allocator])
        logits0 = state.prefill_logits[0]
        L = int(state.seq_lens[0])
        state.seq_lens = np.full((W,), L, np.int32)
        state.last_tokens = np.zeros((W,), np.int32)
        state.finished = np.zeros((W,), bool)
        parents0 = np.zeros((W,), np.int32)
        fused = self._beam_step is not None
        # 1 row -> W refcount-shared rows; with the fused step the COW
        # copies ride the next device step instead of their own dispatch
        pending = self._fork_rows(state, parents0, defer=fused)

        logprobs = _log_softmax(logits0)
        top = np.argsort(-logprobs)[:W]
        beam_tokens: List[List[int]] = [[int(t)] for t in top]
        beam_scores = np.array([logprobs[t] for t in top], np.float64)
        finished: List[BeamHypothesis] = []
        alive = np.ones((W,), bool)
        if eos_token_id >= 0:
            for i, t in enumerate(top):
                if int(t) == eos_token_id:
                    finished.append(BeamHypothesis([int(t)],
                                                   float(beam_scores[i])))
                    alive[i] = False

        steps = max_new_tokens - 1
        try:
            if self._beam_burst is not None and steps > 0 and alive.any():
                (beam_tokens, beam_scores, alive, pending, steps) = \
                    self._search_bursts(state, beam_tokens, beam_scores,
                                        alive, pending, finished,
                                        eos_token_id, steps)
            beam_tokens, beam_scores, alive = self._search_steps(
                state, beam_tokens, beam_scores, alive, pending, finished,
                eos_token_id, steps, fused)
        finally:
            # free on ANY exit so a mid-search error cannot leak the
            # search's live pages for the server's lifetime (ADVICE r4)
            eng.free(state)

        for i in range(W):
            if alive[i]:
                finished.append(BeamHypothesis(beam_tokens[i],
                                               float(beam_scores[i])))

        def key(h: BeamHypothesis) -> float:
            if self.length_penalty > 0:
                return h.score / (len(h.tokens) ** self.length_penalty)
            return h.score

        finished.sort(key=key, reverse=True)
        return finished[: num_return or W]

    def _search_bursts(self, state: EngineState, beam_tokens, beam_scores,
                       alive, pending, finished, eos_token_id: int,
                       steps: int):
        """Run beam expansion in device bursts (``Engine.
        _build_decode_beam_burst``): the host uploads once, the device
        runs ``burst`` selection+COW+rewire steps, and the host then
        replays the identical page arithmetic to sync the allocator and
        reconstructs the hypotheses from the returned traces. Falls
        back (returning the remaining step budget) when the fresh-page
        pool for a burst cannot be allocated."""
        eng, W = self.engine, self.W
        from ..kvcache.allocator import OutOfPagesError

        mp = eng.cache.max_pages_per_seq
        page = eng.cache.page_size
        if pending is None:
            pending = (np.zeros((W,), np.int32), np.zeros((W,), np.int32))
        while steps > 0 and alive.any():
            # burst length: pow2 bucket of min(remaining steps,
            # burst_max) — overshooting the STEP budget is fine (the
            # tail of the scan is discarded) but overshooting the PAGE
            # budget is not (replay would push block tables past their
            # width; ADVICE r4). Longer bursts = fewer D2H syncs, each
            # of which costs a host/tunnel round trip.
            page_budget = mp * page - 1 - int(state.seq_lens[0])
            K = 1
            while K < min(self.burst_max, max(steps, 1)):
                K *= 2
            while K > page_budget:
                K //= 2
            # fresh-page pool for the burst, halving on pool pressure
            fresh_flat = None
            while K >= 1:
                try:
                    fresh_flat = self.allocator.alloc_many(K * W)
                    break
                except OutOfPagesError:
                    K //= 2
            if K < 1 or fresh_flat is None:
                break                      # per-step path for the rest
            fresh = np.asarray(fresh_flat, np.int32).reshape(K, W)
            # cover this burst's first append slot (per-row exclusive
            # page when L lands on a page boundary)
            for b in range(W):
                eng._alloc_pages(state, b, int(state.seq_lens[b]) + 1)
            state.block_tables = eng._block_tables(state.pages)
            toks_in = np.asarray([bt[-1] for bt in beam_tokens], np.int32)
            pars, toks, vals, alives, _, _, csrc, cdst, state.kv = \
                self._beam_burst(
                    eng.params, jnp.asarray(toks_in), state.kv,
                    jnp.asarray(state.block_tables),
                    jnp.asarray(state.seq_lens),
                    jnp.asarray(beam_scores, jnp.float32),
                    jnp.asarray(alive),
                    jnp.asarray(pending[0]), jnp.asarray(pending[1]),
                    jnp.asarray(fresh),
                    jnp.asarray(eos_token_id, jnp.int32), num_steps=K)
            # ONE batched fetch: serial np.asarray calls pay a full
            # device/tunnel round trip EACH (~28 ms x 6 arrays per
            # burst — most of the round-4 beam wall gap)
            pars, toks, vals, alives, csrc, cdst = jax.device_get(
                (pars, toks, vals, alives, csrc, cdst))
            vals = np.asarray(vals, np.float64)
            pending = (csrc, cdst)
            self._replay_burst(state, pars, fresh)
            for k in range(K):
                if steps <= 0 or not alive.any():
                    break                  # overshoot steps are garbage
                beam_tokens = [beam_tokens[int(p)] + [int(t)]
                               for p, t in zip(pars[k], toks[k])]
                beam_scores = vals[k]
                if eos_token_id >= 0:
                    for i in range(W):
                        if (vals[k][i] > -1e29
                                and int(toks[k][i]) == eos_token_id):
                            finished.append(BeamHypothesis(
                                beam_tokens[i], float(vals[k][i])))
                alive = alives[k].copy()
                steps -= 1
        return beam_tokens, beam_scores, alive, pending, steps

    def _replay_burst(self, state: EngineState, pars: np.ndarray,
                      fresh: np.ndarray) -> None:
        """Replay the burst's deterministic page arithmetic against the
        real allocator: per step, each row forks its parent's pages and
        its next-append page is replaced by the step's fresh page on a
        page crossing or when the row is not the first chooser of its
        parent — bitwise the device rule, so the host block tables and
        refcounts match the device's carried state. Unused fresh pages
        return to the pool."""
        alloc = self.allocator
        page = self.engine.cache.page_size
        pages = state.pages
        sl = int(state.seq_lens[0])
        K, W = pars.shape
        used = set()
        for k in range(K):
            sl1 = sl + 1
            tidx = sl1 // page
            crossing = (sl1 % page) == 0
            newp = [alloc.fork(pages[int(p)]) for p in pars[k]]
            for ps in pages:
                for pg in ps:
                    alloc.free(pg)
            seen: set = set()
            for w in range(W):
                p = int(pars[k][w])
                taken = p in seen
                seen.add(p)
                f = int(fresh[k][w])
                if crossing:
                    assert len(newp[w]) == tidx
                    newp[w].append(f)
                    used.add(f)
                elif taken:
                    alloc.free(newp[w][tidx])
                    newp[w][tidx] = f
                    used.add(f)
            pages = newp
            sl = sl1
        for f in fresh.reshape(-1).tolist():
            if int(f) not in used:
                alloc.free(int(f))
        state.pages = pages
        state.seq_lens = np.full((W,), sl, np.int32)
        state.block_tables = self.engine._block_tables(pages)

    def _search_steps(self, state: EngineState, beam_tokens, beam_scores,
                      alive, pending, finished, eos_token_id: int,
                      steps: int, fused: bool):
        """Per-step beam expansion (one device dispatch per step)."""
        eng, W = self.engine, self.W
        for _ in range(steps):
            if not alive.any():
                break
            toks = np.asarray([bt[-1] for bt in beam_tokens], np.int32)
            if fused:
                # fused: COW copies + forward + selection in ONE
                # dispatch; 3 x 2W scalars D2H
                for b in range(W):
                    eng._alloc_pages(state, b, int(state.seq_lens[b]) + 1)
                state.block_tables = eng._block_tables(state.pages)
                if pending is None:
                    pending = (np.zeros((W,), np.int32),
                               np.zeros((W,), np.int32))
                p2, t2, v2, state.kv = self._beam_step(
                    eng.params, jnp.asarray(toks), state.kv,
                    jnp.asarray(state.block_tables),
                    jnp.asarray(state.seq_lens),
                    jnp.asarray(beam_scores, jnp.float32),
                    jnp.asarray(alive),
                    jnp.asarray(pending[0]), jnp.asarray(pending[1]))
                pending = None
                state.seq_lens += 1
                p2, t2, v2 = jax.device_get((p2, t2, v2))
                cands = zip(p2, t2, np.asarray(v2, np.float64))
            else:
                step_logits = eng.decode_forced(state, toks)   # [W, V]
                lp = np.stack([_log_softmax(row) for row in step_logits])
                # dead rows cannot spawn candidates
                lp[~alive] = -1e30
                cand = beam_scores[:, None] + lp               # [W, V]
                flat = np.argsort(-cand.reshape(-1))[: 2 * W]
                cands = ((*divmod(int(f), lp.shape[1]),
                          cand.reshape(-1)[f]) for f in flat)
            parents, tokens, scores = [], [], []
            for p, t, s in cands:
                p, t = int(p), int(t)
                if not alive[p] or s < -1e29:
                    continue
                parents.append(p)
                tokens.append(t)
                scores.append(s)
                if len(parents) == W:
                    break
            parents = np.asarray(parents, np.int32)

            new_beam_tokens = [beam_tokens[p] + [t]
                               for p, t in zip(parents, tokens)]
            beam_scores = np.asarray(scores, np.float64)
            beam_tokens = new_beam_tokens
            pending = self._fork_rows(state, parents, defer=fused)
            state.last_tokens = np.asarray(tokens, np.int32)
            alive = np.ones((W,), bool)
            if eos_token_id >= 0:
                for i, t in enumerate(tokens):
                    if t == eos_token_id:
                        finished.append(BeamHypothesis(
                            beam_tokens[i], float(beam_scores[i])))
                        alive[i] = False
        return beam_tokens, beam_scores, alive


def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    m = x.max()
    e = np.exp(x - m)
    return x - m - math.log(e.sum())
