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
                 length_penalty: float = 0.0):
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

        for _ in range(max_new_tokens - 1):
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
                cands = zip(np.asarray(p2), np.asarray(t2),
                            np.asarray(v2, np.float64))
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

        for i in range(W):
            if alive[i]:
                finished.append(BeamHypothesis(beam_tokens[i],
                                               float(beam_scores[i])))
        eng.free(state)

        def key(h: BeamHypothesis) -> float:
            if self.length_penalty > 0:
                return h.score / (len(h.tokens) ** self.length_penalty)
            return h.score

        finished.sort(key=key, reverse=True)
        return finished[: num_return or W]


def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    m = x.max()
    e = np.exp(x - m)
    return x - m - math.log(e.sum())
