"""Continuous-batching scheduler.

The component the reference lacks entirely (SURVEY.md §2.3: all serving
paths decode sequences one-at-a-time in Python loops,
``web/app.py:122-131``). Design, TPU-first:

* **fixed decode lanes** — the decode step always runs with
  ``max_batch_size`` rows so one compiled program serves every step;
  idle lanes point at the dump page and their samples are discarded;
* **paged admission** — a request is admitted when a lane is free and
  the page budget covers its prompt + one decode page; its prompt is
  chunk-prefilled into the shared pool (prompt lengths are bucketed to
  chunk multiples so admission hits a handful of compiled shapes);
* **exact eviction** — pages of live requests are never dropped (the
  reference's LRU silently discards live context); when the pool runs
  dry the *youngest* running request is preempted and re-queued for
  full re-prefill;
* single-threaded: the scheduler owns the allocator and all mutable
  state (SURVEY.md §5.2); servers pump :meth:`step` from one thread.
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrameworkConfig
from ..engine.engine import Engine
from ..engine.sampling import SamplingParams
from ..kvcache.allocator import OutOfPagesError
from ..kvcache.swap import gather_pages, scatter_pages
from ..utils.common import cdiv


class RequestState(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    FAILED = "failed"


_END = object()


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 64
    sampling: Optional[SamplingParams] = None
    req_id: int = 0
    state: RequestState = RequestState.WAITING
    arrived_at: float = dataclasses.field(default_factory=time.time)
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    error: Optional[str] = None
    # host-swapped KV of a preempted request: (blobs, seq_len, last_token)
    swap: Optional[tuple] = None
    _out: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)

    def stream(self):
        """Blocking iterator over generated tokens."""
        while True:
            item = self._out.get()
            if item is _END:
                return
            yield item

    @property
    def ttft_s(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.arrived_at


@dataclasses.dataclass
class _Lane:
    request: Optional[Request] = None
    pages: List[int] = dataclasses.field(default_factory=list)
    seq_len: int = 0
    last_token: int = 0

    @property
    def free(self) -> bool:
        return self.request is None


class Scheduler:
    """Owns the engine's page pool and a fixed set of decode lanes."""

    def __init__(self, engine: Engine):
        assert engine.dp == 1, "the scheduler drives one data shard"
        self.engine = engine
        self.config: FrameworkConfig = engine.config
        self.B = self.config.runtime.max_batch_size
        self.page = engine.cache.page_size
        self.lanes = [_Lane() for _ in range(self.B)]
        self.waiting: "queue.Queue[Request]" = queue.Queue()
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self.kv = engine._init_cache()
        self.rng = jax.random.key(self.config.runtime.seed)
        self._samp = self._default_sampling()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # -- public API ------------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 64,
               sampling: Optional[SamplingParams] = None) -> Request:
        req = Request(prompt=list(prompt), max_new_tokens=max_new_tokens,
                      sampling=sampling, req_id=next(self._ids))
        self.waiting.put(req)
        return req

    def step(self) -> int:
        """Admit + decode one step. Returns number of active lanes."""
        with self._lock:
            self._admit()
            return self._decode_step()

    def run_until_idle(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if self.step() == 0 and self.waiting.empty():
                return

    def start(self, poll_interval_s: float = 0.002) -> None:
        """Background pump thread (used by servers)."""
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                if self.step() == 0 and self.waiting.empty():
                    time.sleep(poll_interval_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def resize(self, new_num_pages: int) -> None:
        """Live-resize the page pool (``KVTileCache::resize``): grow to
        admit more concurrent context, or shrink to release HBM. Live
        pages are never dropped (shrink raises if any would be). The
        jitted steps recompile for the new pool shape on next use."""
        from ..kvcache.pool import resize_pool

        with self._lock:
            self.engine.allocator.resize(new_num_pages)
            self.kv = resize_pool(self.kv, new_num_pages)
            self.engine.cache.num_pages = new_num_pages

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # -- internals ---------------------------------------------------------------

    def _default_sampling(self) -> SamplingParams:
        r = self.config.runtime
        return SamplingParams(
            temperature=r.temperature, top_k=r.top_k, top_p=r.top_p,
            eos_token_id=r.eos_token_id, eos_threshold=r.eos_threshold)

    def _pages_needed(self, req: Request) -> int:
        if req.swap is not None:
            return len(req.swap[1]) + 1        # live pages + growth room
        return cdiv(len(req.prompt) + 1, self.page)

    def _prefix_tag(self, tokens: Sequence[int], n_pages: int):
        """Content tag for page ``n_pages-1``: the full token prefix
        through that page (attention output depends on the whole
        prefix, so a page is only reusable under an identical one)."""
        return hash(tuple(tokens[: n_pages * self.page]))

    def _admit(self) -> None:
        alloc = self.engine.allocator
        while not self.waiting.empty():
            free_lane = next((l for l in self.lanes if l.free), None)
            if free_lane is None:
                return
            req = self.waiting.queue[0]
            if self._pages_needed(req) > alloc.num_free:
                return                      # page pressure: keep queued
            req = self.waiting.get()
            try:
                self._prefill_into(free_lane, req)
            except OutOfPagesError:
                req.state = RequestState.WAITING
                self.waiting.put(req)       # try again later
                return

    def _prefill_into(self, lane: _Lane, req: Request) -> None:
        if req.swap is not None:
            return self._swap_in(lane, req)
        eng = self.engine
        L = len(req.prompt)
        n_pages = cdiv(L, self.page)

        # prefix cache: reclaim freed pages whose content (full prefix
        # through the page) matches — their KV is still in the pool, so
        # prefill can skip those tokens entirely
        hits: List[int] = []
        if self.config.cache.enable_prefix_cache:
            for j in range(1, n_pages + 1):
                if j * self.page > L:       # partial last page: not cached
                    break
                page = eng.allocator.lookup_freed(
                    self._prefix_tag(req.prompt, j))
                if page is None:
                    break
                hits.append(page)
        skip = len(hits) * self.page
        pages = hits + eng.allocator.alloc_many(n_pages - len(hits))
        chunk = cdiv(max(self.config.runtime.prefill_chunk, 1),
                     self.page) * self.page
        # bucket padded length to chunk multiples: few compiled shapes
        max_len = cdiv(max(L, 1), chunk) * chunk

        tokens = np.zeros((1, max_len), np.int32)
        tokens[0, :L] = req.prompt
        bt = np.zeros((1, eng.cache.max_pages_per_seq), np.int32)
        bt[0, :len(pages)] = pages
        bt_dev = jnp.asarray(bt)
        lens = jnp.asarray([L], jnp.int32)

        # first chunk that must run: the first miss, but never past the
        # chunk holding the last prompt token (its logits seed sampling)
        start = min((skip // chunk) * chunk, ((L - 1) // chunk) * chunk)
        final_logits = jnp.zeros((1, eng.cfg.vocab_size), jnp.float32)
        for c0 in range(start, max_len, chunk):
            c1 = min(c0 + chunk, max_len)
            pos = c0 + np.arange(c1 - c0)[None, :]
            pos = np.where(pos < L, pos, -1)
            logits, self.kv = eng._prefill_fn(
                eng.params, jnp.asarray(tokens[:, c0:c1]),
                jnp.asarray(pos), self.kv, bt_dev,
                jnp.asarray([min(L, c1)], jnp.int32),
                jnp.asarray([c0], jnp.int32), lens)
            final_logits = final_logits + logits

        samp = req.sampling or self._samp
        self.rng, sub = jax.random.split(self.rng)
        tok = int(np.asarray(eng._sample_fn(
            final_logits, sub, mode=samp.mode(), **samp.as_arrays(1)))[0])

        lane.request = req
        lane.pages = pages
        lane.seq_len = L
        lane.last_token = tok
        req.state = RequestState.RUNNING
        req.first_token_at = time.time()
        self._deliver(lane, tok)

    def _swap_out(self, lane: _Lane) -> None:
        """Preempt by moving the lane's KV pages to host RAM; the
        request resumes via :meth:`_swap_in` with no re-prefill. Only
        live pages transfer — dump-page placeholders left by
        sliding-window reclamation keep their slot positions but cost
        no PCIe traffic and no pages on resume."""
        req = lane.request
        live_slots = [j for j, p in enumerate(lane.pages) if p != 0]
        blobs = gather_pages(self.kv, [lane.pages[j] for j in live_slots])
        req.swap = (blobs, live_slots, len(lane.pages), lane.seq_len,
                    lane.last_token)
        for p in lane.pages:
            if p != 0:                 # skip dump-page placeholders
                self.engine.allocator.free(p)
        lane.pages = []
        lane.request = None
        lane.seq_len = 0
        req.state = RequestState.WAITING
        self.waiting.put(req)

    def _swap_in(self, lane: _Lane, req: Request) -> None:
        blobs, live_slots, n_slots, seq_len, last_token = req.swap
        fresh = self.engine.allocator.alloc_many(len(live_slots))
        if fresh:
            self.kv = scatter_pages(self.kv, blobs, fresh)
        pages = [0] * n_slots
        for j, p in zip(live_slots, fresh):
            pages[j] = p
        req.swap = None
        lane.request = req
        lane.pages = pages
        lane.seq_len = seq_len
        lane.last_token = last_token
        req.state = RequestState.RUNNING

    def _deliver(self, lane: _Lane, tok: int) -> None:
        req = lane.request
        req.tokens.append(tok)
        req._out.put(tok)
        samp = req.sampling or self._samp
        done = (len(req.tokens) >= req.max_new_tokens
                or (samp.eos_token_id >= 0 and tok == samp.eos_token_id))
        if done:
            self._release(lane, RequestState.FINISHED)

    def _release(self, lane: _Lane, state: RequestState,
                 requeue: bool = False) -> None:
        req = lane.request
        tags = {}
        if (self.config.cache.enable_prefix_cache
                and state == RequestState.FINISHED):
            # tag complete pages with their content prefix so an
            # identical future prompt reuses them without re-prefill
            seq = req.prompt + req.tokens
            for j in range(1, lane.seq_len // self.page + 1):
                if lane.pages[j - 1] != 0:
                    tags[lane.pages[j - 1]] = self._prefix_tag(seq, j)
        for p in lane.pages:
            if p != 0:                 # skip dump-page placeholders
                self.engine.allocator.free(p, tag=tags.get(p))
        lane.pages = []
        lane.request = None
        lane.seq_len = 0
        if requeue:
            req.state = RequestState.WAITING
            req.tokens = []
            self.waiting.put(req)
            return
        req.state = state
        req.finished_at = time.time()
        req._out.put(_END)

    def _reclaim_window_pages(self) -> None:
        """Sliding-window models: pages wholly below every live query's
        window are unreachable forever — free them (Mistral-style
        rolling buffer, done at page granularity). Freed block-table
        slots point at the dump page."""
        w = self.config.model.sliding_window
        if w <= 0:
            return
        for lane in self.lanes:
            if lane.free:
                continue
            # next decode query sits at position seq_len; keys
            # <= seq_len - w are out of its (and every later) window
            dead_below = lane.seq_len + 1 - w
            n_dead = max(dead_below // self.page, 0)
            for j in range(n_dead):
                if lane.pages[j] != 0:
                    self.engine.allocator.free(lane.pages[j])
                    lane.pages[j] = 0          # dump-page placeholder

    def _grow_pages(self) -> None:
        """Ensure every active lane has a page for this step's token;
        preempt the youngest lane on pool exhaustion (never drop live
        pages — unlike the reference's silent LRU eviction)."""
        self._reclaim_window_pages()
        active = [l for l in self.lanes if not l.free]
        while True:
            try:
                for lane in active:
                    need = cdiv(lane.seq_len + 1, self.page)
                    while len(lane.pages) < need:
                        lane.pages.extend(
                            self.engine.allocator.alloc_many(1))
                return
            except OutOfPagesError:
                victim = max(active,
                             key=lambda l: l.request.arrived_at)
                if self.config.cache.enable_swap:
                    self._swap_out(victim)
                else:
                    self._release(victim, RequestState.WAITING,
                                  requeue=True)
                active.remove(victim)
                if not active:
                    return

    def _decode_step(self) -> int:
        active = [l for l in self.lanes if not l.free]
        if not active:
            return 0
        self._grow_pages()
        active = [l for l in self.lanes if not l.free]
        if not active:
            return 0

        eng = self.engine
        bt = np.zeros((self.B, eng.cache.max_pages_per_seq), np.int32)
        sl = np.zeros((self.B,), np.int32)
        toks = np.zeros((self.B,), np.int32)
        for i, lane in enumerate(self.lanes):
            if lane.free:
                continue
            bt[i, :len(lane.pages)] = lane.pages
            sl[i] = lane.seq_len
            toks[i] = lane.last_token

        samp = self._samp        # per-request sampling: values per lane
        vals = {k: [] for k in ("temperature", "top_k", "top_p",
                                "eos_token_id", "eos_threshold")}
        for lane in self.lanes:
            s = (lane.request.sampling if lane.request and
                 lane.request.sampling else samp)
            vals["temperature"].append(s.temperature)
            vals["top_k"].append(s.top_k)
            vals["top_p"].append(s.top_p)
            vals["eos_token_id"].append(s.eos_token_id)
            vals["eos_threshold"].append(s.eos_threshold)
        samp_arrays = {
            "temperature": jnp.asarray(vals["temperature"], jnp.float32),
            "top_k": jnp.asarray(vals["top_k"], jnp.int32),
            "top_p": jnp.asarray(vals["top_p"], jnp.float32),
            "eos_token_id": jnp.asarray(vals["eos_token_id"], jnp.int32),
            "eos_threshold": jnp.asarray(vals["eos_threshold"],
                                         jnp.float32),
        }
        # compile mode = union of the active requests' features (at most
        # a handful of mode combinations ever get compiled)
        from ..engine.sampling import SampleMode

        active_s = [l.request.sampling or samp for l in active]
        mode = SampleMode(
            greedy=all(s.temperature <= 0 for s in active_s),
            use_filter=any(s.top_k > 0 or s.top_p < 1.0 for s in active_s),
            use_eos_threshold=any(
                s.eos_threshold > 0 and s.eos_token_id >= 0
                for s in active_s),
            # capped candidate set only if EVERY lane's k fits it (the
            # capped filter clips k into [1, cap], which would corrupt
            # lanes running without top-k)
            filter_cap=64 if all(0 < s.top_k <= 64 for s in active_s)
            else 0)

        next_tok, self.kv, self.rng = eng._decode_fn(
            eng.params, jnp.asarray(toks), self.kv, jnp.asarray(bt),
            jnp.asarray(sl), self.rng, samp_arrays, mode=mode)
        next_np = np.asarray(next_tok)

        n_active = 0
        for i, lane in enumerate(self.lanes):
            if lane.free:
                continue
            lane.seq_len += 1
            lane.last_token = int(next_np[i])
            self._deliver(lane, lane.last_token)
            if not lane.free:
                n_active += 1
        return n_active
