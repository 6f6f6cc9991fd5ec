"""Continuous-batching scheduler.

The component the reference lacks entirely (SURVEY.md §2.3: all serving
paths decode sequences one-at-a-time in Python loops,
``web/app.py:122-131``). Design, TPU-first:

* **fixed decode lanes** — decode always runs with ``max_batch_size``
  rows so a handful of compiled programs serve every step; idle lanes
  point at the dump page and their samples are discarded;
* **decode bursts** — each tick runs ``runtime.decode_burst`` decode
  steps as ONE device program (`Engine._build_decode_loop`): lanes
  freeze on device at EOS or their token budget, and the host syncs
  once per burst for delivery/admission. This amortizes the
  per-dispatch latency (~28 ms through a remote chip) that made
  per-token stepping several× slower than the fused engine path;
* **interleaved chunked prefill** — admission creates a *prefill job*
  (the prompt bucketed to chunk multiples); each tick runs at most
  ``runtime.prefill_chunks_per_tick`` chunks per lane and then a decode
  burst, so running lanes keep emitting while a long prompt prefills
  (no head-of-line blocking);
* **paged admission** — a request is admitted when a lane is free and
  the page budget covers its prompt + one decode page;
* **exact eviction** — pages of live requests are never dropped (the
  reference's LRU silently discards live context); when the pool runs
  dry the *youngest* running request is preempted: its KV either swaps
  to host RAM (``cache.enable_swap``) or the request re-queues and its
  already-delivered tokens are teacher-forced on re-prefill — clients
  never see duplicated output;
* **failure isolation** (SURVEY.md §5.3) — invalid requests fail at
  submit (page budget vs ``max_pages_per_seq`` and pool size), a
  prefill error fails only that request, a decode error resets device
  state (pool reinit + prefix-cache invalidation) while the pump
  thread and every other queued request survive; per-request
  wall-clock timeouts mark requests FAILED;
* single-threaded: the scheduler owns the allocator and all mutable
  state (SURVEY.md §5.2); servers pump :meth:`step` from one thread.
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
import math
import queue
import threading
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrameworkConfig
from ..engine.engine import Engine
from ..engine.sampling import (BIAS_SLOTS, STOP_SLOTS, SampleMode,
                               SamplingParams, batch_arrays_np,
                               bump_counts, request_key)
from ..kvcache.allocator import OutOfPagesError
from ..kvcache.swap import gather_pages, scatter_pages
from ..utils.common import cdiv
from ..utils.logging import log_event


def _union_mode(samplings) -> SampleMode:
    """Compile mode = union of a batch's sampling features, shared by
    the decode-burst plan and the batched prefill-finish sampler (one
    definition so new sampler features cannot diverge between them)."""
    ss = list(samplings)
    return SampleMode(
        greedy=all(s.temperature <= 0 for s in ss),
        use_filter=any(s.top_k > 0 or s.top_p < 1.0 for s in ss),
        use_min_p=any(s.min_p > 0.0 for s in ss),
        use_eos_threshold=any(
            s.eos_threshold > 0 and s.eos_token_id >= 0 for s in ss),
        # capped candidate set only if EVERY row's k fits it (the
        # capped filter clips k into [1, cap], which would corrupt
        # rows running without top-k)
        filter_cap=64 if all(0 < s.top_k <= 64 for s in ss) else 0,
        use_penalties=any(s.has_penalties for s in ss),
        use_logit_bias=any(s.logit_bias for s in ss))


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
    seed: int = 0                   # per-request sampling seed
    timeout_s: float = 0.0          # 0 = no per-request timeout
    state: RequestState = RequestState.WAITING
    arrived_at: float = dataclasses.field(default_factory=time.time)
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    error: Optional[str] = None
    # host-swapped KV of a preempted request (see Scheduler._swap_out)
    swap: Optional[tuple] = None
    _out: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)

    def stream(self):
        """Blocking iterator over generated tokens. Check
        :attr:`error` / :attr:`state` after exhaustion — a FAILED
        request's stream ends early instead of raising."""
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
class _PrefillJob:
    """Resumable chunked prefill of one lane's prompt (or, on
    preemption re-admission, prompt + already-delivered tokens minus
    the last one, which is teacher-forced so nothing re-delivers)."""

    tokens: np.ndarray              # [1, max_len] int32, chunk-bucketed
    bt: np.ndarray                  # [1, max_pages] block table (host)
    L: int                          # live sequence length
    chunk: int
    max_len: int
    pos: int                        # next chunk offset to run
    final_logits: jax.Array         # [1, V] accumulator
    resume_token: Optional[int]     # set => skip sampling, seed decode

    @property
    def done(self) -> bool:
        return self.pos >= self.max_len


@dataclasses.dataclass
class _Lane:
    idx: int = 0                    # lane index == decode batch row
    request: Optional[Request] = None
    pages: List[int] = dataclasses.field(default_factory=list)
    seq_len: int = 0
    last_token: int = 0
    prefill: Optional[_PrefillJob] = None

    @property
    def free(self) -> bool:
        return self.request is None

    @property
    def decoding(self) -> bool:
        return self.request is not None and self.prefill is None


class Scheduler:
    """Owns the engine's page pool and a fixed set of decode lanes."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.config: FrameworkConfig = engine.config
        self.B = self.config.runtime.max_batch_size
        self.dp = engine.dp
        if self.B % self.dp != 0:
            raise ValueError(
                f"max_batch_size={self.B} must divide dp={self.dp}")
        # dp > 1: swap translates each lane's shard-local page ids into
        # global pool indices (_page_base) and re-pins the pool's
        # sharding after the scatter — see _swap_in/_swap_out
        self.page = engine.cache.page_size
        self.lanes = [_Lane(idx=i) for i in range(self.B)]
        # lane i's pages live in the sub-pool of data shard i*dp//B
        # (contiguous batch split, matching Engine._shard_of)
        self._lane_shard = [engine._shard_of(i, self.B)
                            for i in range(self.B)]
        self.waiting: "queue.Queue[Request]" = queue.Queue()
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self.kv = engine._init_cache()
        self._samp = self._default_sampling()
        # (lane occupancy key) -> (device sampling arrays, SampleMode):
        # these only change when a lane's request changes, so the burst
        # loop reuses the uploaded arrays across ticks instead of
        # re-device-putting 5 per-lane vectors every burst
        self._samp_cache: Optional[tuple] = None
        # uploaded gang sampling batches, keyed on the rows' value keys
        self._gsamp_cache: dict = {}
        self._zero_logits: Optional[jax.Array] = None
        # penalty histograms: [B, V] int32, lane rows seeded at
        # admission from prompt(+resumed tokens); allocated lazily the
        # first time a request with penalties admits. Bursts whose
        # compile mode has penalties off get the [B, 1] dummy instead,
        # so the common no-penalty program never carries the [B, V]
        # array (both are donated and reassigned every burst).
        self._counts: Optional[jax.Array] = None
        self._dummy_counts = jnp.zeros((self.B, 1), jnp.int32)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        # observability (served through /metrics)
        self.n_finished = 0
        self.n_failed = 0
        self.n_preempted = 0
        self.n_resets = 0

    # -- public API ------------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 64,
               sampling: Optional[SamplingParams] = None,
               seed: Optional[int] = None,
               timeout_s: Optional[float] = None) -> Request:
        rid = next(self._ids)
        req = Request(
            prompt=list(prompt), max_new_tokens=max_new_tokens,
            sampling=sampling, req_id=rid,
            seed=(seed if seed is not None
                  else (self.config.runtime.seed + rid * 7919))
            & 0x7FFFFFFF,
            timeout_s=(self.config.runtime.request_timeout_s
                       if timeout_s is None else timeout_s))
        err = self._validate(req)
        if err is not None:
            self._fail_request(req, err)
            return req
        self.waiting.put(req)
        return req

    def step(self) -> int:
        """One scheduler tick: expire -> admit -> prefill chunk(s) ->
        decode burst. Returns the number of occupied lanes.

        When some lanes finish prefill this tick (dp=1, no penalties),
        the tick runs *fused*: final chunk + first-token sampling +
        decode burst as chained device dispatches with no intervening
        host sync — one taxed dispatch per tick instead of three
        (see :meth:`_fused_tick`)."""
        with self._lock:
            self._expire()
            self._admit()
            out = self._fused_tick()
            if out is not None:
                return out
            self._prefill_tick()
            return self._decode_tick()

    def run_until_idle(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if self.step() == 0 and self.waiting.empty():
                return

    def start(self, poll_interval_s: float = 0.002) -> None:
        """Background pump thread (used by servers). A step exception
        cannot kill the pump: it is logged, the affected requests are
        failed inside :meth:`step`'s own handlers, and pumping
        continues (SURVEY.md §5.3 clean degradation)."""
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                try:
                    idle = self.step() == 0 and self.waiting.empty()
                except Exception as e:       # pragma: no cover - last resort
                    log_event("scheduler_step_error", error=repr(e))
                    idle = True
                if idle:
                    time.sleep(poll_interval_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def resize(self, new_num_pages: int) -> None:
        """Live-resize the page pool (``KVTileCache::resize``): grow to
        admit more concurrent context, or shrink to release HBM. Live
        pages are never dropped (shrink raises if any would be). The
        jitted steps recompile for the new pool shape on next use.

        dp > 1: ``new_num_pages`` is the GLOBAL page count; each data
        shard's sub-pool and allocator resize to its 1/dp share, and
        shard-local page ids stay valid because the pages axis is
        resized per shard (grow pads after each shard's pages, shrink
        truncates each shard's tail)."""
        from ..kvcache.pool import PAGES_AXIS, resize_pool

        if new_num_pages % self.dp != 0:
            raise ValueError(
                f"num_pages={new_num_pages} must divide dp={self.dp}")
        with self._lock:
            done = []
            try:
                for alloc in self.engine.allocators:
                    alloc.resize(new_num_pages // self.dp)
                    done.append(alloc)
            except Exception:
                old = self.engine.cache.num_pages // self.dp
                for alloc in done:     # roll back: keep shards uniform
                    alloc.resize(old)
                raise
            if self.dp == 1:
                self.kv = resize_pool(self.kv, new_num_pages)
            else:
                # per-shard resize: split the pages axis into dp shard
                # segments, resize each, and re-concatenate — local ids
                # keep addressing the same content per shard
                old_local = self.engine.cache.num_pages // self.dp
                new_local = new_num_pages // self.dp

                def one(leaf):
                    ax = leaf.ndim + PAGES_AXIS
                    parts = jnp.split(leaf, self.dp, axis=ax)
                    if new_local > old_local:
                        pad = [(0, 0)] * leaf.ndim
                        pad[ax] = (0, new_local - old_local)
                        parts = [jnp.pad(p, pad) for p in parts]
                    else:
                        idx = [slice(None)] * leaf.ndim
                        idx[ax] = slice(0, new_local)
                        parts = [p[tuple(idx)] for p in parts]
                    return jnp.concatenate(parts, axis=ax)

                self.kv = tuple(one(leaf) for leaf in self.kv)
            self._pin_kv_sharding()
            self.engine.cache.num_pages = new_num_pages

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _alloc_of(self, lane: _Lane):
        """Page allocator of the data shard owning this lane's rows."""
        return self.engine.allocators[self._lane_shard[lane.idx]]

    # -- admission / validation ------------------------------------------------

    def _default_sampling(self) -> SamplingParams:
        r = self.config.runtime
        return SamplingParams(
            temperature=r.temperature, top_k=r.top_k, top_p=r.top_p,
            min_p=r.min_p, repetition_penalty=r.repetition_penalty,
            presence_penalty=r.presence_penalty,
            frequency_penalty=r.frequency_penalty,
            eos_token_id=self.config.eos_token_id,
            eos_threshold=r.eos_threshold)

    def _validate(self, req: Request) -> Optional[str]:
        """Reject requests that could never run: empty prompts and page
        budgets that exceed the block-table width or the pool itself
        (ADVICE round 1: an over-budget request used to raise deep in
        the decode step and kill the pump thread)."""
        if len(req.prompt) < 1:
            return "empty prompt"
        if req.max_new_tokens < 1:
            return "max_new_tokens must be >= 1"
        horizon = len(req.prompt) + req.max_new_tokens
        need = cdiv(horizon, self.page)
        cap = self.engine.cache.max_pages_per_seq
        if need > cap:
            return (f"prompt+max_new_tokens={horizon} tokens needs {need} "
                    f"pages > max_pages_per_seq={cap}")
        usable = self.engine.cache.num_pages - 1       # page 0 = dump
        if need > usable:
            return (f"request needs {need} pages > pool capacity "
                    f"{usable}")
        return None

    def _prefill_seq(self, req: Request) -> List[int]:
        """The token sequence a (re-)admitted request must prefill:
        the prompt, plus — after a non-swap preemption — every
        already-delivered token except the last (teacher-forced; the
        last delivered token seeds the next decode step instead, so
        re-generation continues exactly where the client left off)."""
        if req.tokens:
            return req.prompt + req.tokens[:-1]
        return list(req.prompt)

    def _pages_needed(self, req: Request) -> int:
        if req.swap is not None:
            return len(req.swap[1]) + 1        # live pages + growth room
        return cdiv(len(self._prefill_seq(req)) + 1, self.page)

    def _prefix_tag(self, tokens: Sequence[int], n_pages: int):
        """Content tag for page ``n_pages-1``: the full token prefix
        through that page (attention output depends on the whole
        prefix, so a page is only reusable under an identical one)."""
        return hash(tuple(tokens[: n_pages * self.page]))

    def _expire(self) -> None:
        now = time.time()

        def expired(r: Request) -> bool:
            return r.timeout_s > 0 and now - r.arrived_at > r.timeout_s

        for lane in self.lanes:
            if not lane.free and expired(lane.request):
                lane.request.error = (
                    f"timed out after {lane.request.timeout_s:.1f}s")
                self._release(lane, RequestState.FAILED)
        with self.waiting.mutex:
            stale = [r for r in self.waiting.queue if expired(r)]
            for r in stale:
                self.waiting.queue.remove(r)
        # fail outside the queue mutex (_out.put wakes up consumers)
        for r in stale:
            self._fail_request(
                r, f"timed out in queue after {r.timeout_s:.1f}s")

    def _admit(self) -> None:
        while not self.waiting.empty():
            free_lanes = [l for l in self.lanes if l.free]
            if not free_lanes:
                return
            # least-loaded shard first (dp>1: each shard has its own
            # sub-pool, so admission balances page pressure)
            free_lane = max(free_lanes,
                            key=lambda l: self._alloc_of(l).num_free)
            req = self.waiting.queue[0]
            if self._pages_needed(req) > self._alloc_of(free_lane).num_free:
                return                      # page pressure: keep queued
            req = self.waiting.get()
            try:
                if req.swap is not None:
                    self._swap_in(free_lane, req)
                else:
                    self._start_prefill(free_lane, req)
            except OutOfPagesError:
                req.state = RequestState.WAITING
                self.waiting.put(req)       # try again later
                return
            except Exception as e:
                self._fail_request(req, f"admission failed: {e!r}")

    def _start_prefill(self, lane: _Lane, req: Request) -> None:
        """Allocate pages and queue a resumable prefill job; chunks run
        in :meth:`_prefill_tick`, interleaved with decode bursts."""
        eng = self.engine
        seq = self._prefill_seq(req)
        L = len(seq)
        n_pages = cdiv(L, self.page)

        # prefix cache: reclaim freed pages whose content (full prefix
        # through the page) matches — their KV is still in the pool, so
        # prefill can skip those tokens entirely
        alloc = self._alloc_of(lane)
        hits: List[int] = []
        if self.config.cache.enable_prefix_cache:
            for j in range(1, n_pages + 1):
                if j * self.page > L:       # partial last page: not cached
                    break
                page = alloc.lookup_freed(self._prefix_tag(seq, j))
                if page is None:
                    break
                hits.append(page)
        skip = len(hits) * self.page
        pages = hits + alloc.alloc_many(n_pages - len(hits))
        # page-aligned chunks; under sequence-parallel prefill each
        # chunk additionally splits into sp equal per-shard slices
        grain = math.lcm(self.page, eng.sp)
        chunk = cdiv(max(self.config.runtime.prefill_chunk, 1),
                     grain) * grain
        # bucket the padded length: chunk multiples above one chunk,
        # power-of-two grain multiples below it — a 64-token prompt
        # then prefills a 64-wide program instead of paying a whole
        # chunk of wasted matmul FLOPs (measured ~60 ms/round of the
        # scheduler-vs-fused gap at 8B), while the shape count stays
        # logarithmic
        if L > chunk:
            max_len = cdiv(max(L, 1), chunk) * chunk
        else:
            max_len = grain
            while max_len < L:
                max_len *= 2
            max_len = min(max_len, chunk)

        tokens = np.zeros((1, max_len), np.int32)
        tokens[0, :L] = seq
        bt = np.zeros((1, eng.cache.max_pages_per_seq), np.int32)
        bt[0, :len(pages)] = pages

        # first chunk that must run: the first miss, but never past the
        # chunk holding the last prompt token (its logits seed sampling)
        start = min((skip // chunk) * chunk, ((L - 1) // chunk) * chunk)
        lane.request = req
        lane.pages = pages
        lane.seq_len = 0
        # one shared immutable zeros buffer seeds every job's logits
        # accumulator (jax arrays are functional — never written in
        # place), saving a [1, V] device alloc per admission
        if self._zero_logits is None:
            self._zero_logits = jnp.zeros((1, eng.cfg.vocab_size),
                                          jnp.float32)
        lane.prefill = _PrefillJob(
            tokens=tokens, bt=bt, L=L, chunk=chunk,
            max_len=max_len, pos=start,
            final_logits=self._zero_logits,
            resume_token=req.tokens[-1] if req.tokens else None)
        req.state = RequestState.RUNNING

    def _prefill_tick(self) -> None:
        budget = max(1, self.config.runtime.prefill_chunks_per_tick)
        if self.dp == 1:
            # gang same-chunk-shape pending jobs into ONE [n, chunk]
            # program per round: admitting B requests costs one prefill
            # dispatch per chunk round, not B (each dispatch through a
            # remote chip pays fixed latency; also one program does the
            # matmuls at batch n instead of n batch-1 streams)
            for _ in range(budget):
                pending = [l for l in self.lanes
                           if l.prefill is not None and not l.prefill.done]
                if not pending:
                    break
                budget_tok = self.config.runtime.prefill_gang_tokens
                by_chunk: dict = {}
                for lane in pending:
                    by_chunk.setdefault(lane.prefill.chunk, []).append(lane)
                for chunk, lanes_ in by_chunk.items():
                    # cap each gang by the token budget: prefill is
                    # compute-bound, so everything in a gang waits for
                    # the whole gang's work (TTFT)
                    per = max(1, budget_tok // max(chunk, 1))
                    groups = [lanes_[i:i + per]
                              for i in range(0, len(lanes_), per)]
                    for group in groups:
                        try:
                            if len(group) == 1:
                                self._run_prefill_chunk(group[0],
                                                        group[0].prefill)
                            else:
                                self._run_prefill_gang1(group, chunk)
                        except Exception:
                            # isolate the faulty request: a gang error
                            # must not take down its co-admitted peers
                            # (the gang mutates nothing until the device
                            # call succeeds, so per-lane retry is safe)
                            for lane in group:
                                try:
                                    self._run_prefill_chunk(
                                        lane, lane.prefill)
                                except Exception as e:
                                    lane.request.error = \
                                        f"prefill failed: {e!r}"
                                    self._release(lane,
                                                  RequestState.FAILED)
            done = [(lane, lane.prefill) for lane in self.lanes
                    if lane.prefill is not None and lane.prefill.done]
            if done:
                try:
                    self._finish_prefills(done)
                except Exception:
                    # isolate: retry each finish individually so one
                    # faulty request cannot fail its co-admitted peers
                    for lane, job in done:
                        if lane.request is None:
                            continue
                        try:
                            self._finish_prefill(lane, job)
                        except Exception as e:
                            lane.request.error = f"prefill failed: {e!r}"
                            self._release(lane, RequestState.FAILED)
            return
        # dp>1: the batch axis is sharded, so batch-1 prefill cannot
        # run — gang up to one pending job per data shard into one
        # [dp, chunk] program per round (idle shards ride along against
        # the dump page). Budget counts gang rounds per tick.
        for _ in range(budget):
            gang = {}
            for lane in self.lanes:
                if lane.prefill is not None and not lane.prefill.done:
                    gang.setdefault(self._lane_shard[lane.idx], lane)
            if not gang:
                break
            try:
                self._run_prefill_gang(gang)
            except Exception as e:
                for lane in gang.values():
                    lane.request.error = f"prefill failed: {e!r}"
                    self._release(lane, RequestState.FAILED)
        for lane in self.lanes:
            job = lane.prefill
            if job is not None and job.done:
                try:
                    self._finish_prefill(lane, job)
                except Exception as e:
                    lane.request.error = f"prefill failed: {e!r}"
                    self._release(lane, RequestState.FAILED)

    def _run_prefill_gang1(self, group, chunk: int) -> None:
        """dp=1 twin of :meth:`_run_prefill_gang`: one chunk for EVERY
        pending lane as a single ``[n, chunk]`` program. ``n`` rounds up
        to a power of two (few compiled shapes); pad rows are fully
        invalid (pos=-1 -> dump page, logits discarded)."""
        eng = self.engine
        n = 1
        while n < len(group):
            n *= 2
        # gang width: largest pending slice bucketed to a pow2 page
        # multiple (short prompts prefill short programs; see
        # _start_prefill's max_len bucketing)
        wc = self.page
        need_w = max(min(chunk, l.prefill.max_len - l.prefill.pos)
                     for l in group)
        while wc < need_w:
            wc *= 2
        wc = min(wc, chunk)
        tokens = np.zeros((n, wc), np.int32)
        pos = np.full((n, wc), -1, np.int32)
        bt = np.zeros((n, eng.cache.max_pages_per_seq), np.int32)
        sl = np.ones((n,), np.int32)
        qo = np.full((n,), wc, np.int32)
        plen = np.ones((n,), np.int32)
        for i, lane in enumerate(group):
            job = lane.prefill
            c0 = job.pos
            c1 = min(c0 + wc, job.max_len)
            tokens[i, :c1 - c0] = job.tokens[0, c0:c1]
            p = c0 + np.arange(wc)
            pos[i] = np.where(p < job.L, p, -1)
            bt[i] = job.bt[0]
            sl[i] = min(job.L, c0 + wc)
            qo[i] = c0
            plen[i] = job.L
        logits, self.kv = eng._prefill_fn(
            eng.params, jnp.asarray(tokens), jnp.asarray(pos), self.kv,
            jnp.asarray(bt), jnp.asarray(sl), jnp.asarray(qo),
            jnp.asarray(plen))
        for i, lane in enumerate(group):
            job = lane.prefill
            job.final_logits = job.final_logits + logits[i:i + 1]
            job.pos = min(job.pos + wc, job.max_len)

    def _run_prefill_gang(self, gang) -> None:
        """One chunk for one lane per data shard as a single [dp, chunk]
        device program. Shards without a pending job get a fully-padded
        row (pos=-1, dump-page block table) — the same ragged-batch case
        `Engine.prefill` produces when a short prompt has already ended
        before the current chunk."""
        eng = self.engine
        dp = self.dp
        chunk = next(iter(gang.values())).prefill.chunk
        tokens = np.zeros((dp, chunk), np.int32)
        pos = np.full((dp, chunk), -1, np.int32)
        bt = np.zeros((dp, eng.cache.max_pages_per_seq), np.int32)
        sl = np.ones((dp,), np.int32)
        qo = np.full((dp,), chunk, np.int32)
        pl = np.ones((dp,), np.int32)
        for s, lane in gang.items():
            job = lane.prefill
            c0 = job.pos
            # job.tokens may be narrower than chunk (short prompts get
            # pow2-bucketed max_len in _start_prefill)
            c1 = min(c0 + chunk, job.max_len)
            tokens[s, :c1 - c0] = job.tokens[0, c0:c1]
            p = c0 + np.arange(chunk)
            pos[s] = np.where(p < job.L, p, -1)
            bt[s] = job.bt[0]
            sl[s] = min(job.L, c0 + chunk)
            qo[s] = c0
            pl[s] = job.L
        logits, self.kv = eng._prefill_fn(
            eng.params, jnp.asarray(tokens), jnp.asarray(pos), self.kv,
            jnp.asarray(bt), jnp.asarray(sl), jnp.asarray(qo),
            jnp.asarray(pl))
        for s, lane in gang.items():
            job = lane.prefill
            job.final_logits = job.final_logits + logits[s:s + 1]
            job.pos = min(job.pos + chunk, job.max_len)

    def _run_prefill_chunk(self, lane: _Lane, job: _PrefillJob) -> None:
        eng = self.engine
        c0 = job.pos
        c1 = min(c0 + job.chunk, job.max_len)
        pos = c0 + np.arange(c1 - c0)[None, :]
        pos = np.where(pos < job.L, pos, -1)
        logits, self.kv = eng._prefill_fn(
            eng.params, jnp.asarray(job.tokens[:, c0:c1]),
            jnp.asarray(pos), self.kv, jnp.asarray(job.bt),
            jnp.asarray([min(job.L, c1)], jnp.int32),
            jnp.asarray([c0], jnp.int32),
            jnp.asarray([job.L], jnp.int32))
        job.final_logits = job.final_logits + logits
        job.pos = c1

    def _finish_prefills(self, pairs) -> None:
        """Finish a tick's completed prefills with ONE batched sampling
        dispatch + ONE device->host read (the per-lane version costs a
        dispatch-after-D2H per request — through a remote chip that is
        the dominant share of TTFT when several requests admit
        together). Per-request determinism holds via ``row_keys``:
        each row draws with ``request_key(seed, 0)`` regardless of
        which other lanes share the batch."""
        sample_pairs = []
        for lane, job in pairs:
            lane.prefill = None
            lane.seq_len = job.L
            if job.resume_token is not None:
                # preemption resume: the next token to append is the
                # last one already delivered — nothing is re-sent
                lane.last_token = job.resume_token
                self._seed_counts(lane)
            else:
                sample_pairs.append((lane, job))
        if not sample_pairs:
            return
        ss = [(l.request.sampling or self._samp)
              for l, _ in sample_pairs]
        logits = jnp.concatenate(
            [j.final_logits for _, j in sample_pairs], axis=0)
        keys = jnp.stack([request_key(l.request.seed, 0)
                          for l, _ in sample_pairs])
        mode = _union_mode(ss)
        counts = (jnp.stack([self._lane_hist(l.request)
                             for l, _ in sample_pairs])
                  if mode.use_penalties else None)
        arrays = {k: jnp.asarray(v)
                  for k, v in batch_arrays_np(ss).items()}
        toks = np.asarray(self.engine._sample_fn(
            logits, None, mode=mode, counts=counts, row_keys=keys,
            **arrays))
        now = time.time()
        for (lane, job), tok in zip(sample_pairs, toks):
            # per-lane isolation: once tokens exist, a fault in one
            # lane's delivery must not trigger the caller's batch-wide
            # retry (which would re-deliver already-sent first tokens)
            try:
                lane.last_token = int(tok)
                lane.request.first_token_at = now
                self._deliver(lane, int(tok))
                self._seed_counts(lane)
            except Exception as e:
                lane.request.error = f"prefill finish failed: {e!r}"
                self._release(lane, RequestState.FAILED)

    def _finish_prefill(self, lane: _Lane, job: _PrefillJob) -> None:
        req = lane.request
        lane.prefill = None
        lane.seq_len = job.L
        if job.resume_token is not None:
            # preemption resume: the next token to append is the last
            # one already delivered — nothing is sampled or re-sent
            lane.last_token = job.resume_token
            self._seed_counts(lane)
            return
        samp = req.sampling or self._samp
        key = request_key(req.seed, 0)
        mode = samp.mode()
        counts1 = (self._lane_hist(req)[None, :]
                   if mode.use_penalties else None)
        tok = int(np.asarray(self.engine._sample_fn(
            job.final_logits, key, mode=mode, counts=counts1,
            **samp.as_arrays(1)))[0])
        lane.last_token = tok
        req.first_token_at = time.time()
        self._deliver(lane, tok)
        self._seed_counts(lane)

    def _lane_hist_np(self, req: Request) -> np.ndarray:
        """[V] int32 token histogram of everything the request has in
        context (prompt + already-delivered tokens) — the penalty seed
        for a lane entering decode (fresh, requeued, or swapped in)."""
        V = self.engine.cfg.vocab_size
        ids = np.asarray(req.prompt + req.tokens, np.int64)
        return np.bincount(np.clip(ids, 0, V - 1),
                           minlength=V).astype(np.int32)

    def _lane_hist(self, req: Request) -> jax.Array:
        return jnp.asarray(self._lane_hist_np(req))

    def _seed_counts(self, lane: _Lane) -> None:
        """Write the lane's penalty histogram row. When the first
        sampled token already released the lane (single-token request
        / immediate EOS), ``lane.request`` is gone — nothing to seed."""
        req = lane.request
        if req is None:
            return
        s = req.sampling or self._samp
        if not s.has_penalties:
            return
        if self._counts is None:
            self._counts = jnp.zeros(
                (self.B, self.engine.cfg.vocab_size), jnp.int32)
        self._counts = self._counts.at[lane.idx].set(self._lane_hist(req))

    # -- preemption / swap -----------------------------------------------------

    def _page_base(self, lane: _Lane) -> int:
        """Global pool index of this lane's shard's first page (the
        pool's pages axis is sharded over 'data'; allocators hand out
        shard-LOCAL ids)."""
        return (self._lane_shard[lane.idx]
                * (self.engine.cache.num_pages // self.dp))

    def _pin_kv_sharding(self) -> None:
        """Re-pin the pool's mesh sharding after a host-side pool
        mutation (swap-in scatter / live resize) — eager updates on
        sharded arrays let XLA choose output placement."""
        sh = getattr(self.engine, "_kv_shardings", None)
        if sh is not None:
            self.kv = jax.device_put(self.kv, sh)

    def _swap_out(self, lane: _Lane) -> None:
        """Preempt by moving the lane's KV pages to host RAM; the
        request resumes via :meth:`_swap_in` with no re-prefill. Only
        live pages transfer — dump-page placeholders left by
        sliding-window reclamation keep their slot positions but cost
        no PCIe traffic and no pages on resume."""
        req = lane.request
        base = self._page_base(lane)
        live_slots = [j for j, p in enumerate(lane.pages) if p != 0]
        blobs = gather_pages(self.kv,
                             [base + lane.pages[j] for j in live_slots])
        req.swap = (blobs, live_slots, len(lane.pages), lane.seq_len,
                    lane.last_token)
        for p in lane.pages:
            if p != 0:                 # skip dump-page placeholders
                self._alloc_of(lane).free(p)
        lane.pages = []
        lane.request = None
        lane.seq_len = 0
        req.state = RequestState.WAITING
        self.n_preempted += 1
        self.waiting.put(req)

    def _swap_in(self, lane: _Lane, req: Request) -> None:
        blobs, live_slots, n_slots, seq_len, last_token = req.swap
        fresh = self._alloc_of(lane).alloc_many(len(live_slots))
        if fresh:
            base = self._page_base(lane)
            self.kv = scatter_pages(self.kv, blobs,
                                    [base + f for f in fresh])
            self._pin_kv_sharding()
        pages = [0] * n_slots
        for j, p in zip(live_slots, fresh):
            pages[j] = p
        req.swap = None
        lane.request = req
        lane.pages = pages
        lane.seq_len = seq_len
        lane.last_token = last_token
        req.state = RequestState.RUNNING
        self._seed_counts(lane)

    def _preempt(self, lane: _Lane) -> None:
        self.n_preempted += 1
        if lane.prefill is not None or not self.config.cache.enable_swap:
            # re-queue; delivered tokens stay on the request and are
            # teacher-forced on re-admission (no re-delivery)
            self._release(lane, RequestState.WAITING, requeue=True)
        else:
            self.n_preempted -= 1          # _swap_out counts itself
            self._swap_out(lane)

    # -- delivery / release ----------------------------------------------------

    def _deliver(self, lane: _Lane, tok: int) -> None:
        req = lane.request
        req.tokens.append(tok)
        req._out.put(tok)
        samp = req.sampling or self._samp
        done = (len(req.tokens) >= req.max_new_tokens
                or (samp.eos_token_id >= 0 and tok == samp.eos_token_id)
                or tok in samp.stop_token_ids)
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
                self._alloc_of(lane).free(p, tag=tags.get(p))
        lane.pages = []
        lane.request = None
        lane.seq_len = 0
        lane.prefill = None
        if requeue:
            req.state = RequestState.WAITING
            self.waiting.put(req)
            return
        req.state = state
        req.finished_at = time.time()
        if state == RequestState.FINISHED:
            self.n_finished += 1
        elif state == RequestState.FAILED:
            self.n_failed += 1
            log_event("request_failed", req_id=req.req_id,
                      error=req.error)
        req._out.put(_END)

    def _fail_request(self, req: Request, error: str) -> None:
        req.error = error
        req.state = RequestState.FAILED
        req.finished_at = time.time()
        self.n_failed += 1
        log_event("request_failed", req_id=req.req_id, error=error)
        req._out.put(_END)

    # -- decode ----------------------------------------------------------------

    def _reclaim_window_pages(self) -> None:
        """Sliding-window models: pages wholly below every live query's
        window are unreachable forever — free them (Mistral-style
        rolling buffer, done at page granularity). Freed block-table
        slots point at the dump page."""
        w = self.config.model.sliding_window
        if w <= 0 or self.config.model.sliding_window_pattern != 1:
            # pattern > 1 (Gemma-2): global layers keep every page live
            return
        for lane in self.lanes:
            if not lane.decoding:
                continue
            # next decode query sits at position seq_len; keys
            # <= seq_len - w are out of its (and every later) window
            dead_below = lane.seq_len + 1 - w
            n_dead = max(dead_below // self.page, 0)
            for j in range(n_dead):
                if lane.pages[j] != 0:
                    self._alloc_of(lane).free(lane.pages[j])
                    lane.pages[j] = 0          # dump-page placeholder

    def _grow_lane(self, lane: _Lane, seq_len: int, emitted: int,
                   horizon: int, writeahead: int = 0) -> None:
        """Grow one lane's pages so ``horizon`` more decode steps fit:
        KV rows land at ``seq_len .. seq_len + live_steps - 1`` where
        live steps are capped by the request's remaining budget
        (``max_new_tokens - emitted``); the total is clamped to the
        request's validated page budget. Raises ``OutOfPagesError`` on
        pool pressure (callers preempt or fall back)."""
        req = lane.request
        steps = min(horizon, req.max_new_tokens - emitted)
        total = seq_len + max(steps, 1) + writeahead
        total = min(total, len(req.prompt) + req.max_new_tokens)
        need = cdiv(max(total, seq_len + 1), self.page)
        while len(lane.pages) < need:
            lane.pages.extend(self._alloc_of(lane).alloc_many(1))

    def _grow_pages(self, horizon: int, writeahead: int = 0) -> None:
        """Ensure every decoding lane has pages for the next ``horizon``
        tokens; preempt the youngest lane on pool exhaustion (never
        drop live pages — unlike the reference's silent LRU eviction).

        ``writeahead``: extra KV slots the burst may write past the
        emitted tokens (speculative verify writes ``spec_k`` draft rows
        ahead), clamped to the request's validated page budget — the
        device redirects writes past that limit to the dump page."""
        self._reclaim_window_pages()
        while True:
            active = [l for l in self.lanes if l.decoding]
            try:
                for lane in active:
                    self._grow_lane(lane, lane.seq_len,
                                    len(lane.request.tokens), horizon,
                                    writeahead)
                return
            except OutOfPagesError:
                victims = [l for l in self.lanes if not l.free]
                if not victims:
                    return
                self._preempt(max(victims,
                                  key=lambda l: l.request.arrived_at))

    def _burst_steps(self, active: List[_Lane]) -> int:
        """Device steps for this burst: enough for the longest-remaining
        lane, capped at ``decode_burst``, rounded up to a power of two
        so only a handful of program shapes ever compile.

        When the admission queue is empty the cap relaxes to
        ``decode_burst_max``: there is nothing to interleave, so longer
        device-side bursts amortize the host-sync cost (through the
        driver tunnel a sync costs ~28 ms — BENCHMARKS.md). A request
        arriving mid-burst waits for the burst to finish, so the knob
        trades worst-case admission latency for throughput; servers
        that prioritize TTFT can set it equal to ``decode_burst``."""
        burst = max(1, self.config.runtime.decode_burst)
        if self.waiting.empty() and not any(l.prefill is not None
                                            for l in self.lanes):
            # nothing queued AND nothing mid-prefill: a lane part-way
            # through a long chunked prefill must keep its interleaving
            # cadence or its TTFT inflates by burst_max/burst
            burst = max(burst, self.config.runtime.decode_burst_max)
        rem = max(l.request.max_new_tokens - len(l.request.tokens)
                  for l in active)
        n = 1
        while n < min(burst, max(rem, 1)):
            n *= 2
        return min(n, burst)

    def _samp_plan(self, active: List[_Lane]):
        """Per-lane sampling arrays (device) + compile mode, cached on
        lane occupancy: a burst re-uploads nothing unless some lane's
        request changed since the last one (VERDICT r1 Weak #7 — the
        per-step host rebuild of 5 per-lane vectors)."""
        # keyed on the per-lane sampling VALUES plus which lanes this
        # call unions the mode over. Values (not req_ids): steady-state
        # serving with recurring sampling configs then re-uploads
        # nothing per tick. The active set matters because the fused
        # tick passes decoding+finishing lanes while a decode tick the
        # same scheduler step passed decoding lanes only (ADVICE r4: a
        # stale decoding-only mode silently dropped a finishing lane's
        # sampling/penalties).
        samp = self._samp        # per-request sampling: values per lane
        eff = [(l.request.sampling if l.request and l.request.sampling
                else samp) for l in self.lanes]
        key = (tuple(s.value_key() for s in eff),
               frozenset(l.idx for l in active))
        if self._samp_cache is not None and self._samp_cache[0] == key:
            return self._samp_cache[1], self._samp_cache[2]

        arrs = batch_arrays_np(eff)
        samp_arrays = {k: jnp.asarray(v) for k, v in arrs.items()}
        # compile mode = union of the active requests' features (at most
        # a handful of mode combinations ever get compiled)
        mode = _union_mode([l.request.sampling or samp for l in active])
        self._samp_cache = (key, samp_arrays, mode)
        return samp_arrays, mode

    def _fused_tick(self) -> Optional[int]:
        """Fused scheduler tick: the final prefill chunk(s) + first-token
        sampling + the decode burst as CHAINED device dispatches with no
        intervening device->host sync.

        The legacy tick pays three taxed dispatches per admission round
        (prefill gang -> batched finish-sample -> decode burst; through
        a remote chip each dispatch after a D2H costs ~28 ms,
        BENCHMARKS.md). Here the gang program samples the first tokens
        itself (``Engine._build_prefill_sample``), a device scatter
        merges them with the decoding lanes' seed tokens, and the burst
        consumes that *device* array — the host fetches the first
        tokens only after the burst is already dispatched (async), so
        TTFT still tracks prefill completion while the burst rides
        directly behind it. Applies when lanes finish prefill this tick
        (dp == 1, no mesh, no spec — those take the legacy path). More
        pending lanes than one gang holds run as CHAINED gang
        dispatches (still no host sync); penalty-carrying lanes ride
        the same path — the gang samples against host-seeded prompt
        histograms and the scatter bumps the sampled first token into
        the counts the burst threads. Returns None to fall back.
        """
        rt = self.config.runtime
        eng = self.engine
        if (self.dp != 1 or eng.mesh is not None
                or rt.prefill_chunks_per_tick > 1):
            return None
        pending = [l for l in self.lanes
                   if l.prefill is not None and not l.prefill.done]
        if not pending:
            return None
        if any(l.prefill is not None and l.prefill.done
               for l in self.lanes):
            return None   # a done-but-unfinished job (left by an error
            # fallback) must go through the legacy finish path first
        chunk = pending[0].prefill.chunk
        per = max(1, rt.prefill_gang_tokens // max(chunk, 1))
        finishing = [l for l in pending
                     if l.prefill.pos + chunk >= l.prefill.max_len]
        if not finishing:
            return None                  # nothing samples: legacy path
                                         # already chains gang -> burst
        # token-budget gangs, chained back-to-back on device (r4 fell
        # back to the 3-dispatch legacy tick whenever one gang could
        # not hold every pending lane)
        groups = [pending[i:i + per] for i in range(0, len(pending), per)]
        decoding = [l for l in self.lanes if l.decoding]
        post = decoding + finishing      # lanes decoding after the chunk
        samp_arrays, mode = self._samp_plan(post)
        fin_idx = {l.idx for l in finishing}
        # speculative burst rides the fused tick too, under the same
        # feature gates as the legacy spec tick (the spec loop threads
        # neither penalty histograms nor stop sets nor logit bias —
        # such lanes take the fused PLAIN burst instead)
        spec_k = rt.spec_k
        use_spec = (spec_k > 0 and not any(
            (s := (l.request.sampling or self._samp)).has_penalties
            or s.stop_token_ids or s.logit_bias for l in post))

        # burst length: the post-chunk view of _burst_steps
        burst = max(1, rt.decode_burst)
        if self.waiting.empty() and len(finishing) == len(pending):
            burst = max(burst, rt.decode_burst_max)
        rem = 0
        for lane in decoding:
            rem = max(rem, lane.request.max_new_tokens
                      - len(lane.request.tokens))
        for lane in finishing:
            rem = max(rem, lane.request.max_new_tokens
                      - len(lane.request.tokens) - 1)
        n_steps = 1
        while n_steps < min(burst, max(rem, 1)):
            n_steps *= 2
        n_steps = min(n_steps, burst)

        # pages for the whole tick BEFORE any dispatch; on pool
        # pressure fall back — the legacy tick preempts properly.
        # spec: each iteration may verify spec_k drafts (+1), with
        # spec_k write-ahead KV rows past the emitted tokens
        horizon = n_steps * (spec_k + 1) if use_spec else n_steps
        ahead = spec_k if use_spec else 0
        self._reclaim_window_pages()
        try:
            for lane in decoding:
                self._grow_lane(lane, lane.seq_len,
                                len(lane.request.tokens), horizon,
                                ahead)
            for lane in finishing:
                # fresh rows count their in-program first token as
                # emitted; resume rows sample nothing
                em = len(lane.request.tokens) + (
                    0 if lane.prefill.resume_token is not None else 1)
                self._grow_lane(lane, lane.prefill.L, em, horizon,
                                ahead)
        except OutOfPagesError:
            return None

        mp = eng.cache.max_pages_per_seq
        V = eng.cfg.vocab_size

        def build_gang(g):
            # gang inputs over this group's rows (padded to a power of
            # two); the gang WIDTH is the largest pending slice bucketed
            # to a power-of-two page multiple, not the full chunk —
            # short prompts prefill short programs
            n = 1
            while n < len(g):
                n *= 2
            wc = self.page
            need_w = max(min(chunk, l.prefill.max_len - l.prefill.pos)
                         for l in g)
            while wc < need_w:
                wc *= 2
            wc = min(wc, chunk)
            tokens = np.zeros((n, wc), np.int32)
            pos = np.full((n, wc), -1, np.int32)
            gbt = np.zeros((n, mp), np.int32)
            gsl = np.ones((n,), np.int32)
            gqo = np.full((n,), wc, np.int32)
            gpl = np.ones((n,), np.int32)
            smask = np.zeros((n,), bool)
            gseeds = np.zeros((n,), np.int32)
            rows = np.full((n,), self.B, np.int32)  # B = dropped scatter
            gs = []
            for i, lane in enumerate(g):
                job = lane.prefill
                c0 = job.pos
                c1 = min(c0 + wc, job.max_len)
                tokens[i, :c1 - c0] = job.tokens[0, c0:c1]
                p = c0 + np.arange(wc)
                pos[i] = np.where(p < job.L, p, -1)
                gbt[i] = job.bt[0]
                gsl[i] = min(job.L, c0 + wc)
                gqo[i] = c0
                gpl[i] = job.L
                gseeds[i] = lane.request.seed
                if lane.idx in fin_idx and job.resume_token is None:
                    smask[i] = True
                    rows[i] = lane.idx
                gs.append(lane.request.sampling or self._samp)
            while len(gs) < n:
                gs.append(self._samp)
            gkey = tuple(s.value_key() for s in gs)
            gsamp = self._gsamp_cache.get(gkey)
            if gsamp is None:
                gsamp = {k: jnp.asarray(v)
                         for k, v in batch_arrays_np(gs).items()}
                if len(self._gsamp_cache) >= 16:
                    self._gsamp_cache.clear()
                self._gsamp_cache[gkey] = gsamp
            gcounts = None
            if mode.use_penalties:
                # prompt histograms seed the in-gang first-token
                # penalties; rows without penalties sample with
                # identity knobs, so their zero rows are inert
                gc = np.zeros((n, V), np.int32)
                for i, lane in enumerate(g):
                    if smask[i] and (lane.request.sampling
                                     or self._samp).has_penalties:
                        gc[i] = self._lane_hist_np(lane.request)
                gcounts = jnp.asarray(gc)
            return (tokens, pos, gbt, gsl, gqo, gpl, smask, gseeds,
                    gsamp, gcounts, rows)

        # burst inputs over all lanes (idle rows frozen via budgets=0)
        bt = np.zeros((self.B, mp), np.int32)
        sl = np.zeros((self.B,), np.int32)
        dec = np.zeros((self.B,), np.int32)
        emitted = np.zeros((self.B,), np.int32)
        budgets = np.zeros((self.B,), np.int32)
        seeds = np.zeros((self.B,), np.int32)
        for lane in decoding:
            i = lane.idx
            bt[i, :len(lane.pages)] = lane.pages
            sl[i] = lane.seq_len
            dec[i] = lane.last_token
            emitted[i] = len(lane.request.tokens)
            budgets[i] = lane.request.max_new_tokens
            seeds[i] = lane.request.seed
        for lane in finishing:
            i = lane.idx
            job = lane.prefill
            bt[i, :len(lane.pages)] = lane.pages
            sl[i] = job.L
            if job.resume_token is not None:
                dec[i] = job.resume_token
                emitted[i] = len(lane.request.tokens)
            else:
                emitted[i] = len(lane.request.tokens) + 1
            budgets[i] = lane.request.max_new_tokens
            seeds[i] = lane.request.seed

        hist = cur = kv_limits = cur0 = None
        if use_spec:
            # spec-burst inputs: per-lane token history (the draft
            # source), with a placeholder at position L for each fresh
            # finishing lane — the device scatter patches the gang's
            # sampled first token in before the loop drafts from it
            max_need = 1
            for lane in post:
                i = lane.idx
                max_need = max(max_need, int(sl[i]) + 1
                               + min(n_steps * (spec_k + 1),
                                     int(budgets[i] - emitted[i]))
                               + spec_k + 1)
            M = cdiv(max_need, 256) * 256
            hist = np.zeros((self.B, M), np.int32)
            cur = np.ones((self.B,), np.int32)
            kv_limits = np.zeros((self.B,), np.int32)
            for lane in post:
                i = lane.idx
                req = lane.request
                seq = req.prompt + req.tokens
                hist[i, :len(seq)] = seq
                cur[i] = sl[i] + 1
                kv_limits[i] = len(req.prompt) + req.max_new_tokens

        if eng._prefill_sample_fn is None:
            eng._prefill_sample_fn = eng._build_prefill_sample()
        if eng._scatter_tokens_fn is None:
            eng._scatter_tokens_fn = eng._build_scatter_tokens()
        out_dev = None
        if mode.use_penalties:
            # host-seed the finishing lanes' histogram rows (prompt +
            # already-delivered tokens; the in-program first token is
            # bumped by the scatter below, mirroring the legacy order:
            # sample-with-prompt-hist, then count the sampled token)
            if self._counts is None:
                self._counts = jnp.zeros((self.B, V), jnp.int32)
            for lane in finishing:
                s = lane.request.sampling or self._samp
                if s.has_penalties:
                    self._counts = self._counts.at[lane.idx].set(
                        jnp.asarray(self._lane_hist_np(lane.request)))
            counts = self._counts
        else:
            counts = self._dummy_counts
        firsts = []                      # (first_dev, rows) per gang
        try:
            for g in groups:
                (tokens, pos, gbt, gsl, gqo, gpl, smask, gseeds, gsamp,
                 gcounts, rows) = build_gang(g)
                first_dev, self.kv = eng._prefill_sample_fn(
                    eng.params, jnp.asarray(tokens), jnp.asarray(pos),
                    self.kv, jnp.asarray(gbt), jnp.asarray(gsl),
                    jnp.asarray(gqo), jnp.asarray(gpl),
                    jnp.asarray(smask), jnp.asarray(gseeds), gsamp,
                    gcounts, mode=mode)
                firsts.append((first_dev, rows))
        except Exception as e:
            # the gangs mutate no scheduler state before they succeed
            # (re-running a chunk re-writes the same KV pages): fall
            # back to the legacy tick, whose per-lane retry isolates a
            # faulty request (SURVEY.md §5.3)
            log_event("fused_tick_gang_fallback", error=repr(e)[:500])
            return None
        # commit the prefill bookkeeping NOW: a burst fault must then
        # see the finishing lanes as DECODING, so the device reset
        # fails them like any decode fault — leaving them mid-prefill
        # would requeue them into an infinite retry of the same fault
        deliver = []
        for gidx, g in enumerate(groups):
            for i, lane in enumerate(g):
                job = lane.prefill
                job.pos = min(job.pos + chunk, job.max_len)
                if lane.idx not in fin_idx:
                    continue
                lane.prefill = None
                lane.seq_len = job.L
                if job.resume_token is not None:
                    lane.last_token = job.resume_token
                else:
                    deliver.append((gidx, i, lane))
        hist_np = cur_np = None
        try:
            if use_spec:
                if eng._decode_spec_loop_fn is None:
                    eng._decode_spec_loop_fn = \
                        eng._build_decode_spec_loop()
                if eng._scatter_hist_fn is None:
                    eng._scatter_hist_fn = eng._build_scatter_hist()
                hist_dev = jnp.asarray(hist)
                cur_dev = jnp.asarray(cur)
                for first_dev, rows in firsts:
                    hist_dev = eng._scatter_hist_fn(
                        hist_dev, cur_dev, first_dev, jnp.asarray(rows))
                cur0 = cur.copy()
                hist_out, cur_out, _, self.kv = \
                    eng._decode_spec_loop_fn(
                        eng.params, hist_dev, self.kv, jnp.asarray(bt),
                        cur_dev, jnp.asarray(emitted),
                        jnp.asarray(budgets), jnp.asarray(seeds),
                        jnp.asarray(kv_limits), samp_arrays,
                        num_iters=n_steps, spec_k=spec_k,
                        ngram=max(1, rt.spec_ngram), mode=mode,
                        stochastic=rt.spec_stochastic)
                # the burst is already dispatched: async D2H
                first_nps = [np.asarray(f) for f, _ in firsts]
                hist_np = np.asarray(hist_out)
                cur_np = np.asarray(cur_out)
            else:
                start = jnp.asarray(dec)
                for first_dev, rows in firsts:
                    start, counts = eng._scatter_tokens_fn(
                        start, first_dev, jnp.asarray(rows), counts,
                        bump=mode.use_penalties)
                if rem > 0:
                    out_dev, self.kv, counts = eng._decode_loop_fn(
                        eng.params, start, self.kv, jnp.asarray(bt),
                        jnp.asarray(sl), jnp.asarray(emitted),
                        jnp.asarray(budgets), jnp.asarray(seeds),
                        samp_arrays, counts, num_steps=n_steps,
                        mode=mode)
                # burst already dispatched: these D2H taxes nothing
                first_nps = [np.asarray(f) for f, _ in firsts]
        except Exception as e:
            self._reset_device_state(e)
            return sum(not l.free for l in self.lanes)
        if use_spec:
            pass                        # spec gates out penalty lanes
        elif mode.use_penalties:
            self._counts = counts
        else:
            self._dummy_counts = counts

        now = time.time()
        for gidx, i, lane in deliver:
            # per-lane isolation (mirrors _finish_prefills)
            try:
                tok = int(first_nps[gidx][i])
                lane.last_token = tok
                lane.request.first_token_at = now
                self._deliver(lane, tok)
            except Exception as e:
                lane.request.error = f"prefill finish failed: {e!r}"
                self._release(lane, RequestState.FAILED)
        if use_spec and cur_np is not None:
            for i, lane in enumerate(self.lanes):
                if budgets[i] == 0:
                    continue
                new = int(cur_np[i]) - int(cur0[i])
                lane.seq_len = int(cur_np[i]) - 1
                lane.last_token = int(hist_np[i, int(cur_np[i]) - 1])
                for t in range(new):
                    if not lane.decoding:
                        break          # released (EOS / budget) earlier
                    self._deliver(lane,
                                  int(hist_np[i, int(cur0[i]) + t]))
        elif out_dev is not None:
            out_np = np.asarray(out_dev)
            for i, lane in enumerate(self.lanes):
                if budgets[i] == 0:
                    continue
                for j in range(n_steps):
                    if not lane.decoding:
                        break          # released (EOS / budget) earlier
                    lane.seq_len += 1
                    lane.last_token = int(out_np[i, j])
                    self._deliver(lane, lane.last_token)
        return sum(not l.free for l in self.lanes)

    def _decode_tick(self) -> int:
        if not any(l.decoding for l in self.lanes):
            return sum(not l.free for l in self.lanes)
        if (self.config.runtime.spec_k > 0
                # the spec loop neither threads the penalty histogram
                # nor checks per-lane stop sets nor applies logit bias —
                # any such lane forces the plain burst this tick
                and not any(
                    (s := (l.request.sampling or self._samp)).has_penalties
                    or s.stop_token_ids or s.logit_bias
                    for l in self.lanes if l.decoding)):
            return self._decode_tick_spec()
        n_steps = self._burst_steps([l for l in self.lanes if l.decoding])
        self._grow_pages(n_steps)
        active = [l for l in self.lanes if l.decoding]
        if not active:
            return sum(not l.free for l in self.lanes)

        eng = self.engine
        bt = np.zeros((self.B, eng.cache.max_pages_per_seq), np.int32)
        sl = np.zeros((self.B,), np.int32)
        toks = np.zeros((self.B,), np.int32)
        emitted = np.zeros((self.B,), np.int32)
        budgets = np.zeros((self.B,), np.int32)   # 0 => frozen idle lane
        seeds = np.zeros((self.B,), np.int32)
        for i, lane in enumerate(self.lanes):
            if not lane.decoding:
                continue
            bt[i, :len(lane.pages)] = lane.pages
            sl[i] = lane.seq_len
            toks[i] = lane.last_token
            emitted[i] = len(lane.request.tokens)
            budgets[i] = lane.request.max_new_tokens
            seeds[i] = lane.request.seed

        samp_arrays, mode = self._samp_plan(active)
        if mode.use_penalties and self._counts is None:
            self._counts = jnp.zeros(
                (self.B, self.engine.cfg.vocab_size), jnp.int32)
        counts = self._counts if mode.use_penalties else self._dummy_counts

        try:
            out, self.kv, counts = eng._decode_loop_fn(
                eng.params, jnp.asarray(toks), self.kv, jnp.asarray(bt),
                jnp.asarray(sl), jnp.asarray(emitted),
                jnp.asarray(budgets), jnp.asarray(seeds), samp_arrays,
                counts, num_steps=n_steps, mode=mode)
            if mode.use_penalties:
                self._counts = counts
            else:
                self._dummy_counts = counts
            out_np = np.asarray(out)
        except Exception as e:
            self._reset_device_state(e)
            return sum(not l.free for l in self.lanes)

        for i, lane in enumerate(self.lanes):
            if budgets[i] == 0:
                continue
            for j in range(n_steps):
                if not lane.decoding:
                    break              # released (EOS / budget) mid-burst
                lane.seq_len += 1
                lane.last_token = int(out_np[i, j])
                self._deliver(lane, lane.last_token)
        return sum(not l.free for l in self.lanes)

    def _decode_tick_spec(self) -> int:
        """Speculative decode burst (``runtime.spec_k > 0``): each
        device iteration drafts ``spec_k`` tokens per greedy lane from
        its own history and verifies them in one forward — greedy lanes
        emit up to ``spec_k+1`` tokens per weight stream (greedy-exact),
        sampled lanes advance one seeded token per iteration exactly
        like the plain burst. See ``Engine._build_decode_spec_loop``."""
        eng = self.engine
        K = self.config.runtime.spec_k
        ngram = max(1, self.config.runtime.spec_ngram)
        n_iters = self._burst_steps(
            [l for l in self.lanes if l.decoding])
        self._grow_pages(n_iters * (K + 1), writeahead=K)
        active = [l for l in self.lanes if l.decoding]
        if not active:
            return sum(not l.free for l in self.lanes)

        # history buffer: hist[i, :seq_len+1] = prompt + delivered
        # tokens (the +1 is the pending last token, KV not yet written);
        # width is bucketed so only a few program shapes compile
        max_need = max(
            lane.seq_len + 1
            + min(n_iters * (K + 1),
                  lane.request.max_new_tokens - len(lane.request.tokens))
            + K + 1
            for lane in active)
        M = cdiv(max_need, 256) * 256
        hist = np.zeros((self.B, M), np.int32)
        bt = np.zeros((self.B, eng.cache.max_pages_per_seq), np.int32)
        cur = np.ones((self.B,), np.int32)        # frozen lanes: dummy
        emitted = np.zeros((self.B,), np.int32)
        budgets = np.zeros((self.B,), np.int32)   # 0 => frozen idle lane
        seeds = np.zeros((self.B,), np.int32)
        kv_limits = np.zeros((self.B,), np.int32)
        for i, lane in enumerate(self.lanes):
            if not lane.decoding:
                continue
            req = lane.request
            seq = req.prompt + req.tokens
            assert len(seq) == lane.seq_len + 1
            hist[i, :len(seq)] = seq
            bt[i, :len(lane.pages)] = lane.pages
            cur[i] = len(seq)
            emitted[i] = len(req.tokens)
            budgets[i] = req.max_new_tokens
            seeds[i] = req.seed
            kv_limits[i] = len(req.prompt) + req.max_new_tokens

        samp_arrays, mode = self._samp_plan(active)
        cur0 = cur.copy()
        if eng._decode_spec_loop_fn is None:
            eng._decode_spec_loop_fn = eng._build_decode_spec_loop()
        try:
            hist_out, cur_out, emitted_out, self.kv = \
                eng._decode_spec_loop_fn(
                    eng.params, jnp.asarray(hist), self.kv,
                    jnp.asarray(bt), jnp.asarray(cur),
                    jnp.asarray(emitted), jnp.asarray(budgets),
                    jnp.asarray(seeds), jnp.asarray(kv_limits),
                    samp_arrays, num_iters=n_iters, spec_k=K,
                    ngram=ngram, mode=mode,
                    stochastic=self.config.runtime.spec_stochastic)
            hist_np = np.asarray(hist_out)
            cur_np = np.asarray(cur_out)
        except Exception as e:
            self._reset_device_state(e)
            return sum(not l.free for l in self.lanes)

        for i, lane in enumerate(self.lanes):
            if budgets[i] == 0:
                continue
            new = int(cur_np[i]) - int(cur0[i])
            lane.seq_len = int(cur_np[i]) - 1
            lane.last_token = int(hist_np[i, int(cur_np[i]) - 1])
            for t in range(new):
                if not lane.decoding:
                    break              # released (EOS / budget) mid-burst
                self._deliver(lane, int(hist_np[i, int(cur0[i]) + t]))
        return sum(not l.free for l in self.lanes)

    def _reset_device_state(self, error: Exception) -> None:
        """A decode-burst failure cannot be attributed to one lane, and
        the donated pool buffer may be gone: fail every decoding
        request, re-queue prefilling ones (their KV is lost either
        way), reinitialize the pool, and invalidate the prefix cache
        (its pages' contents died with the pool). Serving continues."""
        self.n_resets += 1
        log_event("decode_reset", error=repr(error))
        for lane in self.lanes:
            if lane.decoding:
                lane.request.error = f"decode step failed: {error!r}"
                self._release(lane, RequestState.FAILED)
            elif not lane.free:
                self._release(lane, RequestState.WAITING, requeue=True)
        for alloc in self.engine.allocators:
            alloc.drop_cached()
        self.kv = self.engine._init_cache()
        # the counts buffers were donated into the failed program
        self._counts = None
        self._dummy_counts = jnp.zeros((self.B, 1), jnp.int32)
        # cached device uploads may be gone with the device: rebuild
        self._samp_cache = None
        self._gsamp_cache.clear()
        self._zero_logits = None
