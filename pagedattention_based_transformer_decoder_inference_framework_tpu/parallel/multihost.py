"""Host-0 request distribution for multi-process (multi-host) serving.

SURVEY.md §2.3 row 36 / BASELINE config 5: a model sharded across hosts
(e.g. 70B over 2x8 chips) runs as one multi-controller JAX program —
every process executes the same jitted steps over the global mesh, but
only host 0 talks to clients. The pieces:

* :func:`init_distributed` (``mesh.py``) brings the processes into one
  JAX runtime; :func:`build_mesh` lays the global ``(data, model)``
  mesh over all hosts' devices (TP innermost over ICI, DP across
  hosts/DCN).
* **Request feeding**: host 0 holds the real request queue. Each
  service step every process calls :func:`distribute_prompts`; host 0
  encodes its batch as fixed-shape token/length arrays and
  ``broadcast_one_to_all`` ships them, so all processes enter the same
  engine call with identical inputs (multi-controller JAX requires
  non-addressable inputs to agree across processes).
* **Result gathering**: engine outputs are batch-sharded over the data
  axis; ``utils.common.to_host`` all-gathers the non-addressable shards
  so host 0 (and everyone else — the collective is symmetric, which
  keeps processes in lockstep) sees the full batch.

The reference has no distributed story at all (single-GPU CUDA,
``decoder/README.md:58`` lists multi-device as an aspiration); this is
designed TPU-first rather than ported.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np


def is_primary() -> bool:
    """True on the host that owns the request queue (process 0)."""
    return jax.process_index() == 0


def distribute_prompts(prompts: Optional[Sequence[Sequence[int]]],
                       batch: int, max_len: int,
                       ) -> Tuple[List[List[int]], np.ndarray]:
    """Broadcast host 0's prompt batch to every process.

    ``prompts`` is only read on process 0 (pass ``None`` elsewhere). The
    batch is padded to fixed ``[batch, max_len]`` tokens + ``[batch]``
    lengths so the broadcast shape is static; rows beyond the real
    batch get length 0 and must be skipped by the caller (all processes
    see the same lengths, so they skip identically).

    Returns ``(prompts, lens)`` — the decoded ragged prompt list (same
    on every process) and the raw length vector.
    """
    from jax.experimental import multihost_utils

    tokens = np.zeros((batch, max_len), np.int32)
    lens = np.zeros((batch,), np.int32)
    if is_primary():
        assert prompts is not None and len(prompts) <= batch
        for i, p in enumerate(prompts):
            assert 1 <= len(p) <= max_len, f"prompt {i} length {len(p)}"
            tokens[i, :len(p)] = np.asarray(p, np.int32)
            lens[i] = len(p)
    tokens, lens = multihost_utils.broadcast_one_to_all((tokens, lens))
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    out = [tokens[i, :lens[i]].tolist() for i in range(batch)
           if lens[i] > 0]
    return out, lens


def broadcast_scalar(value: float) -> float:
    """Broadcast one host-0 scalar (e.g. a shutdown flag / step count)."""
    from jax.experimental import multihost_utils

    return float(multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.float32)))


# ---------------------------------------------------------------------------
# Multi-host serving pump (BASELINE config 5 / SURVEY §7-M5)
# ---------------------------------------------------------------------------

_IDLE, _SERVE, _STOP = 0, 1, 2


class PumpRequest:
    """Host-0 handle for one request served through the lockstep pump.

    Mirrors the scheduler's :class:`~..scheduler.scheduler.Request`
    surface the server core consumes: ``stream()`` blocks for tokens,
    ``tokens``/``error``/``state`` carry the outcome."""

    def __init__(self, prompt, max_new, sampling, seed):
        import queue

        self.prompt = list(prompt)
        self.max_new_tokens = max_new
        self.sampling = sampling
        self.seed = seed
        self.tokens = []
        self.error = None
        self._out = queue.Queue()

    def stream(self):
        while True:
            item = self._out.get()
            if item is None:
                return
            yield item


class MultiHostPump:
    """One logical engine over DCN, serving HTTP from host 0.

    Every process runs :meth:`run_round` in lockstep: host 0 drains up
    to ``batch`` queued requests (grouped on identical sampling so one
    fused program serves the round) and broadcasts the round plan —
    (flag, tokens, lens, max_new, sampling vector, seed) — via
    ``broadcast_one_to_all``; every process then enters the SAME
    ``generate_batch_fused`` call over the global mesh, and host 0
    delivers the gathered outputs to its clients. Non-primary processes
    call :meth:`run_forever`; host 0 runs the pump on a daemon thread
    under the HTTP frontend (``cli serve --coordinator ...``).

    Per-round sampling is uniform (the group key): per-token penalties,
    stop sets and logit bias are rejected at submit — they would need
    per-row broadcast plumbing the fused program doesn't carry yet.
    """

    #: broadcast sampling vector layout
    _SAMP_KEYS = ("temperature", "top_k", "top_p", "min_p",
                  "eos_token_id", "eos_threshold")

    def __init__(self, engine, batch: Optional[int] = None,
                 max_prompt_len: Optional[int] = None):
        import queue
        import threading

        self.engine = engine
        rt = engine.config.runtime
        self.batch = batch or rt.max_batch_size
        assert self.batch % engine.dp == 0, (self.batch, engine.dp)
        page = engine.cache.page_size
        cap = engine.cache.max_pages_per_seq * page
        self.max_len = max_prompt_len or max(
            page, cap - rt.max_new_tokens)
        self.queue: "queue.Queue[PumpRequest]" = queue.Queue()
        # requests deferred by a key mismatch wait here and are consumed
        # AHEAD of the main queue next round — re-queuing them at the
        # FIFO tail let a steady stream of one sampling key starve a
        # different-keyed request indefinitely (ADVICE r4)
        from collections import deque
        self._deferred: "deque[PumpRequest]" = deque()
        self._stop = threading.Event()
        self._thread = None
        self.n_rounds = 0
        self.n_finished = 0

    # -- host-0 API ----------------------------------------------------------

    def submit(self, prompt, max_new: int, sampling,
               seed: Optional[int] = None) -> PumpRequest:
        assert is_primary(), "submit() runs on process 0 only"
        req = PumpRequest(prompt, max_new, sampling, seed)
        if sampling.has_penalties or sampling.stop_token_ids \
                or sampling.logit_bias:
            req.error = ("multi-host serving supports plain sampling "
                         "only (penalties/stop sets/logit bias are not "
                         "broadcast)")
            req._out.put(None)
            return req
        if not (1 <= len(req.prompt) <= self.max_len):
            req.error = (f"prompt length {len(req.prompt)} outside "
                         f"[1, {self.max_len}]")
            req._out.put(None)
            return req
        self.queue.put(req)
        return req

    def start(self) -> None:
        """Host 0: pump rounds on a daemon thread (the HTTP frontend
        blocks its own threads on request streams)."""
        import threading

        assert is_primary()
        if self._thread is not None:
            return
        self._thread = threading.Thread(target=self.run_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    # -- lockstep rounds -----------------------------------------------------

    def _samp_key(self, r) -> tuple:
        s = r.sampling
        base = tuple(getattr(s, k) for k in self._SAMP_KEYS)
        # a sampled request's seed is part of the round key: the round
        # broadcasts ONE seed, so co-batching different explicit seeds
        # would silently break per-seed reproducibility (ADVICE r4).
        # greedy requests (temperature == 0) never consume the seed.
        seed = r.seed if s.temperature > 0 else None
        return base + (seed,)

    def _drain_group(self):
        """Pull up to ``batch`` requests sharing one sampling key. The
        OLDEST deferred request defines the round's key (it has waited
        longest, so a steady stream of another key cannot starve it);
        non-matching requests wait in the deferred deque, consumed
        ahead of the main queue next round."""
        import queue as _q
        from collections import deque

        reqs = []
        kept_def = []                    # deferred, still key-mismatched
        kept_q = []                      # fresh from queue, mismatched
        key = None
        while self._deferred and len(reqs) < self.batch:
            r = self._deferred.popleft()
            k = self._samp_key(r)
            if key is None or k == key:
                key = k
                reqs.append(r)
            else:
                kept_def.append(r)
        while len(reqs) < self.batch:
            try:
                r = self.queue.get_nowait()
            except _q.Empty:
                break
            k = self._samp_key(r)
            if key is None or k == key:
                key = k
                reqs.append(r)
            else:
                kept_q.append(r)
        nxt = deque(kept_def)            # oldest first
        nxt.extend(self._deferred)       # deferred not examined (batch full)
        nxt.extend(kept_q)
        self._deferred = nxt
        return reqs

    def run_round(self, poll_s: float = 0.005) -> bool:
        """One lockstep round on EVERY process. Returns False once a
        stop round has been broadcast (processes then exit their pump
        loops together)."""
        import time

        from jax.experimental import multihost_utils

        from ..engine.sampling import SamplingParams

        B, M = self.batch, self.max_len
        flag = _IDLE
        tokens = np.zeros((B, M), np.int32)
        lens = np.zeros((B,), np.int32)
        ctrl = np.zeros((8,), np.float32)   # max_new + samp vector
        # the seed rides its own int64 slot — a float32 ctrl slot would
        # silently truncate seeds >= 2**24 (ADVICE r4); all requests in
        # a round share one seed by construction (_samp_key groups
        # sampled requests on their seed)
        iseed = np.zeros((1,), np.int64)
        reqs = []
        if is_primary():
            if self._stop.is_set():
                flag = _STOP
            else:
                reqs = self._drain_group()
                if reqs:
                    flag = _SERVE
                    for i, r in enumerate(reqs):
                        tokens[i, :len(r.prompt)] = np.asarray(
                            r.prompt, np.int32)
                        lens[i] = len(r.prompt)
                    s = reqs[0].sampling
                    ctrl[0] = max(r.max_new_tokens for r in reqs)
                    iseed[0] = (reqs[0].seed
                                if reqs[0].seed is not None else
                                self.engine.runtime.seed)
                    ctrl[2:8] = [getattr(s, k) for k in self._SAMP_KEYS]
        flag, tokens, lens, ctrl, iseed = \
            multihost_utils.broadcast_one_to_all(
                (np.int32(flag), tokens, lens, ctrl, iseed))
        flag = int(flag)
        if flag == _STOP:
            return False
        if flag == _IDLE:
            time.sleep(poll_s)
            return True

        tokens, lens, ctrl = map(np.asarray, (tokens, lens, ctrl))
        n = int((lens > 0).sum())
        # pad the round to a full dp-divisible batch with dummy rows
        n_round = -(-max(n, 1) // self.engine.dp) * self.engine.dp
        prompts = [tokens[i, :lens[i]].tolist() if lens[i] > 0 else [0]
                   for i in range(n_round)]
        samp = SamplingParams(
            temperature=float(ctrl[2]), top_k=int(ctrl[3]),
            top_p=float(ctrl[4]), min_p=float(ctrl[5]),
            eos_token_id=int(ctrl[6]), eos_threshold=float(ctrl[7]))
        max_new = int(ctrl[0])
        try:
            outs = self.engine.generate_batch_fused(
                prompts, max_new_tokens=max_new, sampling=samp,
                seed=int(np.asarray(iseed)[0]))
        except Exception as e:
            # every process raised on the same collective program, so
            # lockstep holds; host 0 fails this round's requests and
            # serving continues (SURVEY.md §5.3 clean degradation)
            if is_primary():
                from ..utils.logging import log_event

                log_event("multihost_round_error", error=repr(e))
                for r in reqs:
                    r.error = f"round failed: {e!r}"
                    r._out.put(None)
            return True
        self.n_rounds += 1
        if is_primary():
            for i, r in enumerate(reqs):
                r.tokens = outs[i][: r.max_new_tokens]
                for t in r.tokens:
                    r._out.put(int(t))
                r._out.put(None)
                self.n_finished += 1
        return True

    def run_forever(self, poll_s: float = 0.005) -> None:
        while self.run_round(poll_s):
            pass
