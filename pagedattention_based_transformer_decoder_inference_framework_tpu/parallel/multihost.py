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
