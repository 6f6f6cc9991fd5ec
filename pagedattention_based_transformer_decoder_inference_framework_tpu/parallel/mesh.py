"""Device mesh construction + multi-host initialization.

The TPU-native communication backend (SURVEY.md §5.8): the reference has
no distributed layer at all (§2.3 — single-device CUDA only), so this is
a first-class new component. All cross-chip traffic is XLA collectives
over ICI (tensor-parallel 'model' axis) / DCN (data axis across hosts),
emitted by GSPMD from the ``shard_map``-wrapped engine steps
(``engine/engine.py:_shard_step``) — never hand-written transport code.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import ParallelConfig


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on single host).

    Reads JAX_COORDINATOR_ADDRESS etc. when args are None; safe to call
    unconditionally at server startup.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def build_mesh(parallel: ParallelConfig,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ``(data[, seq], model)`` mesh.

    The model (TP) axis is innermost so it maps onto ICI neighbors
    within a slice; the data axis spans hosts/DCN; the optional seq
    (sequence-parallel prefill) axis sits between them so its per-layer
    K/V all-gathers also ride ICI. ``dp * sp * tp`` must equal the
    device count (dp=0 or tp=0 means "infer"; sp defaults to 1 and is
    never inferred).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, tp = parallel.dp, parallel.tp
    sp = max(parallel.sp, 1)
    assert n % sp == 0, f"{n} devices not divisible by sp={sp}"
    ns = n // sp
    if tp <= 0 and dp <= 0:
        dp, tp = 1, ns
    elif tp <= 0:
        assert ns % dp == 0, f"{ns} devices/sp not divisible by dp={dp}"
        tp = ns // dp
    elif dp <= 0:
        assert ns % tp == 0, f"{ns} devices/sp not divisible by tp={tp}"
        dp = ns // tp
    if dp * sp * tp > n:
        raise ValueError(f"dp*sp*tp = {dp}*{sp}*{tp} > {n} devices")
    arr = np.asarray(devices[:dp * sp * tp]).reshape(dp, sp, tp)
    if sp == 1:
        # two-axis mesh when SP is off: every existing (data, model)
        # program and test keeps its exact mesh shape
        return Mesh(arr.reshape(dp, tp),
                    (parallel.data_axis, parallel.model_axis))
    return Mesh(arr, (parallel.data_axis, parallel.seq_axis,
                      parallel.model_axis))
