"""Backend routing: tpu / cpu / auto.

Capability parity with the reference's web backend router
(``web/backend_router.py:7-26``: pre-built GPU and CPU decoders picked
by ``BACKEND_MODE``). On TPU-first JAX the same engine code serves both
targets; "cpu" forces interpret-mode Pallas (runs anywhere), "auto"
picks the TPU when one is attached (the reference's "auto" always fell
through to CPU — Appendix A).
"""

from __future__ import annotations

from typing import Optional

from ..config import FrameworkConfig
from ..utils.platform import on_tpu


def resolve_backend(mode: str) -> str:
    if mode == "auto":
        return "tpu" if on_tpu() else "cpu"
    assert mode in ("tpu", "cpu"), f"unknown backend {mode!r}"
    return mode


def build_engine(config: FrameworkConfig, params=None, mesh=None,
                 seed: int = 0):
    """Engine factory honoring ``config.server.backend`` and
    ``config.weights_path`` (a native ``.npz`` checkpoint — the output
    of ``models/hf_stream.py`` import or ``checkpoint.save_params``;
    INT8-quantized checkpoints load as :class:`QTensor` leaves)."""
    from .engine import Engine

    backend = resolve_backend(config.server.backend)
    if backend == "tpu" and not on_tpu():
        raise RuntimeError("backend 'tpu' requested but no TPU attached")
    interpret = backend == "cpu"
    p = config.parallel
    if mesh is None and (p.dp != 1 or p.tp != 1 or p.sp != 1):
        # config asks for parallelism (dp/tp/sp != 1; 0 = infer): build
        # the single-process mesh here so `serve`/CLI users are not
        # silently downgraded to one device (multi-process meshes are
        # built by the caller after jax.distributed init)
        from ..parallel import build_mesh

        mesh = build_mesh(p)
    if params is None and config.weights_path:
        import os

        if os.path.isdir(config.weights_path):
            # an HF checkpoint directory: stream-import in place
            # (config.model should match — see hf_stream.config_from_hf)
            from ..models.hf_stream import (import_hf_streaming,
                                            load_flat_params)

            q = (config.model.quant
                 if config.model.quant in ("int8", "int8-weight")
                 else None)
            params = load_flat_params(import_hf_streaming(
                config.weights_path, config.model, quant=q))
        else:
            from ..models.checkpoint import load_params

            params = load_params(config.weights_path)
    return Engine(config, params=params, interpret=interpret, seed=seed,
                  mesh=mesh)
