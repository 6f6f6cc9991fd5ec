"""KV-cache snapshot/restore.

Capability parity with the reference's whole-cache binary checkpoints
(GPU ``KVTileCache::save_to_file/load_from_file``,
``kv_cache/kv_tile_cache.cpp:106-125``; CPU ``save/load``,
``kv_cache/kv_tile_cache_cpu.cpp:90-123``) — here a snapshot captures
the *live session*: page pool (+ INT8 scales), block tables, sequence
lengths, per-sequence page lists and last tokens, so a generation can
be suspended to disk and resumed (session persistence / warm restarts).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from ..engine.engine import Engine, EngineState


def save_kv_state(state: "EngineState", path: str) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state.kv)
    arrays = {f"kv_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["block_tables"] = state.block_tables
    arrays["seq_lens"] = state.seq_lens
    arrays["last_tokens"] = state.last_tokens
    arrays["finished"] = state.finished
    arrays["rng"] = np.asarray(jax.random.key_data(state.rng))
    meta = json.dumps({"pages": state.pages, "num_kv": len(leaves)})
    np.savez(path, __meta__=np.frombuffer(meta.encode(), np.uint8),
             **arrays)


def load_kv_state(engine: "Engine", path: str) -> "EngineState":
    """Rebuild an EngineState; re-registers its pages with the
    allocator (single data shard)."""
    from ..engine.engine import EngineState

    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    kv = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(engine.backend.pool.init()),
        [jnp.asarray(data[f"kv_{i}"]) for i in range(meta["num_kv"])])
    pages = [list(map(int, ps)) for ps in meta["pages"]]
    # reclaim the snapshot's pages from the allocator
    alloc = engine.allocator
    for ps in pages:
        for p in ps:
            alloc.claim(p)
    rng = jax.random.wrap_key_data(jnp.asarray(data["rng"]))
    return EngineState(
        kv=kv, block_tables=data["block_tables"],
        seq_lens=data["seq_lens"], pages=pages, rng=rng,
        last_tokens=data["last_tokens"], finished=data["finished"])
