"""PartitionSpecs for the param / KV pytrees (Megatron-style TP layout).

Column-parallel: q/k/v and MLP gate/up (output dim over 'model').
Row-parallel:    o and MLP down (input dim over 'model'; psum epilogue
                 lives in ``models/model.py``).
Vocab-parallel:  embedding rows and LM-head columns.
KV pool:         kv-head axis over 'model' (pages shrink per chip as
                 chips are added — SURVEY.md §5.7); block tables and
                 lengths are replicated metadata.

Works for both dense arrays and INT8 :class:`QTensor` leaves (values and
their per-channel scales shard together).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, ParallelConfig
from ..quant.tensor import Q4Tensor, QTensor

# layer-stacked weights [L, in, out]: shard the named dim over 'model'
_COL = {"wq", "wk", "wv", "w_gate", "w_up",
        "w_qkv", "w_gu"}                           # shard dim -1
_ROW = {"wo", "w_down"}                            # shard dim -2
_COL_BIAS = {"bq", "bk", "bv", "b_up", "b_qkv"}    # [L, out] shard dim -1


def _layer_spec(name: str, leaf: Any, m: str, stacked: bool = True):
    def spec(*dims):
        return P(*(((None,) if stacked else ()) + dims))

    if name.startswith("we_"):
        # MoE expert weights [(L,) E, in, out]: whole experts shard over
        # the 'model' axis (expert parallelism); per-expert scales
        # [(L,) E, 1, out] shard the same expert axis
        w = spec(m, None, None)
        if isinstance(leaf, QTensor):
            return QTensor(w, spec(m, None, None))
        return w
    if name == "router":
        return P()                                 # replicated [(L,) D, E]
    if name in _COL:
        w = spec(None, m)
        if isinstance(leaf, QTensor):
            return QTensor(w, spec(None, m))       # scales [(L,) 1, out]
        if isinstance(leaf, Q4Tensor):
            # carrier [K, N/2] and scales [K/group, N] both shard their
            # column axis; pack blocks never straddle shards
            # (quantize_int4_groupwise col_shards)
            return Q4Tensor(spec(None, m), spec(None, m),
                            leaf.group, leaf.bn)
        return w
    if name in _ROW:
        w = spec(m, None)
        if isinstance(leaf, QTensor):
            return QTensor(w, P())                 # scales [(L,) 1, D]
        if isinstance(leaf, Q4Tensor):
            # K-sharded: carrier rows and the K-group scale axis split
            # over 'model' (group | K/tp asserted at quantize time)
            return Q4Tensor(spec(m, None), spec(m, None),
                            leaf.group, leaf.bn)
        return w
    if name in _COL_BIAS:
        return spec(m)
    return P()                                     # norms, bo, b_down


def param_pspecs(params: Dict[str, Any], parallel: ParallelConfig):
    """PartitionSpec pytree matching ``params``' structure (stacked
    layer dict or unrolled tuple of per-layer dicts)."""
    m = parallel.model_axis
    specs: Dict[str, Any] = {}
    for k, v in params.items():
        if k == "layers" and isinstance(v, (tuple, list)):
            specs[k] = tuple(
                {n: _layer_spec(n, leaf, m, stacked=False)
                 for n, leaf in lp.items()} for lp in v)
        elif k == "layers":
            specs[k] = {n: _layer_spec(n, leaf, m) for n, leaf in v.items()}
        elif k == "embedding":
            specs[k] = P(m, None)                  # vocab rows
        elif k == "lm_head":
            w = P(None, m)                         # vocab cols
            if isinstance(v, QTensor):
                w = QTensor(w, P(None, m))
            elif isinstance(v, Q4Tensor):
                w = Q4Tensor(P(None, m), P(None, m), v.group, v.bn)
            specs[k] = w
        else:
            specs[k] = P()                         # pos_embedding, final norm
    return specs


def kv_pspec(kv_state, parallel: ParallelConfig):
    """Spec tree for the paged KV state: kv-head axis over 'model',
    pages axis over 'data'.

    Pool leaves are ``[L, KH, P, page, dh]`` (or ``[L, KH, P, page]``
    scales). Sharding P over 'data' gives every data shard its own
    private sub-pool addressed by *local* page ids (the engine keeps one
    allocator per data shard) — in-place page writes can never race
    across shards, and no HBM is wasted on replicated pools.
    """
    m, d = parallel.model_axis, parallel.data_axis
    # pool leaves: values [L, 2, KH, P, page, dh] and FLAT scales
    # [L, 2, KH, S] — both put KH on dim 2 ('model') and the page/slot
    # axis on dim 3 ('data'; S = P*page stays dp-divisible because P is)
    return jax.tree_util.tree_map(
        lambda x: P(None, None, m, d) if x.ndim >= 4 else P(), kv_state)


def samp_pspecs(samp: Dict[str, Any], parallel: ParallelConfig):
    """Per-request sampling knobs are batch-sharded."""
    return {k: P(parallel.data_axis) for k in samp}


def pad_vocab(params: Dict[str, Any], cfg: ModelConfig, tp: int,
              multiple: int = 128) -> int:
    """Pad vocab-dim params in place-ish so vocab divides ``tp``.

    Returns the padded vocab size. Padded embedding rows are zero (so
    masked-take+psum stays exact); padded logits are sliced off before
    sampling in the sharded step.
    """
    v = cfg.vocab_size
    vp = -(-v // (tp * multiple)) * (tp * multiple)
    if vp == v:
        return v
    pad = vp - v
    emb = params["embedding"]
    params["embedding"] = jnp.pad(emb, ((0, pad), (0, 0)))
    if "lm_head" in params:
        head = params["lm_head"]
        if isinstance(head, QTensor):
            params["lm_head"] = QTensor(
                jnp.pad(head.values, ((0, 0), (0, pad))),
                jnp.pad(head.scales, ((0, 0), (0, pad)),
                        constant_values=1.0))
        else:
            params["lm_head"] = jnp.pad(head, ((0, 0), (0, pad)))
    return vp


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 parallel: ParallelConfig) -> Dict[str, Any]:
    """Place the param pytree on the mesh with the TP layout."""
    specs = param_pspecs(params, parallel)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)))
