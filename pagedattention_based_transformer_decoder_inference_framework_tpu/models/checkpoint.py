"""Weight checkpointing: save/load the param pytree (INT8-aware).

Replaces the reference's raw per-tensor ``.bin`` tree
(``weights/README.md:26-59``) with a single ``.npz`` holding flattened
pytree paths — including :class:`QTensor` leaves (values + scales), so
offline-quantized checkpoints round-trip losslessly. HF import lives in
``hf_import.py``; this is the native format.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.tensor import Q4Tensor, QTensor

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:                    # pragma: no cover
    _BF16 = None

_SEP = "/"
# npz cannot represent bfloat16 (numpy's .npy descr rejects it on
# load); bf16 arrays are stored as their raw uint16 bits under a
# ``.bf16`` key suffix and viewed back on load.
_BF16_SUFFIX = ".bf16"


def save_flat(flat: Dict[str, np.ndarray], path: str) -> None:
    """Write a flat ``key -> array`` dict as ``.npz`` (bf16-safe)."""
    enc: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if _BF16 is not None and v.dtype == _BF16:
            enc[k + _BF16_SUFFIX] = v.view(np.uint16)
        else:
            enc[k] = v
    np.savez(path, **enc)


def load_flat(path: str) -> Dict[str, np.ndarray]:
    """Read a flat dict written by :func:`save_flat`."""
    data = np.load(path)
    out: Dict[str, np.ndarray] = {}
    for k in data.files:
        if k.endswith(_BF16_SUFFIX):
            assert _BF16 is not None, "ml_dtypes required for bf16 load"
            out[k[: -len(_BF16_SUFFIX)]] = data[k].view(_BF16)
        else:
            out[k] = data[k]
    return out


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, QTensor):
        out[prefix + ".qvalues"] = np.asarray(tree.values)
        out[prefix + ".qscales"] = np.asarray(tree.scales)
    elif isinstance(tree, Q4Tensor):
        out[prefix + ".q4packed"] = np.asarray(tree.packed)
        out[prefix + ".q4scales"] = np.asarray(tree.scales)
        out[prefix + ".q4meta"] = np.asarray([tree.group, tree.bn],
                                             np.int64)
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def save_params(params: Any, path: str) -> None:
    save_flat(_flatten(params), path)


def load_params(path: str, dtype=None) -> Any:
    data = load_flat(path)
    tree: Dict[str, Any] = {}
    qt: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in data.items():
        if key.endswith((".qvalues", ".qscales", ".q4packed",
                         ".q4scales", ".q4meta")):
            base, kind = key.rsplit(".", 1)
            qt.setdefault(base, {})[kind] = v
            continue
        _insert(tree, key.split(_SEP), _cast(v, dtype))
    for base, parts in qt.items():
        if "q4packed" in parts:
            group, bn = (int(x) for x in parts["q4meta"])
            leaf = Q4Tensor(jnp.asarray(parts["q4packed"]),
                            jnp.asarray(parts["q4scales"]), group, bn)
        else:
            leaf = QTensor(jnp.asarray(parts["qvalues"]),
                           jnp.asarray(parts["qscales"]))
        _insert(tree, base.split(_SEP), leaf)
    return tree


def _cast(x: np.ndarray, dtype):
    arr = jnp.asarray(x)
    if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
        arr = arr.astype(dtype)
    return arr


def _insert(tree: Dict[str, Any], keys, value) -> None:
    for k in keys[:-1]:
        tree = tree.setdefault(k, {})
    tree[keys[-1]] = value
