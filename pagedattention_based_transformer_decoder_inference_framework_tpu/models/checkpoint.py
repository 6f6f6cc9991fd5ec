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

from ..quant.tensor import QTensor

_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, QTensor):
        out[prefix + ".qvalues"] = np.asarray(tree.values)
        out[prefix + ".qscales"] = np.asarray(tree.scales)
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def save_params(params: Any, path: str) -> None:
    flat = _flatten(params)
    np.savez(path, **flat)


def load_params(path: str, dtype=None) -> Any:
    data = np.load(path)
    tree: Dict[str, Any] = {}
    qt: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        if key.endswith(".qvalues") or key.endswith(".qscales"):
            base, kind = key.rsplit(".", 1)
            qt.setdefault(base, {})[kind] = data[key]
            continue
        _insert(tree, key.split(_SEP), _cast(data[key], dtype))
    for base, parts in qt.items():
        _insert(tree, base.split(_SEP),
                QTensor(jnp.asarray(parts["qvalues"]),
                        jnp.asarray(parts["qscales"])))
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
