"""Prompt-lookup speculative decoding: n-gram drafting on device.

A TPU-native serving capability beyond the reference's feature set
(whose decode loop re-runs the full sequence per token,
``decoder/cuda_decoder.cu:52-57``): decode is weight-stream bound, so a
``(k+1)``-token verify forward costs roughly the same HBM time as a
1-token step — every accepted draft token is close to free. Drafts come
from the sequence's own history (the "prompt lookup" scheme): find the
most recent earlier occurrence of the trailing ``n``-gram and propose
the ``k`` tokens that followed it. No draft model, no extra weights,
exact greedy outputs (acceptance is argmax equality).

Everything here is shape-static jnp so it runs inside the engine's
fused whole-request program (``Engine._build_generate_spec``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draft_ngram(buf: jax.Array, cur: jax.Array, *, k: int,
                n: int) -> jax.Array:
    """Draft ``k`` continuation tokens per sequence by n-gram lookup.

    buf: ``[B, M]`` int32 token history (``buf[b, :cur[b]]`` valid).
    cur: ``[B]`` int32 number of valid tokens.
    Returns ``[B, k]`` int32 drafts. When the trailing ``n``-gram
    ``buf[cur-n:cur]`` re-occurs earlier in the history, the draft is
    the ``k`` tokens following its most recent earlier occurrence;
    otherwise the last token repeated (a guess the verify step simply
    rejects — correctness never depends on draft quality).
    """
    M = buf.shape[1]

    def one(row: jax.Array, c: jax.Array) -> jax.Array:
        idx = jnp.arange(M, dtype=jnp.int32)
        # eq[j] = the n-gram starting at j matches the trailing n-gram
        eq = jnp.ones((M,), bool)
        for t in range(n):
            ctx = row[jnp.clip(c - n + t, 0, M - 1)]
            eq &= jnp.roll(row, -t) == ctx
        # candidate must end strictly before the trailing n-gram itself
        # (j + n <= c - 1) so the draft starts at a historical token
        eq &= (idx + n) <= (c - 1)
        j = jnp.max(jnp.where(eq, idx, -1))
        start = jnp.where(j >= 0, j + n, 0)
        draft = jax.lax.dynamic_slice(row, (start,), (k,))
        last = row[jnp.clip(c - 1, 0, M - 1)]
        return jnp.where(j >= 0, draft, jnp.full((k,), last, row.dtype))

    return jax.vmap(one)(buf, cur)


def accept_counts(drafts: jax.Array, targets: jax.Array) -> jax.Array:
    """Longest accepted prefix: ``a[b]`` = number of leading positions
    where ``drafts[b, i] == targets[b, i]`` (greedy acceptance)."""
    match = (drafts == targets).astype(jnp.int32)
    return jnp.cumprod(match, axis=1).sum(axis=1)


def write_rows(buf: jax.Array, starts: jax.Array,
               vals: jax.Array) -> jax.Array:
    """Per-row dynamic write: ``buf[b, starts[b]:starts[b]+W] = vals[b]``."""
    def one(row, s, v):
        return jax.lax.dynamic_update_slice(row, v.astype(row.dtype), (s,))

    return jax.vmap(one)(buf, starts, vals)


def gather_rows(buf: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """Per-row dynamic gather: ``buf[b, starts[b]:starts[b]+width]``."""
    def one(row, s):
        return jax.lax.dynamic_slice(row, (s,), (width,))

    return jax.vmap(one)(buf, starts)
