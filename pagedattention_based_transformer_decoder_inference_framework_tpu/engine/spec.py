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


def stochastic_accept(scaled: jax.Array, drafts: jax.Array,
                      keys_u: jax.Array, keys_re: jax.Array):
    """Speculative acceptance for SAMPLED requests (temperature > 0)
    with a deterministic (prompt-lookup) draft.

    The standard accept/resample rule specialized to a point-mass draft
    distribution: draft token ``d_i`` is accepted with probability
    ``p_i(d_i)`` (the target's own probability of the draft), and on
    the first rejection the replacement is drawn from the renormalized
    leftover ``p_i`` with ``d_i`` removed — so each emitted token is
    distributed EXACTLY as a plain draw from ``p`` (the classic
    speculative-sampling correctness argument with q = delta(d)). If
    every draft is accepted, the bonus token samples ``p_K`` directly.

    scaled:  ``[B, K+1, V]`` masked scaled logits (the distribution
             ``sample()`` draws from — :func:`..sampling.prepare_logits`).
    drafts:  ``[B, K]`` draft tokens.
    keys_u:  ``[B, K]`` PRNG keys for the accept coin at each position.
    keys_re: ``[B, K+1]`` PRNG keys for the resample/bonus draw.
    Returns ``(a [B], fix [B])``: accepted-prefix length and the token
    emitted at position ``a`` (resample at the first rejection, bonus
    draw when ``a == K``).
    """
    B, K1, V = scaled.shape
    K = K1 - 1
    logp = jax.nn.log_softmax(scaled, axis=-1)          # [B, K+1, V]
    p_draft = jnp.take_along_axis(
        logp[:, :K], drafts[..., None], axis=-1)[..., 0]   # [B, K] log p(d)
    u = jax.vmap(jax.vmap(jax.random.uniform))(keys_u)     # [B, K]
    accept = jnp.log(jnp.maximum(u, 1e-30)) < p_draft
    a = jnp.cumprod(accept.astype(jnp.int32), axis=1).sum(axis=1)  # [B]

    # distribution at the emit position: position a (clipped); when all
    # accepted (a == K) the bonus draws the unmodified p_K, otherwise
    # the rejected draft's mass is removed and the rest renormalized
    pos = jnp.minimum(a, K)
    row_logits = jnp.take_along_axis(
        scaled, pos[:, None, None], axis=1)[:, 0]           # [B, V]
    rej_draft = jnp.take_along_axis(
        drafts, jnp.minimum(pos, K - 1)[:, None], axis=1)[:, 0]
    drop = (pos < K)
    onehot = jax.nn.one_hot(rej_draft, V, dtype=bool)
    row_logits = jnp.where(drop[:, None] & onehot, -jnp.inf, row_logits)
    # gather the emit position's key (typed key arrays don't support
    # take_along_axis — go through the raw key data)
    kd = jax.random.key_data(keys_re)                   # [B, K+1, W]
    sel = jnp.take_along_axis(kd, pos[:, None, None], axis=1)[:, 0]
    keys_fix = jax.random.wrap_key_data(sel)
    fix = jax.vmap(jax.random.categorical)(keys_fix, row_logits)
    return a, fix.astype(jnp.int32)


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
