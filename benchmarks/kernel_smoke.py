"""On-TPU kernel smoke matrix (VERDICT r4 Weak #6 / SURVEY.md §4.1).

Runs EVERY decode/append kernel variant — including the ones kept as
measured negative results for other geometries — against a pure-jnp
oracle ON DEVICE, one shape per (variant, kv dtype). Interpret-mode CI
pins the semantics; this pins Mosaic lowering/layout behavior, which
otherwise is only exercised by whichever variants `bench.py` happens
to dispatch and can rot silently across backend upgrades.

Usage (axon tunnel):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_smoke.py

Exit code 0 iff every case passes. Geometry notes: pools are sized so
the INT8 scales flat view slab-tiles (num_pages * page multiple of
1024); dh=128 for the lane-aligned kernels, dh=64 for the packed one.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import (
    append_to_pages_at_layer)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops import (
    kv_append as ka)
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import (
    paged_attention, paged_attention_decode, paged_attention_decode_append,
    paged_attention_decode_batched, paged_attention_decode_grouped,
    paged_attention_decode_packed)

PAGE = 64
RESULTS = []


def check(name, got, want, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = err <= atol and got.shape == want.shape
    RESULTS.append((name, ok, err))
    print(f"{'PASS' if ok else 'FAIL'}  {name:46s} max|diff|={err:.3e}")


def make_state(rng, B, KH, dh, seq_lens, int8, L=2, mp=8):
    num_pages = B * mp + 8
    grain = max(1, 1024 // PAGE)
    num_pages = (num_pages + grain - 1) // grain * grain
    if int8:
        R = -(-(num_pages * PAGE) // 128)     # native slab scales
        kv = (jnp.zeros((L, 2, KH, num_pages, PAGE, dh), jnp.int8),
              jnp.zeros((L, 2, KH, R, 128), jnp.float32))
    else:
        kv = (jnp.zeros((L, 2, KH, num_pages, PAGE, dh), jnp.bfloat16),)
    perm = rng.permutation(num_pages - 1)[: B * mp] + 1
    bt = jnp.asarray(perm.reshape(B, mp), jnp.int32)
    max_len = max(seq_lens)
    k = rng.normal(size=(B, max_len, KH, dh)).astype(np.float32)
    v = rng.normal(size=(B, max_len, KH, dh)).astype(np.float32)
    pos = np.broadcast_to(np.arange(max_len), (B, max_len)).copy()
    for b, Lq in enumerate(seq_lens):
        pos[b, Lq:] = -1
    kv = append_to_pages_at_layer(kv, jnp.asarray(k), jnp.asarray(v),
                                  jnp.int32(1), jnp.asarray(pos), bt)
    return kv, bt, k, v


def dense_ref(q, kv, bt, seq_lens, layer, KH, dh, window=0):
    """Pure-jnp oracle: gather pages densely, masked softmax."""
    B, _, H, _ = q.shape
    G = H // KH
    mp = bt.shape[1]
    vals = jnp.take(kv[0][layer], bt.reshape(-1), axis=2)
    vals = vals.reshape(2, KH, B, mp, PAGE, dh).astype(jnp.float32)
    if len(kv) == 2:
        P = kv[0].shape[3]
        sc5 = kv[1][layer].reshape(2, KH, -1)[:, :, :P * PAGE]
        sc5 = sc5.reshape(2, KH, P, PAGE, 1)
        sc = jnp.take(sc5, bt.reshape(-1), axis=2)
        sc = sc.reshape(2, KH, B, mp, PAGE, 1).astype(jnp.float32)
        vals = vals * sc
    kvd = vals.reshape(2, KH, B, mp * PAGE, dh)
    qf = q.astype(jnp.float32).reshape(B, KH, G, dh) / np.sqrt(dh)
    s = jnp.einsum("bkgd,kbsd->bkgs", qf, kvd[0])
    idx = jnp.arange(mp * PAGE)[None, None, None, :]
    mask = idx < seq_lens[:, None, None, None]
    if window > 0:
        mask &= idx >= (seq_lens[:, None, None, None] - window)
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,kbsd->bkgd", p, kvd[1])
    return o.reshape(B, 1, H, dh)


def main() -> int:
    rng = np.random.default_rng(0)
    B, KH, G, dh = 4, 4, 2, 128
    H = KH * G
    seq_lens = [13, 190, 64, 1]
    sl = jnp.asarray(seq_lens, jnp.int32)
    layer = jnp.asarray(1, jnp.int32)

    for int8 in (False, True):
        tag = "int8" if int8 else "bf16"
        kv, bt, k, v = make_state(rng, B, KH, dh, seq_lens, int8)
        q = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.bfloat16)
        want = dense_ref(q, kv, bt, sl, 1, KH, dh)
        sc = kv[1] if int8 else None
        atol = 0.02  # bf16 q + int8 kv quantization noise vs f32 oracle
        common = dict(layer=layer, page_size=PAGE, num_q_heads=H)

        t0 = time.perf_counter()
        out = paged_attention(q, kv[0], bt, sl, sl - 1, sc, **common)
        check(f"paged_attention[{tag}]", out, want, atol)
        out = paged_attention_decode(q, kv[0], bt, sl, sc, **common)
        check(f"paged_attention_decode[{tag}]", out, want, atol)
        out = paged_attention_decode_grouped(q, kv[0], bt, sl, sc,
                                             **common)
        check(f"paged_attention_decode_grouped[{tag}]", out, want, atol)
        out = paged_attention_decode_batched(q, kv[0], bt, sl, sc,
                                            **common)
        check(f"paged_attention_decode_batched[{tag}]", out, want, atol)
        # windowed variant of the manual-DMA kernel
        want_w = dense_ref(q, kv, bt, sl, 1, KH, dh, window=37)
        out = paged_attention_decode(q, kv[0], bt, sl, sc, window=37,
                                     **common)
        check(f"paged_attention_decode[{tag},window]", out, want_w, atol)

        # fused append+attend: oracle = functional append + dense ref
        k_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.bfloat16)
        v_new = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.bfloat16)
        kv_ref = append_to_pages_at_layer(
            kv, k_new, v_new, layer, sl[:, None], bt)
        want_f = dense_ref(q, kv_ref, bt, sl + 1, 1, KH, dh)
        out, kv_f = paged_attention_decode_append(
            q, kv, k_new, v_new, bt, sl + 1, sl[:, None], layer,
            page_size=PAGE, num_q_heads=H)
        check(f"paged_attention_decode_append[{tag}]", out, want_f, atol)
        for i in range(len(kv)):
            check(f"decode_append pool leaf {i}[{tag}]", kv_f[i],
                  kv_ref[i], 0.0)

        # append kernels: RMW batch (T=1), RMW sequential (T>1,
        # speculative verify), page-aligned prefill chunk
        kv_r1 = ka.kv_append(kv, k_new, v_new, layer, sl[:, None], bt,
                             page_size=PAGE)
        check(f"kv_append rmw T=1[{tag}]", kv_r1[0], kv_ref[0], 0.0)
        if int8:
            check(f"kv_append rmw T=1 scales[{tag}]", kv_r1[1],
                  kv_ref[1], 0.0)
        kT = jnp.asarray(rng.normal(size=(B, 3, KH, dh)), jnp.bfloat16)
        vT = jnp.asarray(rng.normal(size=(B, 3, KH, dh)), jnp.bfloat16)
        posT = jnp.asarray(np.stack([np.arange(Lq, Lq + 3)
                                     for Lq in seq_lens]), jnp.int32)
        ref_T = append_to_pages_at_layer(kv, kT, vT, layer, posT, bt)
        got_T = ka.kv_append(kv, kT, vT, layer, posT, bt, page_size=PAGE)
        check(f"kv_append rmw T=3[{tag}]", got_T[0], ref_T[0], 0.0)
        kP = jnp.asarray(rng.normal(size=(B, PAGE, KH, dh)), jnp.bfloat16)
        vP = jnp.asarray(rng.normal(size=(B, PAGE, KH, dh)), jnp.bfloat16)
        posP = jnp.asarray(np.broadcast_to(np.arange(PAGE), (B, PAGE)),
                           jnp.int32)
        ref_P = append_to_pages_at_layer(kv, kP, vP, layer, posP, bt)
        got_P = ka.kv_append(kv, kP, vP, layer, posP, bt, page_size=PAGE)
        check(f"kv_append prefill chunk[{tag}]", got_P[0], ref_P[0], 0.0)
        print(f"  [{tag}] block wall: {time.perf_counter() - t0:.1f}s")

    # packed kernel: sub-128 head dim on an UNPADDED dh=64 pool
    for int8 in (False, True):
        tag = "int8" if int8 else "bf16"
        kv, bt, k, v = make_state(rng, B, KH, 64, seq_lens, int8)
        q = jnp.asarray(rng.normal(size=(B, 1, H, 64)), jnp.bfloat16)
        want = dense_ref(q, kv, bt, sl, 1, KH, 64)
        out = paged_attention_decode_packed(
            q, kv[0], bt, sl, kv[1] if int8 else None, layer=layer,
            page_size=PAGE, num_q_heads=H)
        check(f"paged_attention_decode_packed[{tag},dh=64]", out, want,
              0.02)

    n_fail = sum(not ok for _, ok, _ in RESULTS)
    print(f"\n{len(RESULTS) - n_fail}/{len(RESULTS)} kernel cases pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
