import sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo/benchmarks")
from kernel_smoke import make_state, dense_ref, PAGE
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops import kv_append as ka
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import paged_attention
from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import append_to_pages_at_layer

which = sys.argv[1]
rng = np.random.default_rng(0)
B, KH, G, dh = 4, 4, 2, 128
H = KH * G
seq_lens = [13, 190, 64, 29]
sl = jnp.asarray(seq_lens, jnp.int32)
layer = jnp.asarray(1, jnp.int32)
T = 9
for int8 in (False, True):
    tag = "int8" if int8 else "bf16"
    kv, bt, k, v = make_state(rng, B, KH, dh, seq_lens, int8)
    if which in ("append", "both"):
        kT = jnp.asarray(rng.normal(size=(B, T, KH, dh)), jnp.bfloat16)
        vT = jnp.asarray(rng.normal(size=(B, T, KH, dh)), jnp.bfloat16)
        posT = jnp.asarray(np.stack([np.arange(L-1, L-1+T) for L in seq_lens]), jnp.int32)
        ref = append_to_pages_at_layer(kv, kT, vT, layer, posT, bt)
        got = ka.kv_append(kv, kT, vT, layer, posT, bt, page_size=PAGE)
        for i in range(len(kv)):
            d = float(jnp.max(jnp.abs(got[i].astype(jnp.float32)-ref[i].astype(jnp.float32))))
            print(f"append T=9 leaf{i}[{tag}] maxdiff {d}", flush=True)
    if which in ("attn", "both"):
        # T=9 verify-style query block at unaligned q_offsets
        q9 = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.bfloat16)
        qo = sl - 1
        sc = kv[1] if int8 else None
        out = paged_attention(q9, kv[0], bt, sl + T - 1, qo, sc,
                              layer=layer, page_size=PAGE, num_q_heads=H)
        print(f"attn T=9[{tag}] out finite {bool(jnp.isfinite(out.astype(jnp.float32)).all())}", flush=True)
print("DONE", which)
