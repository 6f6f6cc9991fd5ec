import sys
import numpy as np, jax, jax.numpy as jnp
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops import kv_append as ka
from pagedattention_based_transformer_decoder_inference_framework_tpu.ops.paged_attention import paged_attention, paged_attention_decode
from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.pool import append_to_pages_at_layer

which = sys.argv[1]
PAGE = 64
rng = np.random.default_rng(0)
B, KH, G, dh = 4, 4, 2, 128
H = KH * G
L = 2
num_pages = 40          # 40*64 = 2560 -> R = 20 (NOT 8-aligned)
R = -(-(num_pages * PAGE) // 128)
kv = (jnp.zeros((L, 2, KH, num_pages, PAGE, dh), jnp.int8),
      jnp.zeros((L, 2, KH, R, 128), jnp.float32))
perm = rng.permutation(num_pages - 1)[: B * 8] + 1
bt = jnp.asarray(perm.reshape(B, 8), jnp.int32)
seq_lens = [13, 190, 64, 29]
sl = jnp.asarray(seq_lens, jnp.int32)
layer = jnp.asarray(1, jnp.int32)
max_len = max(seq_lens)
k = rng.normal(size=(B, max_len, KH, dh)).astype(np.float32)
v = rng.normal(size=(B, max_len, KH, dh)).astype(np.float32)
pos = np.broadcast_to(np.arange(max_len), (B, max_len)).copy()
for b, Lq in enumerate(seq_lens): pos[b, Lq:] = -1
kv = append_to_pages_at_layer(kv, jnp.asarray(k), jnp.asarray(v), jnp.int32(1), jnp.asarray(pos), bt)
jax.block_until_ready(kv)
print("setup ok", flush=True)
T = 9
if which in ("append","all"):
    kT = jnp.asarray(rng.normal(size=(B, T, KH, dh)), jnp.bfloat16)
    vT = jnp.asarray(rng.normal(size=(B, T, KH, dh)), jnp.bfloat16)
    posT = jnp.asarray(np.stack([np.arange(Lq-1, Lq-1+T) for Lq in seq_lens]), jnp.int32)
    got = ka.kv_append(kv, kT, vT, layer, posT, bt, page_size=PAGE)
    jax.block_until_ready(got)
    print("append T=9 ok", flush=True)
if which in ("append1","all"):
    k1 = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.bfloat16)
    v1 = jnp.asarray(rng.normal(size=(B, 1, KH, dh)), jnp.bfloat16)
    got = ka.kv_append(kv, k1, v1, layer, sl[:, None], bt, page_size=PAGE)
    jax.block_until_ready(got)
    print("append T=1 ok", flush=True)
if which in ("attn","all"):
    q9 = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.bfloat16)
    out = paged_attention(q9, kv[0], bt, sl + T - 1, sl - 1, kv[1],
                          layer=layer, page_size=PAGE, num_q_heads=H)
    jax.block_until_ready(out)
    print("general attn T=9 ok", flush=True)
if which in ("dec","all"):
    q1 = jnp.asarray(rng.normal(size=(B, 1, H, dh)), jnp.bfloat16)
    out = paged_attention_decode(q1, kv[0], bt, sl, kv[1],
                          layer=layer, page_size=PAGE, num_q_heads=H)
    jax.block_until_ready(out)
    print("decode fast ok", flush=True)
print("DONE")
