import time, numpy as np, jax
from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import Engine
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import SamplingParams

def cdiv(a,b): return -(-a//b)
B, P, S, K = 4, 64, 128, 8
page = 64
cfg = FrameworkConfig()
cfg.model = preset("tinyllama-1.1b")
cfg.model.quant = "int8"
total = P + S + 8
npages = B * (cdiv(total, page) + 2) + 8 + B*(cdiv(K,page)+1)
cfg.cache = CacheConfig(page_size=page, num_pages=npages,
                        max_pages_per_seq=cdiv(total,page)+2+cdiv(K,page)+1,
                        kv_dtype="int8")
cfg.runtime.prefill_chunk = 256
cfg.runtime.max_batch_size = B
eng = Engine(cfg, seed=0)
samp = SamplingParams(temperature=0.0, eos_token_id=-1)
rng = np.random.default_rng(0)
motif = rng.integers(0, cfg.model.vocab_size, (B,16)).tolist()
prompts = [(m * cdiv(P,16))[:P] for m in motif]

# fused greedy reference
out = eng.generate_batch_fused(prompts, max_new_tokens=S, sampling=samp)
t0=time.perf_counter(); out = eng.generate_batch_fused(prompts, max_new_tokens=S, sampling=samp); tf=time.perf_counter()-t0
print("fused tok/s", B*S/tf)

# simulate prompt-lookup acceptance on the actual greedy streams
n=3
tot_acc=[]
for b in range(B):
    seq = list(prompts[b])
    gen = list(out[b])
    full = seq + gen
    i = len(seq)  # position where generation starts
    iters=0; accs=[]
    pos = i
    while pos < len(full):
        # draft from history full[:pos]
        h = full[:pos]
        gramm = h[-n:]
        j = -1
        for s in range(len(h)-n-1, -1, -1):
            if h[s:s+n]==gramm: j=s; break
        if j>=0:
            draft = (full[:pos]+[0]*K)[j+n:j+n+K]
            draft = (draft+[h[-1]]*K)[:K]
        else:
            draft = [h[-1]]*K
        tgt = full[pos:pos+K]
        a=0
        for d,t in zip(draft,tgt):
            if d==t: a+=1
            else: break
        accs.append(a)
        pos += a+1
        iters+=1
    print(f"lane {b}: iters={iters} steps={len(gen)} mean_accept={np.mean(accs):.2f}")
    tot_acc.append(np.mean(accs))
print("overall mean accept", np.mean(tot_acc))

# actual spec run
out2 = eng.generate_batch_spec(prompts, S, samp, spec_k=K)
t0=time.perf_counter(); out2 = eng.generate_batch_spec(prompts, S, samp, spec_k=K); ts=time.perf_counter()-t0
print("spec tok/s", B*S/ts, "match", all(list(a)==list(b) for a,b in zip(out,out2)))
