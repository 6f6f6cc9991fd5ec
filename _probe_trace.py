import glob, gzip, json, sys, time, collections
import numpy as np, jax
from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import Engine
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import SamplingParams
from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.profiling import trace

def cdiv(a,b): return -(-a//b)
MODEL = sys.argv[1] if len(sys.argv)>1 else "llama3-8b"
B, P, S, K = 4, 64, 128, 8
page = 64
cfg = FrameworkConfig()
cfg.model = preset(MODEL)
cfg.model.quant = "int8"
total = P + S + 8
npages = B * cdiv(total, page) + 64 + B*(cdiv(K,page)+1)
grain = max(1, 1024 // page)
npages = cdiv(npages, grain) * grain
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
out = eng.generate_batch_spec(prompts, S, samp, spec_k=K)
t0=time.perf_counter(); eng.generate_batch_spec(prompts, S, samp, spec_k=K); dt=time.perf_counter()-t0
print("spec wall tok/s", B*S/dt, flush=True)
d="/tmp/spectrace"
import shutil; shutil.rmtree(d, ignore_errors=True)
with trace(d):
    eng.generate_batch_spec(prompts, S, samp, spec_k=K)
paths = sorted(glob.glob(f"{d}/**/*.trace.json.gz", recursive=True))
ev = json.load(gzip.open(paths[-1]))["traceEvents"]
names = {e["pid"]: e["args"].get("name","") for e in ev
         if e.get("ph")=="M" and e.get("name")=="process_name"}
dev = {p for p,n in names.items() if "/device:" in n}
agg = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get("ph")=="X" and e["pid"] in dev and e.get("dur"):
        n = e.get("name","?")
        # skip module-level umbrella rows
        if n.startswith("jit_"): continue
        agg[n]+=e["dur"]; cnt[n]+=1
tot=sum(agg.values())
print(f"total device op-sum us: {tot:.0f}")
for n,us in agg.most_common(25):
    print(f"{us:>10.0f}us  x{cnt[n]:<6} {n[:110]}")
