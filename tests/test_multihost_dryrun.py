"""Two-'host' x 8-chip dryrun for the Llama-3-70B sharding topology
(BASELINE config 5: 70B tensor-sharded across 2+ hosts).

Runs in a subprocess with 16 virtual CPU devices (the main test process
is pinned to 8), using the 70B head-ratio twin preset: tp=8 over the
'ICI' axis (KH=8 -> one KV head per chip, GQA group 2) and dp=2 over
the 'DCN' axis, with INT8 weights + INT8 KV — the full 70B parallelism
plan at toy dimensions.
"""

import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
# same mitigation as conftest.py: the virtual multi-device CPU client
# has a rare async-dispatch buffer race that shows up under machine
# load (this subprocess does not inherit the parent's jax.config)
jax.config.update("jax_cpu_enable_async_dispatch", False)
import numpy as np
from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, ParallelConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine, SamplingParams)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    init_params)
from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import build_mesh

assert len(jax.devices()) == 16
cfg = FrameworkConfig()
cfg.model = preset("llama70b-shard-tiny")
cfg.model.dtype = "float32"
cfg.model.quant = "int8"
cfg.cache = CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                        kv_dtype="int8")
cfg.parallel = ParallelConfig(dp=2, tp=8)
cfg.runtime.prefill_chunk = 16

params = init_params(cfg.model, jax.random.key(0))
ref = Engine(cfg, params=params)
mesh = build_mesh(cfg.parallel)
prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5], [2, 4]]
g = SamplingParams(temperature=0.0, eos_token_id=-1)
st_r = ref.prefill(prompts)
lr = np.asarray(st_r.prefill_logits)
toks = np.asarray([10, 11, 12, 13], np.int32)
dr = ref.decode_forced(st_r, toks)

# one retry with a rebuilt engine: rare XLA:CPU virtual-device buffer
# corruption heals on rebuild (see conftest.py); w8a8 under TP also
# legitimately differs by per-shard activation-quantization noise.
# Flake fingerprint: corruption is garbage-scale, so a small-but-over-
# tolerance drift fails immediately (deterministic sharding regression)
for attempt in range(3):
    sh = Engine(cfg, params=params, mesh=mesh)
    b = sh.generate_batch_fused(prompts, max_new_tokens=4, sampling=g)
    st_s = sh.prefill(prompts)
    ls = np.asarray(st_s.prefill_logits)
    ds = sh.decode_forced(st_s, toks)
    d = np.abs(ls - lr).max()
    d2 = np.abs(ds - dr).max()
    if d < 0.1 and d2 < 0.1:
        break
    assert max(d, d2) > 1.0, (
        f"small systematic divergence (d={d:.3e} d2={d2:.3e}) — "
        "deterministic sharding regression, not the infra flake")
assert d < 0.1, f"logit divergence {d}"
assert d2 < 0.1, f"decode divergence {d2}"
# quant noise must not move the argmax where the reference top-1 is
# clearly separated (near-ties legitimately flip on FP reassociation;
# a wrong collective scrambles logits wholesale, margins included)
for got, want in ((ls, lr), (np.asarray(ds), np.asarray(dr))):
    top2 = np.sort(want, axis=-1)[..., -2:]
    clear = (top2[..., 1] - top2[..., 0]) > 0.2
    match = got.argmax(-1) == want.argmax(-1)
    assert (match | ~clear).all(), "argmax moved on a clear-margin row"
print("OK dp=2 tp=8 int8:", [len(x) for x in b])
"""


@pytest.mark.slow
def test_70b_topology_dryrun_2hosts():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK dp=2 tp=8 int8" in out.stdout
