"""Checkpoint/resume tests (SURVEY.md §5.4): weight round-trip incl.
INT8, and KV-session snapshot/restore continuing a generation exactly."""

import numpy as np
import pytest

import jax

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, RuntimeConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import (
    Engine, SamplingParams)
from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.snapshot import (
    load_kv_state, save_kv_state)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.checkpoint import (
    load_params, save_params)
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
    init_params, quantize_params)
from pagedattention_based_transformer_decoder_inference_framework_tpu.quant.tensor import QTensor

GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


def make_cfg(kv_dtype="float32"):
    cfg = FrameworkConfig(
        model=preset("llama-tiny"),
        cache=CacheConfig(page_size=8, num_pages=64, max_pages_per_seq=8,
                          kv_dtype=kv_dtype),
        runtime=RuntimeConfig(max_new_tokens=8),
    )
    cfg.model.dtype = "float32"
    return cfg


def test_params_roundtrip(tmp_path):
    cfg = make_cfg().model
    params = init_params(cfg, jax.random.key(0))
    path = str(tmp_path / "w.npz")
    save_params(params, path)
    loaded = load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_roundtrip_int8(tmp_path):
    cfg = make_cfg().model
    params = quantize_params(init_params(cfg, jax.random.key(1)))
    path = str(tmp_path / "wq.npz")
    save_params(params, path)
    loaded = load_params(path)
    assert isinstance(loaded["layers"]["wq"], QTensor)
    assert loaded["layers"]["wq"].values.dtype == np.int8
    e0 = Engine(make_cfg(), params=params, interpret=True)
    e1 = Engine(make_cfg(), params=loaded, interpret=True)
    assert (e0.generate([1, 2, 3], 5, GREEDY)
            == e1.generate([1, 2, 3], 5, GREEDY))


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_kv_snapshot_resume(tmp_path, kv_dtype):
    cfg = make_cfg(kv_dtype)
    eng = Engine(cfg, interpret=True)
    prompts = [[2, 4, 6], [9, 8, 7, 6]]
    ref = eng.generate_batch(prompts, 8, GREEDY)

    # run 3 tokens, snapshot, resume in a fresh engine, run 5 more
    state = eng.prefill(prompts, sampling=GREEDY)
    outs = [[int(t)] for t in state.last_tokens]
    for _ in range(2):
        for b, t in enumerate(eng.decode(state, GREEDY)):
            outs[b].append(int(t))
    path = str(tmp_path / "kv.npz")
    save_kv_state(state, path)

    eng2 = Engine(cfg, params=eng.params, interpret=True)
    state2 = load_kv_state(eng2, path)
    assert eng2.allocator.num_live == sum(len(p) for p in state2.pages)
    for _ in range(5):
        for b, t in enumerate(eng2.decode(state2, GREEDY)):
            outs[b].append(int(t))
    eng2.free(state2)
    assert outs == ref
    assert eng2.allocator.num_live == 0
