"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5: distributed tests without a cluster).

Checks that the TP+DP sharded engine produces the same results as the
single-device engine on identical weights — collectives (psum after
row-parallel projections, all-gather of vocab-sharded logits, masked
embedding take) must be exact up to float associativity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, ParallelConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.engine import Engine
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine.sampling import SamplingParams
from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import init_params
from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import build_mesh


def make_config(dp=2, tp=4):
    cfg = FrameworkConfig()
    cfg.model = preset("llama-shard-tiny")
    cfg.model.dtype = "float32"
    cfg.cache = CacheConfig(page_size=8, num_pages=128, max_pages_per_seq=16,
                            kv_dtype="float32")
    cfg.parallel = ParallelConfig(dp=dp, tp=tp)
    cfg.runtime.prefill_chunk = 16
    return cfg


GREEDY = SamplingParams(temperature=0.0, eos_token_id=-1)


@pytest.mark.parametrize("dp,tp", [(2, 4), (1, 4), (4, 2), (8, 1)])
def test_sharded_matches_single_device(dp, tp):
    assert len(jax.devices()) >= dp * tp
    cfg = make_config(dp, tp)
    params = init_params(cfg.model, jax.random.key(3))

    ref_engine = Engine(cfg, params=params)
    mesh = build_mesh(cfg.parallel)
    sh_engine = Engine(cfg, params=params, mesh=mesh)

    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11, 12, 13, 14], [20, 21]]
    # batch must divide dp
    prompts = prompts[:max(dp, 2)] * (1 if dp <= 2 else 1)
    while len(prompts) % dp:
        prompts.append([5, 6, 7])

    ref = ref_engine.generate_batch(prompts, max_new_tokens=8,
                                    sampling=GREEDY)
    out = sh_engine.generate_batch(prompts, max_new_tokens=8,
                                   sampling=GREEDY)
    assert out == ref


def test_sharded_fused_loop():
    cfg = make_config(2, 4)
    params = init_params(cfg.model, jax.random.key(7))
    ref_engine = Engine(cfg, params=params)
    sh_engine = Engine(cfg, params=params, mesh=build_mesh(cfg.parallel))
    prompts = [[1, 2, 3], [4, 5, 6, 7]]
    ref = ref_engine.generate_batch_fused(prompts, max_new_tokens=6,
                                          sampling=GREEDY)
    out = sh_engine.generate_batch_fused(prompts, max_new_tokens=6,
                                         sampling=GREEDY)
    assert out == ref


def test_vocab_padding_exact():
    """Vocab not divisible by tp gets zero-padded; logits stay exact."""
    cfg = make_config(2, 4)
    cfg.model.vocab_size = 509   # prime — forces padding
    params = init_params(cfg.model, jax.random.key(11))
    ref_engine = Engine(cfg, params=params)
    sh_engine = Engine(cfg, params=params, mesh=build_mesh(cfg.parallel))
    assert sh_engine.padded_vocab % 4 == 0
    prompts = [[1, 2, 3, 4], [7, 8]]
    ref = ref_engine.generate_batch(prompts, max_new_tokens=5,
                                    sampling=GREEDY)
    out = sh_engine.generate_batch(prompts, max_new_tokens=5,
                                   sampling=GREEDY)
    assert out == ref
