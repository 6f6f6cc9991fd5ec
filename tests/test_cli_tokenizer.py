"""CLI + tokenizer tests."""

import json
import sys

import pytest

from pagedattention_based_transformer_decoder_inference_framework_tpu.cli.cli_app import main
from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.tokenizer import (
    ByteTokenizer, Tokenizer, get_tokenizer)


def test_byte_tokenizer_roundtrip():
    t = Tokenizer("byte")
    s = "hello wörld ✓"
    assert t.decode(t.encode(s)) == s
    assert t.eos_token_id == ByteTokenizer.eos_token_id
    assert t.encode_batch(["a", "bc"]) == [[97], [98, 99]]
    assert t.decode_batch([[97], [98, 99]]) == ["a", "bc"]


def test_tokenizer_cache_is_process_wide():
    assert get_tokenizer("byte") is get_tokenizer("byte")


ARGS = ["--model", "gpt2-tiny", "--max-new-tokens", "4",
        "--temperature", "0.0"]


def test_cli_generate(capsys):
    rc = main(["generate", *ARGS, "--prompt", "hi"])
    assert rc == 0
    assert capsys.readouterr().out     # printed something


def test_cli_stream(capsys):
    rc = main(["stream", *ARGS, "--prompt", "hi"])
    assert rc == 0


def test_cli_batch(tmp_path, capsys):
    inp = tmp_path / "prompts.txt"
    inp.write_text("one\ntwo\n")
    out = tmp_path / "out.jsonl"
    rc = main(["batch", *ARGS, "--input", str(inp), "--output", str(out)])
    assert rc == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 2 and all("completion" in r for r in rows)


def test_cli_rerank(capsys):
    rc = main(["rerank", *ARGS, "--context", "abc",
               "--candidates", "d", "ef"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("[") == 2 and "*" in out


def test_cli_build_jsonl(tmp_path, capsys):
    prompts = tmp_path / "p.txt"
    prompts.write_text("seed prompt\n")
    out = tmp_path / "train.jsonl"
    rc = main(["build_jsonl", *ARGS, "--prompts", str(prompts),
               "--out", str(out), "--beam-width", "2"])
    assert rc == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 2
    assert sum(r["label"] for r in rows) == 1     # exactly one positive


def test_cli_chat_scripted(monkeypatch, capsys):
    inputs = iter(["hello", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(inputs))
    rc = main(["chat", *ARGS])
    assert rc == 0
    assert "bot>" in capsys.readouterr().out


def test_cli_log_writes_session(tmp_path, monkeypatch):
    inputs = iter(["hi there", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(inputs))
    session = tmp_path / "sess.jsonl"
    rc = main(["log", *ARGS, "--session", str(session)])
    assert rc == 0
    rows = [json.loads(l) for l in session.read_text().splitlines()]
    assert rows and rows[0]["user"] == "hi there"


def test_debug_attention_maps():
    import numpy as np
    import jax
    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import preset
    from pagedattention_based_transformer_decoder_inference_framework_tpu.models.model import (
        DecoderModel, init_params)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.debug import (
        attention_maps)

    cfg = preset("llama-tiny")
    cfg.dtype = "float32"
    model = DecoderModel(cfg)
    params = init_params(cfg, jax.random.key(0))
    attn, logits = attention_maps(model, params, [1, 2, 3, 4, 5])
    assert attn.shape == (cfg.num_layers, cfg.num_heads, 5, 5)
    # rows are probability distributions under the causal mask
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)
    assert np.triu(attn, 1).max() < 1e-6         # strictly causal
    assert logits.shape == (5, cfg.vocab_size)


def test_logging_respects_config(capsys):
    import logging
    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import RuntimeConfig
    from pagedattention_based_transformer_decoder_inference_framework_tpu.utils.logging import (
        log_event, setup_logging)

    setup_logging(RuntimeConfig(log_level="debug", enable_logging=True))
    log_event("hello", level=logging.INFO, req=7)
    err = capsys.readouterr().err
    assert '"msg": "hello"' in err and '"req": 7' in err

    setup_logging(RuntimeConfig(enable_logging=False))
    log_event("silent")
    assert '"silent"' not in capsys.readouterr().err
