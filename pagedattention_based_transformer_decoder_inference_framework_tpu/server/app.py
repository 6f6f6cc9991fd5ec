"""FastAPI transport over :class:`ServerCore` (optional dependency).

Endpoints (reference FastAPI ``api/router.py:19-80`` + Flask
``web/app.py:12-133``): /generate, /stream_generate, /stream_chat,
/stream_chat_beam, /generate_batch, /metrics, /healthz. Streaming is
newline-JSON by default, SSE with ``?sse=1`` (reference Flask framing,
``web/sse_utils.py:6-10``). When fastapi is unavailable use
``server.basic.BasicServer`` — identical surface, stdlib only.
"""

from __future__ import annotations

from typing import Optional

from ..config import FrameworkConfig
from .core import ServerCore
from .schema import (BatchGenerateRequest, BeamStreamRequest,
                     GenerateRequest, GenerateResponse, StreamChatRequest)


def create_app(config: Optional[FrameworkConfig] = None, engine=None,
               reranker=None, core: Optional[ServerCore] = None):
    from fastapi import FastAPI
    from fastapi.responses import JSONResponse, StreamingResponse

    core = core or ServerCore(config, engine=engine, reranker=reranker)
    app = FastAPI(title="pagedattention-tpu", version="0.1")
    app.state.core = core

    def media(sse: bool) -> str:
        return "text/event-stream" if sse else "application/x-ndjson"

    @app.get("/healthz")
    def healthz():
        return core.healthz()

    @app.get("/metrics")
    def metrics():
        return JSONResponse(core.get_metrics())

    @app.post("/generate", response_model=GenerateResponse)
    def generate(req: GenerateRequest):
        return GenerateResponse(**core.generate(req))

    @app.post("/generate_batch")
    def generate_batch(req: BatchGenerateRequest):
        return core.generate_batch(req)

    @app.post("/stream_generate")
    def stream_generate(req: GenerateRequest, sse: bool = False):
        return StreamingResponse(core.stream_generate(req, sse),
                                 media_type=media(sse))

    @app.post("/stream_chat")
    def stream_chat(req: StreamChatRequest, sse: bool = False):
        return StreamingResponse(core.stream_chat(req, sse),
                                 media_type=media(sse))

    @app.post("/stream_chat_beam")
    def stream_chat_beam(req: BeamStreamRequest, sse: bool = False):
        return StreamingResponse(core.stream_chat_beam(req, sse),
                                 media_type=media(sse))

    return app


def main() -> None:
    import argparse

    from ..config import load_config, preset

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--host", default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--model", default=None, help="model preset name")
    ap.add_argument("--backend", choices=("fastapi", "basic"),
                    default="basic")
    args = ap.parse_args()
    cfg = load_config(args.config)
    if args.model:
        cfg.model = preset(args.model)
    if args.host:
        cfg.server.host = args.host
    if args.port:
        cfg.server.port = args.port

    if args.backend == "fastapi":
        import uvicorn

        uvicorn.run(create_app(cfg), host=cfg.server.host,
                    port=cfg.server.port)
    else:
        from .basic import BasicServer

        srv = BasicServer(cfg)
        print(f"serving on {cfg.server.host}:{srv.port}")
        srv.serve_forever()


if __name__ == "__main__":
    main()
