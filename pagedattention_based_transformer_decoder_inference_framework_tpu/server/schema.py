"""Request/response schemas (reference ``api/schema.py:4-26`` — with the
sampling fields actually honored, unlike the reference where top_k/top_p
are declared but unused)."""

from __future__ import annotations

from typing import Dict, List, Optional

from pydantic import BaseModel, Field


class GenerateRequest(BaseModel):
    prompt: str
    max_new_tokens: int = Field(default=64, ge=1, le=4096)
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    seed: Optional[int] = None


class GenerateResponse(BaseModel):
    text: str
    tokens: List[int]
    finish_reason: str = "length"


class BatchGenerateRequest(BaseModel):
    prompts: List[str]
    max_new_tokens: int = Field(default=64, ge=1, le=4096)
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    seed: Optional[int] = None


class ChatMessage(BaseModel):
    role: str = "user"
    content: str


class StreamChatRequest(BaseModel):
    messages: List[ChatMessage]
    max_new_tokens: int = Field(default=64, ge=1, le=4096)
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    seed: Optional[int] = None


class BeamStreamRequest(BaseModel):
    messages: List[ChatMessage]
    max_new_tokens: int = Field(default=64, ge=1, le=4096)
    beam_width: int = Field(default=4, ge=1, le=16)
    use_rerank: bool = True
