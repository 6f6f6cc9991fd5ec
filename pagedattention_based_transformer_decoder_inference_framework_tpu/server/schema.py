"""Request/response schemas (reference ``api/schema.py:4-26`` — with the
sampling fields actually honored, unlike the reference where top_k/top_p
are declared but unused)."""

from __future__ import annotations

from typing import Dict, List, Optional

from pydantic import BaseModel, Field


class SamplingFields(BaseModel):
    """Sampling knobs shared by every generation endpoint (all of them
    honored end-to-end, including through the continuous-batching
    scheduler's fused decode bursts)."""

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    #: drop tokens with p < min_p * p(best token) (0 disables)
    min_p: float = Field(default=0.0, ge=0.0, le=1.0)
    #: HF-style repetition penalty over prompt+generated tokens
    repetition_penalty: float = Field(default=1.0, gt=0.0)
    #: OpenAI-style additive penalties on seen tokens
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    #: extra token ids that end generation like EOS (at most 4 used)
    stop_token_ids: List[int] = Field(default_factory=list)
    #: OpenAI-style additive logit bias {token_id: bias} (at most 8
    #: entries used; applied before temperature)
    logit_bias: Dict[int, float] = Field(default_factory=dict)
    seed: Optional[int] = None


class GenerateRequest(SamplingFields):
    prompt: str
    max_new_tokens: int = Field(default=64, ge=1, le=4096)


class GenerateResponse(BaseModel):
    text: str
    tokens: List[int]
    finish_reason: str = "length"


class BatchGenerateRequest(SamplingFields):
    prompts: List[str]
    max_new_tokens: int = Field(default=64, ge=1, le=4096)


class ChatMessage(BaseModel):
    role: str = "user"
    content: str


class StreamChatRequest(SamplingFields):
    messages: List[ChatMessage]
    max_new_tokens: int = Field(default=64, ge=1, le=4096)


class BeamStreamRequest(BaseModel):
    messages: List[ChatMessage]
    max_new_tokens: int = Field(default=64, ge=1, le=4096)
    beam_width: int = Field(default=4, ge=1, le=16)
    use_rerank: bool = True
