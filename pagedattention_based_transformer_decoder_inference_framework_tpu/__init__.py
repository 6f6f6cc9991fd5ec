"""TPU-native paged-attention transformer decoder inference framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference repo ``lxjeffffff/PagedAttention-Based-Transformer-Decoder-
Inference-Framework`` (see SURVEY.md): paged KV cache with page tables,
fused paged flash attention, INT8 fused dequant-matmul, streaming
generation, beam search + reranking, continuous batching, and
FastAPI/SSE/CLI frontends — redesigned TPU-first.

Import as::

    import pagedattention_based_transformer_decoder_inference_framework_tpu as patf
"""

__version__ = "0.1.0"

# Short alias used throughout docs/tests.
PACKAGE_ALIAS = "patf"
