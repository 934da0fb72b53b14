"""deepseek_tpu — a TPU-native inference framework for the DeepSeek model family.

Built from scratch in JAX/XLA/Pallas with the capability surface of the CPU
reference implementation `andrewkchan/deepseek.cpp` (see SURVEY.md): weight-only
quantization (Q2_K / Q3_K K-quants, 128x128-block F8E5M2, FP16, FP32), multi-head
and absorbed multi-latent attention with a ring-buffer + attention-sink KV cache,
MoE with shared + routed experts, a HF->.dseek converter, and CLI workloads
(completion / perplexity / passkey / interactive).

The architecture is TPU-first: an immutable config, a pytree of (possibly
quantized) weight arrays with explicit shardings, and a pure jitted
``decode_step(params, cache, token, pos) -> (logits, cache)`` — not a
translation of the reference's C++ class graph.
"""

from deepseek_tpu.config import ModelConfig

__version__ = "0.1.0"

__all__ = ["ModelConfig", "__version__"]
