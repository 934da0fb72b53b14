"""Quantization formats and kernels.

- :mod:`deepseek_tpu.quant.kquant` — vectorized numpy encode/decode of the
  llama.cpp K-quant super-block formats (Q2_K / Q3_K / Q8_K), byte-compatible
  with the reference checkpoint format.
- :mod:`deepseek_tpu.quant.fp8` — F8E5M2 per-tensor and blockwise (128x128)
  weight quantization.
- :mod:`deepseek_tpu.quant.repack` — host-side repacking of K-quant blocks
  into TPU-lane-friendly bit planes consumed by the Pallas/XLA dequant paths.
- :mod:`deepseek_tpu.quant.qtensor` — the quantized-tensor pytree nodes used
  in the model parameter tree.
"""

from deepseek_tpu.quant.qtensor import (
    PlainTensor,
    Fp8Tensor,
    Q2KTensor,
    Q3KTensor,
    QTensorLike,
    bits_per_weight,
)

__all__ = [
    "PlainTensor",
    "Fp8Tensor",
    "Q2KTensor",
    "Q3KTensor",
    "QTensorLike",
    "bits_per_weight",
]
