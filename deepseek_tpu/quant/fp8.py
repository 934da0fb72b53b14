"""F8E5M2 weight quantization: per-tensor and blockwise (default 128x128).

Semantics mirror the reference converter (/root/reference/convert.py:216-286):
scale = finfo.max / clamp(absmax, 1e-12) per block, values scaled + clamped to
the representable range then cast, and the *reciprocal* scale stored as f32.
The 128x128 block grid maps 1:1 onto MXU tiles on TPU.
"""

from __future__ import annotations

from typing import Tuple

import ml_dtypes
import numpy as np

F8E5M2 = np.dtype(ml_dtypes.float8_e5m2)
F8E5M2_MAX = float(ml_dtypes.finfo(ml_dtypes.float8_e5m2).max)   # 57344.0


def per_tensor_quantize(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (qweight f8e5m2, inverse scale f32 scalar array)."""
    x = np.asarray(x, dtype=np.float32)
    amax = np.abs(x).max() if x.size else 16.0
    scale = F8E5M2_MAX / max(float(amax), 1e-12)
    q = np.clip(x * scale, -F8E5M2_MAX, F8E5M2_MAX).astype(F8E5M2)
    return q, np.float32(1.0 / scale).reshape(())


def per_tensor_dequantize(q: np.ndarray, inv_scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * np.float32(inv_scale)


def blockwise_quantize(x: np.ndarray, block: Tuple[int, int] = (128, 128)
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize a 2-D weight with a per-(b0, b1)-block scale grid.

    Returns (qweight f8e5m2 (d, n), inv_scales f32 (ceil(d/b0), ceil(n/b1))).
    """
    x = np.asarray(x, dtype=np.float32)
    d, n = x.shape
    b0, b1 = block
    g0 = -(-d // b0)
    g1 = -(-n // b1)
    # pad to full blocks so the reduction is a clean reshape
    xp = np.zeros((g0 * b0, g1 * b1), dtype=np.float32)
    xp[:d, :n] = x
    blocks = xp.reshape(g0, b0, g1, b1)
    amax = np.abs(blocks).max(axis=(1, 3))
    scale = F8E5M2_MAX / np.maximum(amax, 1e-12)
    q = np.clip(blocks * scale[:, None, :, None], -F8E5M2_MAX, F8E5M2_MAX).astype(F8E5M2)
    q = q.reshape(g0 * b0, g1 * b1)[:d, :n]
    return q, (1.0 / scale).astype(np.float32)


def blockwise_dequantize(q: np.ndarray, inv_scales: np.ndarray,
                         block: Tuple[int, int] = (128, 128)) -> np.ndarray:
    d, n = q.shape
    b0, b1 = block
    scale_rows = np.repeat(inv_scales, b0, axis=0)[:d]
    scale_full = np.repeat(scale_rows, b1, axis=1)[:, :n]
    return q.astype(np.float32) * scale_full
