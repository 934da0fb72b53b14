"""ctypes bridge to the native K-quant encoder (kquant.cpp).

Drop-in for the numpy encoder in deepseek_tpu.quant.kquant — identical block
formats, OpenMP over rows; used by the converter for multi-GB tensors
(reference analogue: the quantizer_cpp torch extension, quantizer.cpp:4-71).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from deepseek_tpu.native.build import build_shared_lib
from deepseek_tpu.quant.kquant import QK_K, Q2K_BLOCK_BYTES, Q3K_BLOCK_BYTES, Q8K_BLOCK_BYTES

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = build_shared_lib("kquant.cpp", "libdseek_kquant.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_uint8)
    for name in ("dseek_quantize_q2k", "dseek_quantize_q3k", "dseek_quantize_q8k"):
        getattr(lib, name).argtypes = [fp, up, ctypes.c_int64, ctypes.c_int64]
    for name in ("dseek_dequantize_q2k", "dseek_dequantize_q3k"):
        getattr(lib, name).argtypes = [up, fp, ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def quantize(x: np.ndarray, method: str) -> np.ndarray:
    """x (rows, cols) f32 -> raw block bytes (rows, blocks_per_row * block_bytes)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, dtype=np.float32)
    rows, cols = x.shape
    assert cols % QK_K == 0
    bb = {"q2_k": Q2K_BLOCK_BYTES, "q3_k": Q3K_BLOCK_BYTES, "q8_k": Q8K_BLOCK_BYTES}[method]
    out = np.empty((rows, cols // QK_K * bb), dtype=np.uint8)
    fn = {"q2_k": lib.dseek_quantize_q2k, "q3_k": lib.dseek_quantize_q3k,
          "q8_k": lib.dseek_quantize_q8k}[method]
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), rows, cols)
    return out


def dequantize(raw: np.ndarray, method: str, rows: int, cols: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    raw = np.ascontiguousarray(raw.reshape(rows, -1))
    out = np.empty((rows, cols), dtype=np.float32)
    fn = {"q2_k": lib.dseek_dequantize_q2k, "q3_k": lib.dseek_dequantize_q3k}[method]
    fn(raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols)
    return out
