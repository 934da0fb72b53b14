"""Build a ctypes bridge to the *reference* K-quant kernels for golden tests.

Compiles /root/reference/src/quant.cpp (read-only, never copied into this
repo) into a temporary shared library so tests can assert byte-level format
compatibility of our from-scratch implementation. Skipped when the reference
tree or toolchain is unavailable.
"""

import ctypes
import os
import subprocess
import tempfile

_WRAPPER = r"""
#include "quant.h"
extern "C" {
void q2k_quantize(const float* x, uint8_t* y, int64_t k) {
  quantize_row_q2_K_ref(x, (block_q2_K*)y, k);
}
void q2k_dequantize(const uint8_t* x, float* y, int64_t k) {
  dequantize_row_q2_K((const block_q2_K*)x, y, k);
}
void q3k_quantize(const float* x, uint8_t* y, int64_t k) {
  quantize_row_q3_K_ref(x, (block_q3_K*)y, k);
}
void q3k_dequantize(const uint8_t* x, float* y, int64_t k) {
  dequantize_row_q3_K((const block_q3_K*)x, y, k);
}
void q8k_quantize(const float* x, uint8_t* y, int64_t k) {
  quantize_row_q8_K_ref(x, (block_q8_K*)y, k);
}
void q2k_vecdot(int n, float* s, const uint8_t* vx, const uint8_t* vy) {
  ggml_vec_dot_q2_K_q8_K(n, s, vx, vy);
}
void q3k_vecdot(int n, float* s, const uint8_t* vx, const uint8_t* vy) {
  ggml_vec_dot_q3_K_q8_K(n, s, vx, vy);
}
}
"""

_cached = None


def load_reference_lib():
    global _cached
    if _cached is not None:
        return _cached
    ref = os.environ.get("DSEEK_REFERENCE_DIR", "/root/reference")
    src = os.path.join(ref, "src")
    if not os.path.exists(os.path.join(src, "quant.cpp")):
        _cached = False
        return False
    tmp = tempfile.mkdtemp(prefix="refquant_")
    wrapper = os.path.join(tmp, "wrapper.cpp")
    with open(wrapper, "w") as f:
        f.write(_WRAPPER)
    so = os.path.join(tmp, "refquant.so")
    cmd = [
        "g++", "-O2", "-std=c++20", "-shared", "-fPIC",
        "-mavx2", "-mf16c", "-mfma",
        "-I", src, "-I", os.path.join(ref, "vendor"),
        wrapper, os.path.join(src, "quant.cpp"),
        "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        _cached = False
        return False
    lib = ctypes.CDLL(so)
    for name in ["q2k_quantize", "q3k_quantize", "q8k_quantize"]:
        getattr(lib, name).argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    for name in ["q2k_dequantize", "q3k_dequantize"]:
        getattr(lib, name).argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    for name in ["q2k_vecdot", "q3k_vecdot"]:
        getattr(lib, name).argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    _cached = lib
    return lib
