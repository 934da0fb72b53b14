import ctypes

import numpy as np
import pytest

from deepseek_tpu.quant import kquant
from tests.ref_kquant import load_reference_lib


def rnd(rows, cols, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((rows, cols)) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# self-consistency
# ---------------------------------------------------------------------------

def test_q8k_roundtrip():
    x = rnd(1, 512, seed=1).reshape(-1)
    d, qs, bsums = kquant.quantize_q8_k(x)
    y = kquant.dequantize_q8_k(d, qs)
    # 8-bit symmetric quantization: error bounded by half a step per block
    step = np.abs(d).max()
    assert np.abs(y - x).max() <= step * 0.51
    np.testing.assert_array_equal(
        bsums, qs.astype(np.int32).reshape(-1, 16, 16).sum(axis=2))


def test_q8k_zero_block():
    x = np.zeros(256, np.float32)
    d, qs, _ = kquant.quantize_q8_k(x)
    assert d[0] == 0 and not qs.any()


def test_q2k_roundtrip_error():
    x = rnd(4, 512, seed=2)
    raw = kquant.quantize_q2_k(x)
    assert raw.shape == (4, 2 * kquant.Q2K_BLOCK_BYTES)
    y = kquant.dequantize_q2_k(raw, 4, 512)
    # 2-bit quantization is lossy; RMS error should be well under the data RMS
    rms_err = np.sqrt(np.mean((y - x) ** 2))
    rms_x = np.sqrt(np.mean(x ** 2))
    assert rms_err < 0.45 * rms_x


def test_q3k_roundtrip_error():
    x = rnd(4, 512, seed=3)
    raw = kquant.quantize_q3_k(x)
    assert raw.shape == (4, 2 * kquant.Q3K_BLOCK_BYTES)
    y = kquant.dequantize_q3_k(raw, 4, 512)
    rms_err = np.sqrt(np.mean((y - x) ** 2))
    rms_x = np.sqrt(np.mean(x ** 2))
    assert rms_err < 0.25 * rms_x


def test_q2k_constant_and_zero_blocks():
    for val in [0.0, 0.75, -0.5]:
        x = np.full((1, 256), val, np.float32)
        raw = kquant.quantize_q2_k(x)
        y = kquant.dequantize_q2_k(raw, 1, 256)
        np.testing.assert_allclose(y, x, atol=max(abs(val) * 0.05, 1e-6))


def test_q3k_zero_block():
    x = np.zeros((1, 256), np.float32)
    raw = kquant.quantize_q3_k(x)
    y = kquant.dequantize_q3_k(raw, 1, 256)
    np.testing.assert_array_equal(y, x)


def test_q3_scale_pack_unpack_roundtrip():
    rng = np.random.default_rng(4)
    sc6 = rng.integers(0, 64, size=(7, 16), dtype=np.int32)
    packed = kquant._pack_q3_scales(sc6)
    assert packed.shape == (7, 12)
    np.testing.assert_array_equal(kquant._unpack_q3_scales(packed), sc6)


def test_qs_2bit_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    L = rng.integers(0, 4, size=(3, 256), dtype=np.int32)
    np.testing.assert_array_equal(kquant._unpack_qs_2bit(kquant._pack_qs_2bit(L)), L)


# ---------------------------------------------------------------------------
# golden parity against the compiled reference kernels
# ---------------------------------------------------------------------------

def _ref():
    lib = load_reference_lib()
    if not lib:
        pytest.skip("reference quant.cpp not available to compile")
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def test_golden_q8k_encode_byte_exact():
    lib = _ref()
    x = rnd(1, 1024, seed=10).reshape(-1)
    ref_raw = np.zeros(4 * kquant.Q8K_BLOCK_BYTES, dtype=np.uint8)
    lib.q8k_quantize(_fp(x), _up(ref_raw), 1024)
    d, qs, bsums = kquant.quantize_q8_k(x)
    for i in range(4):
        blk = ref_raw[i * kquant.Q8K_BLOCK_BYTES:(i + 1) * kquant.Q8K_BLOCK_BYTES]
        ref_d = blk[:4].view(np.float32)[0]
        ref_qs = blk[4:260].view(np.int8)
        ref_bsums = blk[260:292].view(np.int16)
        assert ref_d == d[i]
        np.testing.assert_array_equal(ref_qs, qs[i])
        np.testing.assert_array_equal(ref_bsums, bsums[i])


def test_golden_q2k_decode_byte_exact():
    """Our decoder must bit-exactly match the reference on its own encodes."""
    lib = _ref()
    x = rnd(2, 768, seed=11)
    raw = np.zeros((2, 3 * kquant.Q2K_BLOCK_BYTES), dtype=np.uint8)
    for r in range(2):
        row = np.ascontiguousarray(x[r])
        lib.q2k_quantize(_fp(row), _up(raw[r]), 768)
    ref_out = np.zeros((2, 768), dtype=np.float32)
    for r in range(2):
        lib.q2k_dequantize(_up(raw[r]), _fp(ref_out[r]), 768)
    ours = kquant.dequantize_q2_k(raw, 2, 768)
    np.testing.assert_array_equal(ours, ref_out)


def test_golden_q3k_decode_byte_exact():
    lib = _ref()
    x = rnd(2, 768, seed=12)
    raw = np.zeros((2, 3 * kquant.Q3K_BLOCK_BYTES), dtype=np.uint8)
    for r in range(2):
        row = np.ascontiguousarray(x[r])
        lib.q3k_quantize(_fp(row), _up(raw[r]), 768)
    ref_out = np.zeros((2, 768), dtype=np.float32)
    for r in range(2):
        lib.q3k_dequantize(_up(raw[r]), _fp(ref_out[r]), 768)
    ours = kquant.dequantize_q3_k(raw, 2, 768)
    np.testing.assert_array_equal(ours, ref_out)


def test_golden_our_encodes_decode_identically_in_reference():
    """Format validity: the reference engine decodes our blocks exactly as we do."""
    lib = _ref()
    x = rnd(2, 512, seed=13)
    for quant, dequant, ref_dequant in [
        (kquant.quantize_q2_k, kquant.dequantize_q2_k, lib.q2k_dequantize),
        (kquant.quantize_q3_k, kquant.dequantize_q3_k, lib.q3k_dequantize),
    ]:
        raw = quant(x)
        ours = dequant(raw, 2, 512)
        ref_out = np.zeros((2, 512), dtype=np.float32)
        for r in range(2):
            row = np.ascontiguousarray(raw[r])
            ref_dequant(_up(row), _fp(ref_out[r]), 512)
        np.testing.assert_array_equal(ours, ref_out)


def test_golden_encode_quality_parity():
    """Our encoder's reconstruction error must match the reference encoder's
    (same algorithm; tiny fp-accumulation differences allowed)."""
    lib = _ref()
    x = rnd(8, 1024, seed=14)
    for quant, dequant, ref_quant, block_bytes, ref_dequant in [
        (kquant.quantize_q2_k, kquant.dequantize_q2_k, lib.q2k_quantize,
         kquant.Q2K_BLOCK_BYTES, lib.q2k_dequantize),
        (kquant.quantize_q3_k, kquant.dequantize_q3_k, lib.q3k_quantize,
         kquant.Q3K_BLOCK_BYTES, lib.q3k_dequantize),
    ]:
        ours = dequant(quant(x), 8, 1024)
        ref_raw = np.zeros((8, 4 * block_bytes), dtype=np.uint8)
        ref_out = np.zeros((8, 1024), dtype=np.float32)
        for r in range(8):
            row = np.ascontiguousarray(x[r])
            ref_quant(_fp(row), _up(ref_raw[r]), 1024)
            ref_dequant(_up(ref_raw[r]), _fp(ref_out[r]), 1024)
        our_rms = np.sqrt(np.mean((ours - x) ** 2))
        ref_rms = np.sqrt(np.mean((ref_out - x) ** 2))
        assert our_rms <= ref_rms * 1.02, (our_rms, ref_rms)


def test_golden_vecdot_matches_numpy_reference_semantics():
    lib = _ref()
    rng = np.random.default_rng(15)
    n = 512
    w = rnd(1, n, seed=16).reshape(-1)
    a = rnd(1, n, seed=17).reshape(-1)
    q8_d, q8_qs, q8_bsums = kquant.quantize_q8_k(a)
    # pack q8 blocks into the reference's wire struct
    q8_raw = np.zeros((n // 256) * kquant.Q8K_BLOCK_BYTES, dtype=np.uint8)
    for i in range(n // 256):
        o = i * kquant.Q8K_BLOCK_BYTES
        q8_raw[o:o + 4] = np.frombuffer(np.float32(q8_d[i]).tobytes(), dtype=np.uint8)
        q8_raw[o + 4:o + 260] = np.frombuffer(q8_qs[i].tobytes(), dtype=np.uint8)
        q8_raw[o + 260:o + 292] = np.frombuffer(q8_bsums[i].tobytes(), dtype=np.uint8)

    raw2 = kquant.quantize_q2_k(w.reshape(1, -1))[0]
    s = np.zeros(1, dtype=np.float32)
    lib.q2k_vecdot(n, _fp(s), _up(np.ascontiguousarray(raw2)), _up(q8_raw))
    ours = kquant.vec_dot_q2_k_q8_k(raw2, q8_d, q8_qs, q8_bsums)
    np.testing.assert_allclose(s[0], ours, rtol=1e-5)

    raw3 = kquant.quantize_q3_k(w.reshape(1, -1))[0]
    lib.q3k_vecdot(n, _fp(s), _up(np.ascontiguousarray(raw3)), _up(q8_raw))
    ours3 = kquant.vec_dot_q3_k_q8_k(raw3, q8_d, q8_qs)
    np.testing.assert_allclose(s[0], ours3, rtol=1e-5)
