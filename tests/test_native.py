import numpy as np
import pytest

from deepseek_tpu.native import kquant_native
from deepseek_tpu.quant import kquant

pytestmark = pytest.mark.skipif(
    not kquant_native.available(), reason="native toolchain unavailable")


def rnd(rows, cols, seed=0):
    return np.random.default_rng(seed).standard_normal((rows, cols)).astype(np.float32)


@pytest.mark.parametrize("method,np_q,np_dq", [
    ("q2_k", kquant.quantize_q2_k, kquant.dequantize_q2_k),
    ("q3_k", kquant.quantize_q3_k, kquant.dequantize_q3_k),
])
def test_native_encode_matches_numpy(method, np_q, np_dq):
    x = rnd(8, 1024, seed=1)
    raw_native = kquant_native.quantize(x, method)
    raw_np = np_q(x)
    assert raw_native.shape == raw_np.shape
    # both decoders agree on both encodings (format interop)...
    for raw in (raw_native, raw_np):
        a = np_dq(raw, 8, 1024)
        b = kquant_native.dequantize(raw, method, 8, 1024)
        np.testing.assert_array_equal(a, b)
    # ...and reconstruction quality matches (identical algorithm; allow
    # tiny fp-accumulation-order differences in the fit)
    rms_native = np.sqrt(((np_dq(raw_native, 8, 1024) - x) ** 2).mean())
    rms_np = np.sqrt(((np_dq(raw_np, 8, 1024) - x) ** 2).mean())
    assert abs(rms_native - rms_np) < 0.02 * rms_np
    # and the encodings are overwhelmingly byte-identical
    agree = (raw_native == raw_np).mean()
    assert agree > 0.99, agree


def test_native_q8k_matches_numpy():
    x = rnd(1, 1024, seed=2).reshape(-1)
    raw = kquant_native.quantize(x.reshape(1, -1), "q8_k")[0]
    d, qs, bsums = kquant.quantize_q8_k(x)
    for i in range(4):
        blk = raw[i * kquant.Q8K_BLOCK_BYTES:(i + 1) * kquant.Q8K_BLOCK_BYTES]
        assert blk[:4].view(np.float32)[0] == d[i]
        np.testing.assert_array_equal(blk[4:260].view(np.int8), qs[i])
        np.testing.assert_array_equal(blk[260:292].view(np.int16), bsums[i])


def test_native_used_by_converter_path():
    from deepseek_tpu.convert import _k_quantize
    x = rnd(4, 512, seed=3)
    raw = _k_quantize(x, "q2_k")
    y = kquant.dequantize_q2_k(raw, 4, 512)
    assert np.isfinite(y).all()


def test_native_tokenizer_matches_python():
    from deepseek_tpu.native import tokenizer_native
    if not tokenizer_native.available():
        pytest.skip("native tokenizer unavailable")
    from deepseek_tpu.tokenizer import Tokenizer
    from tests.test_tokenizer import make_vocab
    tok = Tokenizer(make_vocab(), bos_id=1, eos_id=2)
    assert tok._native is not None
    # force python path for comparison
    import copy
    pytok = copy.copy(tok)
    pytok._native = None
    rng = np.random.default_rng(0)
    samples = ["hello world", "", "  hello", "héllo wörld 中文",
               "wor", "hellohellohello world"]
    samples += ["".join(chr(rng.integers(32, 500)) for _ in range(50)) for _ in range(5)]
    for s in samples:
        assert tok.encode(s, bos=True) == pytok.encode(s, bos=True), s
        assert tok.decode(tok.encode(s)) == s.encode("utf-8")
