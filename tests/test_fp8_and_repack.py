import jax.numpy as jnp
import numpy as np

from deepseek_tpu.quant import fp8, kquant, repack
from deepseek_tpu.quant.qtensor import Fp8Tensor, PlainTensor, Q2KTensor, Q3KTensor, bits_per_weight
from deepseek_tpu.config import QuantKind


def rnd(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(np.float32)


def test_fp8_per_tensor_roundtrip():
    x = rnd((8, 16), seed=1)
    q, inv = fp8.per_tensor_quantize(x)
    y = fp8.per_tensor_dequantize(q, inv)
    # e5m2 has 2 mantissa bits -> relative error <= 12.5% + scale slack
    assert np.abs(y - x).max() <= 0.15 * np.abs(x).max()


def test_fp8_blockwise_scales_shape_and_roundtrip():
    x = rnd((300, 260), seed=2)
    x[:128, :128] *= 100.0  # blockwise should adapt per block
    q, inv = fp8.blockwise_quantize(x, (128, 128))
    assert q.shape == x.shape
    assert inv.shape == (3, 3)
    y = fp8.blockwise_dequantize(q, inv, (128, 128))
    rel = np.abs(y - x) / np.maximum(np.abs(x), 1e-3)
    assert np.percentile(rel, 99) < 0.15


def test_fp8tensor_dequant_matches_numpy():
    x = rnd((256, 384), seed=3)
    q, inv = fp8.blockwise_quantize(x, (128, 128))
    qt = Fp8Tensor(data=jnp.asarray(q), scale=jnp.asarray(inv), block_size=(128, 128))
    got = np.asarray(qt.dequant(jnp.float32))
    want = fp8.blockwise_dequantize(q, inv, (128, 128))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_q2k_repack_dequant_exact():
    x = rnd((4, 512), seed=4)
    raw = kquant.quantize_q2_k(x)
    want = kquant.dequantize_q2_k(raw, 4, 512)
    qs, sm, d, dmin = repack.repack_q2k(raw, 4, 512)
    assert qs.shape == (4, 128) and sm.shape == (4, 32) and d.shape == (4, 2)
    qt = Q2KTensor(qs=jnp.asarray(qs), sm=jnp.asarray(sm),
                   d=jnp.asarray(d), dmin=jnp.asarray(dmin))
    assert qt.shape == (4, 512)
    got = np.asarray(qt.dequant(jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_q3k_repack_dequant_exact():
    x = rnd((4, 512), seed=5)
    raw = kquant.quantize_q3_k(x)
    want = kquant.dequantize_q3_k(raw, 4, 512)
    qs, hm, sc, d = repack.repack_q3k(raw, 4, 512)
    assert qs.shape == (4, 128) and hm.shape == (4, 64) and sc.shape == (4, 32)
    qt = Q3KTensor(qs=jnp.asarray(qs), hm=jnp.asarray(hm),
                   sc=jnp.asarray(sc), d=jnp.asarray(d))
    got = np.asarray(qt.dequant(jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_q2k_repack_expert_stack():
    x = rnd((3, 4, 256), seed=6)
    raws = np.stack([kquant.quantize_q2_k(x[e]) for e in range(3)])
    qs, sm, d, dmin = repack.repack_q2k(raws, 4, 256)
    assert qs.shape == (3, 4, 64)
    qt = Q2KTensor(qs=jnp.asarray(qs), sm=jnp.asarray(sm),
                   d=jnp.asarray(d), dmin=jnp.asarray(dmin))
    got = np.asarray(qt.dequant(jnp.float32))
    for e in range(3):
        np.testing.assert_allclose(
            got[e], kquant.dequantize_q2_k(raws[e], 4, 256), atol=1e-6)


def test_qtensors_are_pytrees():
    import jax
    qt = PlainTensor(data=jnp.ones((4, 8)))
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 1
    x = rnd((2, 256), seed=7)
    raw = kquant.quantize_q3_k(x)
    qs, hm, sc, d = repack.repack_q3k(raw, 2, 256)
    qt3 = Q3KTensor(qs=jnp.asarray(qs), hm=jnp.asarray(hm), sc=jnp.asarray(sc), d=jnp.asarray(d))
    assert len(jax.tree_util.tree_leaves(qt3)) == 4
    # dequant under jit
    out = jax.jit(lambda t: t.dequant(jnp.float32))(qt3)
    np.testing.assert_allclose(np.asarray(out), kquant.dequantize_q3_k(raw, 2, 256), atol=1e-6)


def test_bits_per_weight():
    assert bits_per_weight(QuantKind.Q2_K) == 2.625
    assert bits_per_weight(QuantKind.Q3_K) == 3.4375
    assert abs(bits_per_weight(QuantKind.F8E5M2, (128, 128)) - 8.002) < 1e-3
    assert bits_per_weight(QuantKind.F16) == 16.0
