"""Pallas fused dequant+matmul kernels vs the XLA dequant path.

Run in interpreter mode on CPU (exact same kernel logic the TPU compiles);
a TPU smoke script lives in scripts/tpu_smoke.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.ops.pallas.qmm import qmm, qmm_experts
from deepseek_tpu.quant import fp8, kquant, repack
from deepseek_tpu.quant.qtensor import (
    Fp8Tensor, PlainTensor, Q2KTensor, Q3KTensor, q2k_to_nibble,
    q2k_to_turbo, q3k_to_nibble, q3k_to_turbo,
)


def rnd(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(np.float32)


def q2k_tensor(w):
    raw = kquant.quantize_q2_k(w) if w.ndim == 2 else \
        np.stack([kquant.quantize_q2_k(e) for e in w])
    qs, sm, d, dmin = repack.repack_q2k(raw, w.shape[-2], w.shape[-1])
    return Q2KTensor(qs=jnp.asarray(qs), sm=jnp.asarray(sm),
                     d=jnp.asarray(d), dmin=jnp.asarray(dmin))


def q3k_tensor(w):
    raw = kquant.quantize_q3_k(w) if w.ndim == 2 else \
        np.stack([kquant.quantize_q3_k(e) for e in w])
    qs, hm, sc, d = repack.repack_q3k(raw, w.shape[-2], w.shape[-1])
    return Q3KTensor(qs=jnp.asarray(qs), hm=jnp.asarray(hm),
                     sc=jnp.asarray(sc), d=jnp.asarray(d))


def q2kt_tensor(w):
    return q2k_to_turbo(q2k_tensor(w))


def q3kt_tensor(w):
    return q3k_to_turbo(q3k_tensor(w))


def q2kn_tensor(w):
    return q2k_to_nibble(q2k_tensor(w))


def q3kn_tensor(w):
    return q3k_to_nibble(q3k_tensor(w))


_ALL_KQ = [q2k_tensor, q3k_tensor, q2kt_tensor, q3kt_tensor,
           q2kn_tensor, q3kn_tensor]


@pytest.mark.parametrize("mk", _ALL_KQ)
@pytest.mark.parametrize("B", [1, 4])
def test_kquant_qmm_matches_dequant_path(mk, B):
    w = rnd((64, 512), seed=1)
    x = rnd((B, 512), seed=2)
    qt = mk(w)
    want = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)).T)
    got = np.asarray(qmm(qt, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qmm_3d_activations():
    w = rnd((32, 256), seed=3)
    x = rnd((2, 3, 256), seed=4)
    qt = q2k_tensor(w)
    want = np.asarray(jnp.einsum("btn,dn->btd", jnp.asarray(x), qt.dequant(jnp.float32)))
    got = np.asarray(qmm(qt, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fp8_qmm_matches_dequant_path():
    w = rnd((256, 256), seed=5)
    q, s = fp8.blockwise_quantize(w, (128, 128))
    qt = Fp8Tensor(data=jnp.asarray(q), scale=jnp.asarray(s), block_size=(128, 128))
    x = rnd((2, 256), seed=6)
    want = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)).T)
    got = np.asarray(qmm(qt, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mk", _ALL_KQ)
def test_expert_gather_qmm(mk):
    E, m, n = 8, 32, 512
    w = rnd((E, m, n), seed=7)
    qt = mk(w)
    B, k = 2, 3
    idx = np.array([[5, 0, 3], [1, 1, 7]], np.int32)
    x = rnd((B, k, n), seed=8)
    got = np.asarray(qmm_experts(qt, jnp.asarray(idx), jnp.asarray(x), interpret=True))
    deq = np.asarray(qt.dequant(jnp.float32))
    for b in range(B):
        for s in range(k):
            want = x[b, s] @ deq[idx[b, s]].T
            np.testing.assert_allclose(got[b, s], want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mk", _ALL_KQ)
def test_expert_gather_pair_major_matches(mk):
    """pair_major=True (single-token decode grid order) must be
    numerically identical to the default pair-minor grid — same kernel
    body, only the grid iteration order changes."""
    E, m, n = 8, 32, 512
    qt = mk(rnd((E, m, n), seed=7))
    idx = np.array([[5, 0, 3, 7]], np.int32)          # 1 token, distinct
    x = rnd((1, 4, n), seed=8)
    a = np.asarray(qmm_experts(qt, jnp.asarray(idx), jnp.asarray(x),
                               interpret=True))
    b = np.asarray(qmm_experts(qt, jnp.asarray(idx), jnp.asarray(x),
                               interpret=True, pair_major=True))
    np.testing.assert_array_equal(a, b)


def test_expert_gather_plain_and_fp8():
    E, m, n = 4, 32, 256
    w = rnd((E, m, n), seed=9)
    idx = np.array([[2, 1]], np.int32)
    x = rnd((1, 2, n), seed=10)

    qt = PlainTensor(data=jnp.asarray(w))
    got = np.asarray(qmm_experts(qt, jnp.asarray(idx), jnp.asarray(x), interpret=True))
    for s, e in enumerate([2, 1]):
        np.testing.assert_allclose(got[0, s], x[0, s] @ w[e].T, rtol=1e-4, atol=1e-4)

    qs, ss = zip(*(fp8.blockwise_quantize(w[e], (32, 128)) for e in range(E)))
    qt8 = Fp8Tensor(data=jnp.asarray(np.stack(qs)), scale=jnp.asarray(np.stack(ss)),
                    block_size=(32, 128))
    got8 = np.asarray(qmm_experts(qt8, jnp.asarray(idx), jnp.asarray(x), interpret=True))
    deq = np.asarray(qt8.dequant(jnp.float32))
    for s, e in enumerate([2, 1]):
        np.testing.assert_allclose(got8[0, s], x[0, s] @ deq[e].T, rtol=1e-4, atol=1e-4)


def test_plain_matvec_pallas_path():
    """The tiled plain-weight matvec (lm_head path) matches einsum."""
    import deepseek_tpu.ops.pallas.qmm as qmmmod

    w = rnd((512, 256), seed=12)
    x = rnd((1, 256), seed=13)
    qt = PlainTensor(data=jnp.asarray(w, jnp.bfloat16))
    want = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)).T)
    old = qmmmod._PLAIN_PALLAS_MIN_BYTES
    qmmmod._PLAIN_PALLAS_MIN_BYTES = 0
    try:
        got = np.asarray(qmm(qt, jnp.asarray(x), interpret=True))
    finally:
        qmmmod._PLAIN_PALLAS_MIN_BYTES = old
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mk", _ALL_KQ)
def test_quantized_grouped_ffn(mk):
    """qmm_grouped tile dispatch == per-pair dequant reference."""
    from deepseek_tpu.config import ActivationType
    from deepseek_tpu.ops.matmul import _quantized_grouped_ffn
    from deepseek_tpu.parallel.spmd import NULL_CTX

    E, m, dim, B, T, k = 4, 256, 256, 1, 5, 2
    w1 = mk(rnd((E, m, dim), seed=30, scale=0.1))
    w2 = mk(rnd((E, dim, m), seed=31, scale=0.1))
    w3 = mk(rnd((E, m, dim), seed=32, scale=0.1))
    xb = jnp.asarray(rnd((B, T, dim), seed=33, scale=0.3))
    idx = jnp.asarray(np.random.default_rng(34).integers(0, E, (B, T, k)),
                      jnp.int32)
    wts = jnp.asarray(np.random.default_rng(35).uniform(size=(B, T, k)),
                      jnp.float32)

    got = np.asarray(_quantized_grouped_ffn(
        w1, w2, w3, xb, wts, idx, ActivationType.SILU, NULL_CTX, True)[0])

    d1, d2, d3 = (np.asarray(t.dequant(jnp.float32)) for t in (w1, w2, w3))
    x = np.asarray(xb)
    want = np.zeros((B, T, dim), np.float32)
    for b in range(B):
        for t in range(T):
            for s in range(k):
                e = int(idx[b, t, s])
                g1 = x[b, t] @ d1[e].T
                g3 = x[b, t] @ d3[e].T
                h = (g1 / (1 + np.exp(-g1))) * g3
                want[b, t] += float(wts[b, t, s]) * (h @ d2[e].T)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_turbo_runtime_matches_packed_engine(tmp_path):
    """kquant_runtime='turbo' (pre-scaled int8 planes) produces the same
    greedy tokens and perplexity as the packed layout on the same Q2_K
    checkpoint — the layouts encode identical weight values."""
    import os
    from deepseek_tpu import convert as cv
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.quant.qtensor import Q2KTensor, Q2KTurboTensor
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=17, scale=0.1))
    out = os.path.join(str(tmp_path), "q2k")
    cv.convert(hf_dir, out, quant="q2_k", use_mla=True)

    e_pk = Engine(out, seed=0, prefill_chunk=4, decode_block=1)
    e_tb = Engine(out, seed=0, prefill_chunk=4, decode_block=1,
                  kquant_runtime="turbo")
    # default fusion packs w1/w3 into w13; the turbo layout additionally
    # folds the shared experts into the tables (w13s)
    assert isinstance(e_pk.params.layers[1].w13, Q2KTensor)
    assert isinstance(e_tb.params.layers[1].w13s, Q2KTurboTensor)

    prompt = e_pk.tokenizer.encode("hello", bos=True)
    out1, _ = e_pk.generate(prompt, num_steps=6, temperature=0.0)
    out2, _ = e_tb.generate(prompt, num_steps=6, temperature=0.0)
    assert out1 == out2

    p1 = e_pk.perplexity(prompt + out1)[0]
    p2 = e_tb.perplexity(prompt + out1)[0]
    # turbo stores its fused min/scale planes (bm, a) in bf16: on TPU
    # that is numerically FREE (the kernel dots truncate those operands
    # to bf16 at DEFAULT MXU precision regardless — qmm.py docstring),
    # but this CPU/XLA path computes exact f32, so the 2^-9 storage
    # rounding surfaces as a ~1%-class ppl shift on a tiny random model.
    # Greedy tokens (asserted above) must still agree exactly.
    np.testing.assert_allclose(p2, p1, rtol=2e-2)


@pytest.mark.parametrize("quant", ["q2_k", "q3_k"])
def test_nibble_runtime_matches_packed_engine(tmp_path, quant):
    """kquant_runtime='nibble' (4-bit planes + bf16 per-16 scales with the
    sign/min offset folded into an output-side dot) produces the same
    greedy tokens as the packed layout on the same checkpoint."""
    import os
    from deepseek_tpu import convert as cv
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.quant.qtensor import KNibbleTensor
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=23, scale=0.1))
    out = os.path.join(str(tmp_path), "ck")
    cv.convert(hf_dir, out, quant=quant, use_mla=True)

    e_pk = Engine(out, seed=0, prefill_chunk=4, decode_block=1)
    e_nb = Engine(out, seed=0, prefill_chunk=4, decode_block=1,
                  kquant_runtime="nibble")
    # w1/w3 fuse to w13 under the default fusion; nibble layouts fuse too
    # (every field scales with the output rows). Q3 nibble stores no min
    # plane (off=4 output-side); Q2 keeps c = dmin*mn.
    lp = e_nb.params.layers[1]
    nt = lp.w13s if lp.w13s is not None else lp.w13
    assert isinstance(nt, KNibbleTensor)
    assert (nt.c is None) == (quant == "q3_k")

    prompt = e_pk.tokenizer.encode("hello", bos=True)
    out1, _ = e_pk.generate(prompt, num_steps=6, temperature=0.0)
    out2, _ = e_nb.generate(prompt, num_steps=6, temperature=0.0)
    assert out1 == out2

    p1 = e_pk.perplexity(prompt + out1)[0]
    p2 = e_nb.perplexity(prompt + out1)[0]
    # bf16 scale planes: numerically free on TPU (DEFAULT-precision dots
    # truncate anyway), visible only on this exact-f32 CPU path. Nibble
    # rounds BOTH planes (a = d*sc and the min term) to bf16 — turbo Q2
    # keeps d in f32 — so the tiny-random-model ppl shift is slightly
    # larger than the turbo test's (matches the 3% cross-engine q2_k bar).
    np.testing.assert_allclose(p2, p1, rtol=3e-2)


def test_full_model_pallas_impl_matches_xla(tmp_path):
    """End-to-end decode with the Pallas kernels (interpret mode) must match
    the XLA dequant path on a quantized MLA+MoE checkpoint."""
    import dataclasses
    import os
    from deepseek_tpu import convert as cv
    from deepseek_tpu.engine import Engine
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=11, scale=0.1))
    out = os.path.join(str(tmp_path), "q2k")
    cv.convert(hf_dir, out, quant="q2_k", use_mla=True)

    e_xla = Engine(out, seed=0, prefill_chunk=4, decode_block=1)
    e_xla.cfg = dataclasses.replace(e_xla.cfg, kernel_impl="xla")
    e_pl = Engine(out, seed=0, prefill_chunk=4, decode_block=1)
    e_pl.cfg = dataclasses.replace(e_pl.cfg, kernel_impl="pallas")

    prompt = e_xla.tokenizer.encode("hello", bos=True)
    out1, _ = e_xla.generate(prompt, num_steps=6, temperature=0.0)
    out2, _ = e_pl.generate(prompt, num_steps=6, temperature=0.0)
    assert out1 == out2

    t1 = e_xla.perplexity(prompt + out1)[0]
    t2 = e_pl.perplexity(prompt + out1)[0]
    np.testing.assert_allclose(t2, t1, rtol=1e-3)
