"""Pallas flash-decode attention kernels vs the jnp reference formulation.

Interpret mode on CPU (identical kernel logic to the TPU lowering);
real-chip numerics run in scripts/tpu_smoke.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.ops.attention import decode_attn_mha, decode_attn_mla
from deepseek_tpu.ops.pallas.attention import mha_decode_attn, mla_decode_attn


def rnd(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("B,kv_len", [(1, 256), (2, (7, 199)), (1, 1)])
def test_mla_decode_attn_matches_jnp(B, kv_len):
    H, R, P, S = 4, 64, 32, 256
    q_c = jnp.asarray(rnd((B, H, R), 1, 0.3))
    q_r = jnp.asarray(rnd((B, H, P), 2, 0.3))
    ckv = jnp.asarray(rnd((B, S, R), 3, 0.3), jnp.bfloat16)
    kr = jnp.asarray(rnd((B, S, P), 4, 0.3), jnp.bfloat16)
    kl = jnp.asarray(np.broadcast_to(np.asarray(kv_len, np.int32), (B,)))
    scale = 1.0 / np.sqrt(96.0)
    want = np.asarray(decode_attn_mla(q_c, q_r, ckv, kr, kl, 96))
    got = np.asarray(mla_decode_attn(q_c, q_r, ckv, kr, kl, scale,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("B,kv_len", [(1, 256), (2, (13, 250))])
def test_mha_decode_attn_matches_jnp(B, kv_len):
    H, Dh, Dv, S = 3, 48, 32, 256
    q = jnp.asarray(rnd((B, H, Dh), 5, 0.3))
    k = jnp.asarray(rnd((B, S, H, Dh), 6, 0.3), jnp.bfloat16)
    v = jnp.asarray(rnd((B, S, H, Dv), 7, 0.3), jnp.bfloat16)
    kl = jnp.asarray(np.broadcast_to(np.asarray(kv_len, np.int32), (B,)))
    scale = 1.0 / np.sqrt(Dh)
    want = np.asarray(decode_attn_mha(q, k, v, kl))
    got = np.asarray(mha_decode_attn(q, k, v, kl, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mha_decode_attn_head_split_int8():
    """Large-H int8 cache: the scale clamp forces ts=128, so heads split
    across a grid axis to stay in the VMEM budget; numerics must match the
    dequantized jnp reference exactly (per-(slot,head) scales folded in)."""
    from deepseek_tpu.models.kvcache import quantize_rows

    B, H, Dh, Dv, S = 1, 64, 96, 64, 256
    q = jnp.asarray(rnd((B, H, Dh), 21, 0.3))
    kf = rnd((B, S, H, Dh), 22, 0.3).astype(np.float32)
    vf = rnd((B, S, H, Dv), 23, 0.3).astype(np.float32)
    k_q, k_s = quantize_rows(jnp.asarray(kf))        # (B,S,H,*) -> (B,S,H)
    v_q, v_s = quantize_rows(jnp.asarray(vf))
    kl = jnp.asarray([200], jnp.int32)
    scale = 1.0 / np.sqrt(Dh)

    k_deq = np.asarray(k_q, np.float32) * np.asarray(k_s)[..., None]
    v_deq = np.asarray(v_q, np.float32) * np.asarray(v_s)[..., None]
    want = np.asarray(decode_attn_mha(q, jnp.asarray(k_deq),
                                      jnp.asarray(v_deq), kl))
    hs = lambda a: jnp.swapaxes(a, 1, 2)             # (B,S,H) -> (B,H,S)
    got = np.asarray(mha_decode_attn(
        q, k_q, v_q, kl, scale, k_scale=hs(k_s), v_scale=hs(v_s),
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mha_decode_attn_partials_merge():
    """Two half-window shards with flash stats merge to the full result
    (the seq-parallel MHA decode path)."""
    B, H, Dh, Dv, S = 2, 3, 48, 32, 256
    q = jnp.asarray(rnd((B, H, Dh), 40, 0.3))
    k = jnp.asarray(rnd((B, S, H, Dh), 41, 0.3), jnp.bfloat16)
    v = jnp.asarray(rnd((B, S, H, Dv), 42, 0.3), jnp.bfloat16)
    kl = jnp.asarray([200, 97], jnp.int32)
    scale = 1.0 / np.sqrt(Dh)
    want = np.asarray(decode_attn_mha(q, k, v, kl))

    half = S // 2
    parts = []
    for s in range(2):
        kl_loc = jnp.clip(kl - s * half, 0, half)
        parts.append(mha_decode_attn(
            q, k[:, s * half:(s + 1) * half], v[:, s * half:(s + 1) * half],
            kl_loc, scale, interpret=True, partials=True))
    (a0, m0, l0), (a1, m1, l1) = parts
    mg = jnp.maximum(m0, m1)
    w0, w1 = jnp.exp(m0 - mg), jnp.exp(m1 - mg)
    got = np.asarray((a0 * w0[..., None] + a1 * w1[..., None])
                     / (l0 * w0 + l1 * w1)[..., None])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mla_decode_attn_nondivisible_window():
    # S not a multiple of the kv tile; masked tail must not contribute
    B, H, R, P, S = 1, 2, 32, 16, 192
    q_c = jnp.asarray(rnd((B, H, R), 8))
    q_r = jnp.asarray(rnd((B, H, P), 9))
    ckv = jnp.asarray(rnd((B, S, R), 10), jnp.bfloat16)
    kr = jnp.asarray(rnd((B, S, P), 11), jnp.bfloat16)
    kl = jnp.asarray([100], jnp.int32)
    want = np.asarray(decode_attn_mla(q_c, q_r, ckv, kr, kl, 48))
    got = np.asarray(mla_decode_attn(q_c, q_r, ckv, kr, kl,
                                     1.0 / np.sqrt(48.0), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mha_prefill_attn_kernel_matches_jnp():
    from deepseek_tpu.ops.attention import prefill_attn_mha
    from deepseek_tpu.ops.pallas.attention import mha_prefill_attn

    B, T, H, Dh, Dv, S = 2, 12, 3, 48, 32, 64
    pos0, base = 7, 0
    q = jnp.asarray(rnd((B, T, H, Dh), 30, 0.3))
    k = jnp.asarray(rnd((B, S, H, Dh), 31, 0.3), jnp.bfloat16)
    v = jnp.asarray(rnd((B, S, H, Dv), 32, 0.3), jnp.bfloat16)
    scale = 1.0 / np.sqrt(Dh)
    q_pos = pos0 + jnp.arange(T, dtype=jnp.int32)
    cache_pos = jnp.arange(S, dtype=jnp.int32)
    want = np.asarray(prefill_attn_mha(q, k, v, q_pos, cache_pos,
                                       softmax_scale=scale))
    got = np.asarray(mha_prefill_attn(q, k, v, pos0, base, scale,
                                      interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mha_prefill_attn_kernel_int8_and_partials():
    from deepseek_tpu.models.kvcache import quantize_rows
    from deepseek_tpu.ops.attention import prefill_attn_mha
    from deepseek_tpu.ops.pallas.attention import mha_prefill_attn

    B, T, H, Dh, Dv, S = 1, 8, 2, 32, 32, 48
    pos0 = 5
    q = jnp.asarray(rnd((B, T, H, Dh), 33, 0.3))
    kf = jnp.asarray(rnd((B, S, H, Dh), 34, 0.3))
    vf = jnp.asarray(rnd((B, S, H, Dv), 35, 0.3))
    k8, ks = quantize_rows(kf)
    v8, vs = quantize_rows(vf)
    scale = 1.0 / np.sqrt(Dh)
    q_pos = pos0 + jnp.arange(T, dtype=jnp.int32)
    k_deq = jnp.asarray(np.asarray(k8, np.float32)
                        * np.asarray(ks)[..., None])
    v_deq = jnp.asarray(np.asarray(v8, np.float32)
                        * np.asarray(vs)[..., None])
    want = np.asarray(prefill_attn_mha(
        q, k_deq, v_deq, q_pos, jnp.arange(S, dtype=jnp.int32),
        softmax_scale=scale))
    hs = lambda a: jnp.swapaxes(a, 1, 2)
    got = np.asarray(mha_prefill_attn(
        q, k8, v8, pos0, 0, scale, k_scale=hs(ks), v_scale=hs(vs),
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # two half-window shards merged with the flash formula == full result
    def merge(parts):
        accs, ms, ls = zip(*parts)
        mg = np.maximum(*ms)
        num = sum(a * np.exp(m - mg)[..., None] for a, m in zip(accs, ms))
        den = sum(l * np.exp(m - mg) for l, m in zip(ls, ms))
        return num / np.maximum(den, 1e-30)[..., None]

    half = S // 2
    parts = []
    for sidx in range(2):
        sl = slice(sidx * half, (sidx + 1) * half)
        acc, m, l = mha_prefill_attn(
            q, k8[:, sl], v8[:, sl], pos0, sidx * half, scale,
            k_scale=hs(ks[:, sl]), v_scale=hs(vs[:, sl]),
            partials=True, interpret=True)
        parts.append((np.asarray(acc), np.asarray(m), np.asarray(l)))
    np.testing.assert_allclose(merge(parts), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("quantized", [False, True])
def test_mla_prefill_attn_kernel_matches_jnp(quantized):
    from deepseek_tpu.models.kvcache import quantize_rows
    from deepseek_tpu.ops.attention import prefill_attn_mla
    from deepseek_tpu.ops.pallas.attention import mla_prefill_attn

    B, T, H, R, P, S = 2, 10, 4, 32, 16, 40
    pos0 = 3
    q_c = jnp.asarray(rnd((B, T, H, R), 36, 0.3))
    q_r = jnp.asarray(rnd((B, T, H, P), 37, 0.3))
    ckv_f = jnp.asarray(rnd((B, S, R), 38, 0.3))
    kr_f = jnp.asarray(rnd((B, S, P), 39, 0.3))
    scale = 1.0 / np.sqrt(48.0)
    q_pos = pos0 + jnp.arange(T, dtype=jnp.int32)
    cache_pos = jnp.arange(S, dtype=jnp.int32)
    if quantized:
        ckv, cs = quantize_rows(ckv_f)
        kr, rs = quantize_rows(kr_f)
        ckv_ref = jnp.asarray(np.asarray(ckv, np.float32)
                              * np.asarray(cs)[..., None])
        kr_ref = jnp.asarray(np.asarray(kr, np.float32)
                             * np.asarray(rs)[..., None])
        got = np.asarray(mla_prefill_attn(
            q_c, q_r, ckv, kr, pos0, 0, scale, ckv_scale=cs,
            krope_scale=rs, interpret=True))
    else:
        ckv_ref, kr_ref = ckv_f.astype(jnp.bfloat16), kr_f.astype(jnp.bfloat16)
        got = np.asarray(mla_prefill_attn(
            q_c, q_r, ckv_ref, kr_ref, pos0, 0, scale, interpret=True))
    want = np.asarray(prefill_attn_mla(
        q_c, q_r, ckv_ref, kr_ref, q_pos, cache_pos, 48,
        softmax_scale=scale))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
