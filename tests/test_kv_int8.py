"""int8 KV cache: quantize/dequant roundtrip, decode parity vs bf16 cache,
ring wraparound + sink re-rotation, and the scale-folded Pallas kernels."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.models.kvcache import dequant_rows, quantize_rows

from tests.test_model import build
from tests.util_tinymodel import tiny_config


def test_quantize_rows_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 5, 64)),
                    jnp.float32)
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5)
    back = dequant_rows(q, s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=float(jnp.max(jnp.abs(x))) / 127 * 0.51)
    # zero rows stay zero (no div-by-zero)
    q0, s0 = quantize_rows(jnp.zeros((2, 8)))
    assert not np.isnan(np.asarray(dequant_rows(q0, s0))).any()


@pytest.mark.parametrize("use_mla", [True, False])
def test_int8_cache_matches_float_cache(use_mla):
    """Prefill + decode with int8 cache tracks the f32-cache logits within
    int8 rounding error."""
    cfg = tiny_config(use_mla=use_mla, vocab_size=64)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    wd, params = build(cfg, seed=40)
    tokens = [1, 9, 22, 40, 3, 15]

    def run(c):
        pre = make_forward(c, prefill=True, logits_mode="all")
        step = make_forward(c, prefill=False, logits_mode="last")
        cache = init_cache(c, batch=1)
        toks = jnp.asarray([tokens[:3]], jnp.int32)
        lg, cache = pre(params, cache, toks, 0)
        outs = [np.asarray(lg)]
        for pos, t in enumerate(tokens[3:], start=3):
            lg, cache = step(params, cache, jnp.asarray([[t]], jnp.int32), pos)
            outs.append(np.asarray(lg))
        return outs

    base = run(cfg)
    got = run(cfg8)
    for b, g in zip(base, got):
        scale = np.abs(b).max() + 1e-6
        assert np.abs(g - b).max() / scale < 0.06, \
            f"int8 cache drift {np.abs(g - b).max() / scale}"


def test_int8_cache_ring_and_sinks():
    """Decode FAR past the window: ring wraparound + per-step sink
    re-rotation with the quantized cache stays close to the float-cache run
    — the float master copy of the sink rows prevents the int8 round-trip
    error from compounding over the 56 rotations this run performs."""
    cfg = tiny_config(use_mla=True, rs_original_max_position_embeddings=8)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    wd, params = build(cfg, seed=41)
    tokens = np.random.default_rng(1).integers(3, 60, size=64).tolist()

    def run(c):
        step = make_forward(c, prefill=False, logits_mode="last")
        cache = init_cache(c, batch=1)
        lg = None
        for pos, t in enumerate(tokens):
            lg, cache = step(params, cache, jnp.asarray([[t]], jnp.int32), pos)
        return np.asarray(lg)

    base = run(cfg)
    got = run(cfg8)
    assert np.isfinite(got).all()
    assert np.abs(got - base).max() / (np.abs(base).max() + 1e-6) < 0.1


@pytest.mark.parametrize("use_mla", [True, False])
def test_int8_cache_pallas_impl_end_to_end(use_mla):
    """Decode through the Pallas kernels (interpret) with the int8 cache."""
    cfg = tiny_config(use_mla=use_mla, vocab_size=64)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8",
                               kernel_impl="pallas")
    wd, params = build(cfg, seed=42)
    tokens = [1, 9, 22, 40]

    base_step = make_forward(cfg, prefill=False, logits_mode="last")
    q8_step = make_forward(cfg8, prefill=False, logits_mode="last")
    c1, c2 = init_cache(cfg, batch=1), init_cache(cfg8, batch=1)
    for pos, t in enumerate(tokens):
        tk = jnp.asarray([[t]], jnp.int32)
        lg1, c1 = base_step(params, c1, tk, pos)
        lg2, c2 = q8_step(params, c2, tk, pos)
    b, g = np.asarray(lg1), np.asarray(lg2)
    assert np.abs(g - b).max() / (np.abs(b).max() + 1e-6) < 0.06


@pytest.mark.parametrize("use_mla", [True, False])
def test_int8_pallas_kernels_match_jnp(use_mla):
    """The scale-folded Pallas decode kernels == jnp dequant formulation."""
    rng = np.random.default_rng(2)
    if use_mla:
        from deepseek_tpu.ops.attention import decode_attn_mla
        from deepseek_tpu.ops.pallas.attention import mla_decode_attn
        B, H, R, P, S = 2, 4, 64, 32, 256
        q_c = jnp.asarray(rng.standard_normal((B, H, R)), jnp.float32)
        q_r = jnp.asarray(rng.standard_normal((B, H, P)), jnp.float32)
        ckv, ckv_s = quantize_rows(
            jnp.asarray(rng.standard_normal((B, S, R)), jnp.float32))
        kr, kr_s = quantize_rows(
            jnp.asarray(rng.standard_normal((B, S, P)), jnp.float32))
        kl = jnp.asarray([100, 256], jnp.int32)
        want = np.asarray(decode_attn_mla(
            q_c, q_r, dequant_rows(ckv, ckv_s), dequant_rows(kr, kr_s),
            kl, 96))
        got = np.asarray(mla_decode_attn(
            q_c, q_r, ckv, kr, kl, 1.0 / np.sqrt(96.0),
            ckv_scale=ckv_s, krope_scale=kr_s, interpret=True))
    else:
        from deepseek_tpu.ops.attention import decode_attn_mha
        from deepseek_tpu.ops.pallas.attention import mha_decode_attn
        B, H, Dh, Dv, S = 2, 3, 48, 32, 256
        q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
        k, k_s = quantize_rows(
            jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.float32))
        v, v_s = quantize_rows(
            jnp.asarray(rng.standard_normal((B, S, H, Dv)), jnp.float32))
        kl = jnp.asarray([100, 256], jnp.int32)
        want = np.asarray(decode_attn_mha(
            q, dequant_rows(k, k_s), dequant_rows(v, v_s), kl))
        got = np.asarray(mha_decode_attn(
            q, k, v, kl, 1.0 / np.sqrt(Dh),
            k_scale=jnp.swapaxes(k_s, 1, 2),
            v_scale=jnp.swapaxes(v_s, 1, 2), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
