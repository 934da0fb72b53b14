import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.config import ActivationType, ModelConfig, ScoringFunc, TopKMethod
from deepseek_tpu.ops import (
    decode_attn_mha, decode_attn_mla, glu_act, moe_gate, qmatmul, rmsnorm,
    rope_v2, rope_v3,
)
from deepseek_tpu.ops.attention import prefill_attn_mha, prefill_attn_mla
from deepseek_tpu.ops.matmul import gather_experts
from deepseek_tpu.quant.qtensor import PlainTensor


def rnd(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


# --- scalar reference implementations (from the spec, for golden comparison) ---

def np_rmsnorm(x, w, eps):
    rms = np.sqrt((x * x).mean() + eps)
    return x / rms * w


def _angle_f32(pos, i, d, theta):
    # angles in float32, matching both the C++ reference (cosf/sinf of an f32
    # product) and our op; float64 angles diverge visibly at pos ~4k
    freq = np.float32(1.0 / theta ** (i / d))
    val = np.float32(pos) * freq
    return np.cos(val, dtype=np.float32), np.sin(val, dtype=np.float32)


def np_rope_v2(vec, pos, theta):
    d = len(vec)
    out = np.zeros_like(vec)
    for i in range(0, d, 2):
        c, s = _angle_f32(pos, i, d, theta)
        out[i // 2] = vec[i] * c - vec[i + 1] * s
        out[i // 2 + d // 2] = vec[i] * s + vec[i + 1] * c
    return out


def np_rope_v3(vec, pos, theta):
    d = len(vec)
    out = np.zeros_like(vec)
    for i in range(0, d, 2):
        c, s = _angle_f32(pos, i, d, theta)
        out[i] = vec[i] * c - vec[i + 1] * s
        out[i + 1] = vec[i] * s + vec[i + 1] * c
    return out


def np_attn(q, kh, vh, kv_len):
    """Single-head decode attention over a cache prefix (attn semantics)."""
    head_dim = q.shape[-1]
    scores = (kh[:kv_len] @ q) / np.sqrt(head_dim)
    e = np.exp(scores - scores.max())
    w = e / e.sum()
    return w @ vh[:kv_len]


# ---------------------------------------------------------------------------

def test_rmsnorm_matches_scalar():
    x, w = rnd(64, 1), rnd(64, 2)
    got = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    np.testing.assert_allclose(got, np_rmsnorm(x, w, 1e-6), rtol=1e-5)


def test_rmsnorm_batched():
    x, w = rnd((3, 5, 16), 3), rnd(16, 4)
    got = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    for i in range(3):
        for j in range(5):
            np.testing.assert_allclose(got[i, j], np_rmsnorm(x[i, j], w, 1e-5), rtol=1e-5)


@pytest.mark.parametrize("pos", [0, 1, 17, 4095])
def test_rope_v2_matches_scalar(pos):
    v = rnd(64, pos + 10)
    got = np.asarray(rope_v2(jnp.asarray(v), pos, 10000.0))
    np.testing.assert_allclose(got, np_rope_v2(v, pos, 10000.0), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pos", [0, 1, 17, 4095])
def test_rope_v3_matches_scalar(pos):
    v = rnd(64, pos + 20)
    got = np.asarray(rope_v3(jnp.asarray(v), pos, 10000.0))
    np.testing.assert_allclose(got, np_rope_v3(v, pos, 10000.0), rtol=1e-4, atol=1e-5)


def test_rope_batched_positions():
    v = rnd((4, 8, 64), 5)   # (T, H, d) with per-T positions
    pos = np.array([0, 3, 9, 100])
    got = np.asarray(rope_v3(jnp.asarray(v), jnp.asarray(pos)[:, None], 10000.0))
    for t in range(4):
        for h in range(8):
            np.testing.assert_allclose(
                got[t, h], np_rope_v3(v[t, h], pos[t], 10000.0), rtol=1e-4, atol=1e-5)


def test_glu_silu_gelu():
    g, u = rnd(32, 6), rnd(32, 7)
    silu = g / (1 + np.exp(-g)) * u
    np.testing.assert_allclose(
        np.asarray(glu_act(jnp.asarray(g), jnp.asarray(u), ActivationType.SILU)),
        silu, rtol=1e-5)
    gelu = 0.5 * g * (1 + np.tanh(0.797885 * (g + 0.044715 * g ** 3))) * u
    np.testing.assert_allclose(
        np.asarray(glu_act(jnp.asarray(g), jnp.asarray(u), ActivationType.GELU)),
        gelu, rtol=1e-5)


def _gate_cfg(**kw):
    base = dict(
        dim=8, hidden_dim=16, n_layers=1, n_heads=2, vocab_size=10, max_seq_len=64,
        rope_theta=1e4, norm_eps=1e-6, act=ActivationType.SILU, first_k_dense_replace=0,
        n_shared_experts=0, n_routed_experts=8, n_active_routed=2,
        moe_intermediate_size=16, routed_scaling_factor=1.0, n_group=4,
        norm_topk_prob=False, scoring_func=ScoringFunc.SOFTMAX, topk_group=2,
        topk_method=TopKMethod.GREEDY, has_moegate_bias=False, use_mla=False,
        kv_lora_rank=4, q_lora_rank=0, qk_nope_head_dim=4, qk_rope_head_dim=2,
        v_head_dim=4, weight_quant="fp32",
    )
    base.update(kw)
    from deepseek_tpu.config import QuantKind
    base["weight_quant"] = QuantKind.F32
    return ModelConfig(**base)


def test_moe_gate_greedy_softmax():
    cfg = _gate_cfg()
    logits = jnp.asarray(rnd(8, 8))
    w, idx = moe_gate(logits, None, cfg)
    scores = np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum()
    order = np.argsort(-scores)
    assert set(np.asarray(idx)) == set(order[:2])
    np.testing.assert_allclose(np.sort(np.asarray(w))[::-1], np.sort(scores[order[:2]])[::-1], rtol=1e-5)


def test_moe_gate_norm_topk_and_scaling():
    cfg = _gate_cfg(norm_topk_prob=True, routed_scaling_factor=2.5)
    w, _ = moe_gate(jnp.asarray(rnd(8, 9)), None, cfg)
    np.testing.assert_allclose(np.asarray(w).sum(), 2.5, rtol=1e-5)


def test_moe_gate_group_limited():
    cfg = _gate_cfg(topk_method=TopKMethod.GROUP_LIMITED_GREEDY, n_group=4,
                    topk_group=1, n_active_routed=2)
    # group 1 (experts 2,3) has the two largest scores; with topk_group=1 both
    # selected experts must come from that single winning group
    logits = jnp.asarray(np.array([0.0, 1.0, 5.0, 4.9, 0.1, 0.2, 0.0, 0.3], np.float32))
    _, idx = moe_gate(logits, None, cfg)
    assert set(np.asarray(idx)) == {2, 3}


def test_moe_gate_noaux_tc_bias_selection_only():
    cfg = _gate_cfg(topk_method=TopKMethod.NOAUX_TC, n_group=2, topk_group=1,
                    n_active_routed=2, scoring_func=ScoringFunc.SIGMOID,
                    norm_topk_prob=True, routed_scaling_factor=1.0)
    logits = jnp.asarray(np.zeros(8, np.float32))
    # bias pushes group 1 (experts 4..7) to win; weights must come from the
    # *unbiased* sigmoid scores (all equal -> normalized weights = 0.5 each)
    bias = jnp.asarray(np.array([0, 0, 0, 0, 10, 10, 0, 0], np.float32))
    w, idx = moe_gate(logits, bias, cfg)
    assert set(np.asarray(idx)) == {4, 5}
    np.testing.assert_allclose(np.asarray(w), [0.5, 0.5], rtol=1e-5)


def test_moe_gate_batched():
    cfg = _gate_cfg()
    logits = jnp.asarray(rnd((3, 7, 8), 10))
    w, idx = moe_gate(logits, None, cfg)
    assert w.shape == (3, 7, 2) and idx.shape == (3, 7, 2)


def test_decode_attn_mha_matches_scalar():
    B, S, H, D, Dv = 2, 16, 4, 8, 6
    q = rnd((B, H, D), 11)
    k = rnd((B, S, H, D), 12)
    v = rnd((B, S, H, Dv), 13)
    kv_len = 10
    got = np.asarray(decode_attn_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_len))
    for b in range(B):
        for h in range(H):
            want = np_attn(q[b, h], k[b, :, h], v[b, :, h], kv_len)
            np.testing.assert_allclose(got[b, h], want, rtol=1e-4, atol=1e-5)


def test_decode_attn_mha_per_batch_kv_len():
    B, S, H, D = 2, 8, 2, 4
    q, k, v = rnd((B, H, D), 14), rnd((B, S, H, D), 15), rnd((B, S, H, D), 16)
    kv_len = np.array([3, 7])
    got = np.asarray(decode_attn_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_len)))
    for b in range(B):
        for h in range(H):
            np.testing.assert_allclose(
                got[b, h], np_attn(q[b, h], k[b, :, h], v[b, :, h], kv_len[b]),
                rtol=1e-4, atol=1e-5)


def test_decode_attn_mla_matches_scalar():
    B, S, H, R, P = 1, 12, 3, 16, 4
    head_dim = 24
    q_c, q_r = rnd((B, H, R), 17), rnd((B, H, P), 18)
    ckv, krope = rnd((B, S, R), 19), rnd((B, S, P), 20)
    kv_len = 9
    got = np.asarray(decode_attn_mla(
        jnp.asarray(q_c), jnp.asarray(q_r), jnp.asarray(ckv), jnp.asarray(krope),
        kv_len, head_dim))
    for h in range(H):
        scores = (ckv[0, :kv_len] @ q_c[0, h] + krope[0, :kv_len] @ q_r[0, h]) / np.sqrt(head_dim)
        e = np.exp(scores - scores.max())
        w = e / e.sum()
        want = w @ ckv[0, :kv_len]
        np.testing.assert_allclose(got[0, h], want, rtol=1e-4, atol=1e-5)


def test_prefill_equals_stepwise_decode():
    """Chunked causal prefill attention must equal token-by-token decode."""
    B, S, H, D = 1, 8, 2, 4
    T = 5
    k = rnd((B, S, H, D), 21)
    v = rnd((B, S, H, D), 22)
    q = rnd((B, T, H, D), 23)
    cache_pos = np.array([0, 1, 2, 3, 4, -1, -1, -1])
    q_pos = np.arange(T)
    got = np.asarray(prefill_attn_mha(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q_pos), jnp.asarray(cache_pos)))
    for t in range(T):
        step = np.asarray(decode_attn_mha(
            jnp.asarray(q[:, t]), jnp.asarray(k), jnp.asarray(v), t + 1))
        np.testing.assert_allclose(got[:, t], step, rtol=1e-4, atol=1e-5)


def test_prefill_mla_equals_stepwise():
    B, S, R, P, H = 1, 8, 6, 4, 2
    head_dim = 10
    ckv, krope = rnd((B, S, R), 24), rnd((B, S, P), 25)
    T = 4
    q_c, q_r = rnd((B, T, H, R), 26), rnd((B, T, H, P), 27)
    cache_pos = np.array([0, 1, 2, 3, -1, -1, -1, -1])
    got = np.asarray(prefill_attn_mla(
        jnp.asarray(q_c), jnp.asarray(q_r), jnp.asarray(ckv), jnp.asarray(krope),
        jnp.asarray(np.arange(T)), jnp.asarray(cache_pos), head_dim))
    for t in range(T):
        step = np.asarray(decode_attn_mla(
            jnp.asarray(q_c[:, t]), jnp.asarray(q_r[:, t]),
            jnp.asarray(ckv), jnp.asarray(krope), t + 1, head_dim))
        np.testing.assert_allclose(got[:, t], step, rtol=1e-4, atol=1e-5)


def test_qmatmul_and_expert_gather():
    w = rnd((4, 6, 10), 28)  # (E, out, in)
    x = rnd((10,), 29)
    qt = PlainTensor(data=jnp.asarray(w))
    idx = jnp.asarray(np.array([2, 0]))
    sub = gather_experts(qt, idx)
    assert sub.data.shape == (2, 6, 10)
    y = qmatmul(PlainTensor(data=sub.data[0]), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), w[2] @ x, rtol=1e-4)


def test_yarn_rope_invariants():
    from deepseek_tpu.ops.rope import YarnParams, _yarn_inv_freq, yarn_get_mscale
    yp = YarnParams(factor=40.0, beta_fast=32, beta_slow=1, mscale=0.707,
                    mscale_all_dim=0.707, original_max_position=4096)
    d = 64
    f = _yarn_inv_freq(d, 10000.0, yp)
    base = 10000.0 ** -(np.arange(0, d, 2) / d)
    # interpolated between base/factor and base, monotone decreasing
    assert np.all(f <= base * (1 + 1e-6)) and np.all(f >= base / yp.factor * (1 - 1e-6))
    assert np.all(np.diff(f) < 0)
    # high-frequency (low dim idx) stays extrapolated, low-frequency interpolates
    np.testing.assert_allclose(f[0], base[0], rtol=1e-6)
    np.testing.assert_allclose(f[-1], base[-1] / yp.factor, rtol=1e-6)
    assert yarn_get_mscale(1.0, 0.707) == 1.0
    assert yarn_get_mscale(40.0, 0.707) > 1.0


def test_yarn_disabled_matches_plain():
    from deepseek_tpu.ops.rope import YarnParams
    v = rnd(32, 40)
    plain = np.asarray(rope_v3(jnp.asarray(v), 11, 1e4))
    yp = YarnParams(factor=1.0, beta_fast=32, beta_slow=1, mscale=1.0,
                    mscale_all_dim=1.0, original_max_position=4096)
    with_yarn = np.asarray(rope_v3(jnp.asarray(v), 11, 1e4, yp))
    np.testing.assert_allclose(with_yarn, plain, rtol=1e-6)


def test_yarn_model_runs_and_differs(tmp_path):
    """use_yarn=True produces a valid forward that differs from plain rope."""
    import dataclasses
    from tests.test_model import build
    from tests.util_tinymodel import tiny_config
    from deepseek_tpu.models import init_cache, make_forward
    cfg = tiny_config(use_mla=True, rs_factor=8.0, rs_mscale=0.707,
                      rs_mscale_all_dim=0.707)
    wd, params = build(cfg, seed=40)
    cfg_y = dataclasses.replace(cfg, use_yarn=True)
    f0 = make_forward(cfg, prefill=False, logits_mode="last")
    f1 = make_forward(cfg_y, prefill=False, logits_mode="last")
    tok = jnp.asarray([[7]], jnp.int32)
    l0, _ = f0(params, init_cache(cfg, 1), tok, 5)
    l1, _ = f1(params, init_cache(cfg_y, 1), tok, 5)
    assert np.isfinite(np.asarray(l1)).all()
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() > 1e-4
