"""Fused expert FFN chain kernel (ops.pallas.qmm.qmm_expert_ffn) and the
row-permuted w13 layout (KNibbleTensor.rowperm / loader._rowperm_qt).

The reference runs each active expert's whole FFN in one loop pass
(infer.cpp:853-878); the fused kernel is the TPU analogue — one Pallas
dispatch streams w13 tiles -> GLU in VMEM -> w2 tiles -> weighted combine.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.config import ActivationType
from deepseek_tpu.models.loader import _rowperm_qt
from deepseek_tpu.models.testing import _direct_qtensor
from deepseek_tpu.ops.activations import glu_act
from deepseek_tpu.ops.pallas.qmm import (
    expert_ffn_fusable, qmm_expert_ffn, qmm_experts,
)


def _keygen(seed):
    box = [jax.random.PRNGKey(seed)]

    def nxt():
        box[0], sub = jax.random.split(box[0])
        return sub

    return nxt


def _tables(quant, E=3, mh=1024, n=256, d=512, seed=11):
    nxt = _keygen(seed)
    w13 = _direct_qtensor(nxt, (E, 2 * mh, n), quant)
    w2 = _direct_qtensor(nxt, (E, d, mh), quant)
    return w13, w2


def test_rowperm_dequant_roundtrip():
    """_rowperm_qt relabels storage only: dequant() restores the natural
    row order exactly."""
    w13, _ = _tables("q2_k_nibble", E=2, mh=256, n=256, d=256)
    ref = np.asarray(w13.dequant())
    rp = _rowperm_qt(w13, 2, undo=False)
    assert rp.rowperm == 2
    np.testing.assert_array_equal(np.asarray(rp.dequant()), ref)
    back = _rowperm_qt(rp, 2, undo=True)
    assert back.rowperm == 0
    np.testing.assert_array_equal(np.asarray(back.p), np.asarray(w13.p))


@pytest.mark.parametrize("quant", ["q2_k_nibble", "q3_k_nibble"])
@pytest.mark.parametrize("act", [ActivationType.SILU, ActivationType.GELU])
def test_qmm_expert_ffn_matches_dequant(quant, act, monkeypatch):
    """Fused chain == dequant reference: repeated experts, a zero-weight
    (dead) pair, multi-tile w13 (J13 > 1)."""
    monkeypatch.setenv("DSEEK_FUSED_FFN", "1")
    E, mh, n, d = 3, 1024, 256, 512
    w13, w2 = _tables(quant, E=E, mh=mh, n=n, d=d)
    rp13 = _rowperm_qt(w13, 2, undo=False)
    assert expert_ffn_fusable(rp13, w2)

    idx = jnp.array([2, 0, 2, 1], jnp.int32)         # expert 2 repeated
    wts = jnp.array([0.75, 1.0, 0.0, 0.25], jnp.float32)  # one dead pair
    x = jax.random.normal(jax.random.PRNGKey(3), (1, n), jnp.float32)

    y = qmm_expert_ffn(rp13, w2, idx, x, wts, act, interpret=True)
    assert y.shape == (1, d)

    d13 = np.asarray(w13.dequant())                  # (E, 2mh, n) natural
    d2 = np.asarray(w2.dequant())                    # (E, d, mh)
    xf = np.asarray(x)[0]
    want = np.zeros((d,), np.float64)
    for p in range(idx.shape[0]):
        e = int(idx[p])
        h1 = xf @ d13[e, :mh].T
        h3 = xf @ d13[e, mh:].T
        h = np.asarray(glu_act(jnp.asarray(h1), jnp.asarray(h3), act),
                       np.float64)
        want += float(wts[p]) * (h @ d2[e].T)

    np.testing.assert_allclose(np.asarray(y)[0], want, rtol=2e-4, atol=2e-4)


def test_qmm_experts_prepermuted_chain_matches_natural():
    """3-dispatch fallback with a rowperm w13: h comes out permuted and
    the w2 kernel consumes it via x_prepermuted — same mixture as the
    natural-layout chain."""
    E, mh, n, d = 3, 256, 256, 256
    w13, w2 = _tables("q3_k_nibble", E=E, mh=mh, n=n, d=d, seed=5)
    rp13 = _rowperm_qt(w13, 2, undo=False)
    idx = jnp.array([[1, 2, 0, 1]], jnp.int32)       # (1, N)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 4, n), jnp.float32)

    # natural chain
    h2_nat = qmm_experts(w13, idx, x, interpret=True)
    h_nat = glu_act(h2_nat[..., :mh], h2_nat[..., mh:], ActivationType.SILU)
    y_nat = qmm_experts(w2, idx, h_nat, interpret=True)

    # rowperm chain
    h2_rp = qmm_experts(rp13, idx, x, interpret=True)
    h_rp = glu_act(h2_rp[..., :mh], h2_rp[..., mh:], ActivationType.SILU)
    y_rp = qmm_experts(w2, idx, h_rp, interpret=True, x_prepermuted=True)

    np.testing.assert_allclose(np.asarray(y_rp), np.asarray(y_nat),
                               rtol=2e-4, atol=2e-4)


def test_engine_fused_kernel_greedy_parity(tmp_path, monkeypatch):
    """Engine-level: the nibble runtime (rowperm + fused kernel path in
    interpret mode) produces the same greedy tokens and near-identical
    perplexity as the XLA dequant path on the same checkpoint."""
    import os
    monkeypatch.setenv("DSEEK_FUSED_FFN", "1")   # opt-in layout + kernel

    from deepseek_tpu import convert as cv
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.ops.pallas.qmm import TRACE_COUNTS
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=31, scale=0.1))
    out = os.path.join(str(tmp_path), "ck")
    cv.convert(hf_dir, out, quant="q3_k", use_mla=True)

    e_xla = Engine(out, seed=0, prefill_chunk=8, decode_block=1,
                   kquant_runtime="nibble")
    lp = e_xla.params.layers[1]
    nt = lp.w13s if lp.w13s is not None else lp.w13
    assert nt.rowperm == 2, "fused layout must be row-permuted"

    prompt = e_xla.tokenizer.encode("hello world", bos=True)
    out_xla, _ = e_xla.generate(prompt, num_steps=6, temperature=0.0)
    p_xla = e_xla.perplexity(prompt + out_xla)[0]

    import os
    os.environ["DSEEK_FUSED_FFN"] = "1"    # opt-in (default-off kernel)
    try:
        _engine_fused_body(out, out_xla, p_xla, dataclasses, Engine,
                           TRACE_COUNTS, prompt)
    finally:
        os.environ.pop("DSEEK_FUSED_FFN", None)


def _engine_fused_body(out, out_xla, p_xla, dataclasses, Engine,
                       TRACE_COUNTS, prompt):
    e_k = Engine(out, seed=0, prefill_chunk=8, decode_block=1,
                 kquant_runtime="nibble")
    e_k.cfg = dataclasses.replace(e_k.cfg, kernel_impl="pallas")
    before = TRACE_COUNTS["qmm_expert_ffn"]
    out_k, _ = e_k.generate(prompt, num_steps=6, temperature=0.0)
    assert TRACE_COUNTS["qmm_expert_ffn"] > before, \
        "decode must take the fused expert-chain kernel"
    assert out_k == out_xla
    p_k = e_k.perplexity(prompt + out_k)[0]
    np.testing.assert_allclose(p_k, p_xla, rtol=2e-2)

    # GROUPED prefill with the rowperm layout: a chunk > _PAIR_PREFILL_
    # MAX_PAIRS pairs takes _quantized_grouped_ffn's rp branch (h stays
    # permuted, s16 via the un-permute transpose) — ppl must match the
    # small-chunk run on the same tokens
    e_g = Engine(out, seed=0, prefill_chunk=64, decode_block=1,
                 kquant_runtime="nibble")
    e_g.cfg = dataclasses.replace(e_g.cfg, kernel_impl="pallas")
    p_g = e_g.perplexity(prompt + out_k)[0]
    np.testing.assert_allclose(p_g, p_k, rtol=2e-3)
