"""Real-TPU smoke test: compile + numerics of the Pallas kernels and the
decode paths on the attached chip. Run manually / per round:

    python scripts/tpu_smoke.py

(Tests run CPU-interpret mode; this catches Mosaic-only lowering issues.)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from deepseek_tpu.ops.pallas.qmm import qmm, qmm_experts  # noqa: E402
from deepseek_tpu.quant import fp8, kquant, repack  # noqa: E402
from deepseek_tpu.quant.qtensor import Fp8Tensor, PlainTensor, Q2KTensor, Q3KTensor  # noqa: E402


def rnd(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def check(tag, got, want, tol=1e-2):
    # tol: the big kernel dots run at DEFAULT MXU precision (one bf16 pass,
    # ~2^-9 per-element truncation -> ~3e-3 max rel err on outputs), a
    # deliberate 2.8x-throughput trade documented in ops/pallas/qmm.py;
    # the 2/3-bit weight quantization error itself is orders larger.
    err = float(np.abs(np.asarray(got) - want).max())
    rel = err / (np.abs(want).max() + 1e-9)
    status = "OK " if rel < tol else "FAIL"
    print(f"{status} {tag}: max rel err {rel:.2e}")
    return rel < tol


def main():
    print("backend:", jax.default_backend(), jax.devices())
    ok = True

    # q2k dense
    w = rnd((512, 2048), seed=1)
    raw = kquant.quantize_q2_k(w)
    qs, sm, d, dmin = repack.repack_q2k(raw, 512, 2048)
    qt = Q2KTensor(qs=jnp.asarray(qs), sm=jnp.asarray(sm),
                   d=jnp.asarray(d), dmin=jnp.asarray(dmin))
    x = rnd((4, 2048), seed=2)
    want = x @ kquant.dequantize_q2_k(raw, 512, 2048).T
    ok &= check("q2k qmm", np.asarray(qmm(qt, jnp.asarray(x))), want)

    # q3k dense
    raw3 = kquant.quantize_q3_k(w)
    qs3, hm, sc, d3 = repack.repack_q3k(raw3, 512, 2048)
    qt3 = Q3KTensor(qs=jnp.asarray(qs3), hm=jnp.asarray(hm),
                    sc=jnp.asarray(sc), d=jnp.asarray(d3))
    want3 = x @ kquant.dequantize_q3_k(raw3, 512, 2048).T
    ok &= check("q3k qmm", np.asarray(qmm(qt3, jnp.asarray(x))), want3)

    # fp8 dense
    q8, s8 = fp8.blockwise_quantize(w, (128, 128))
    qt8 = Fp8Tensor(data=jnp.asarray(q8), scale=jnp.asarray(s8), block_size=(128, 128))
    want8 = x @ fp8.blockwise_dequantize(q8, s8, (128, 128)).T
    ok &= check("fp8 qmm", np.asarray(qmm(qt8, jnp.asarray(x))), want8)

    # expert gather (plain + q2k)
    E, m, n = 16, 256, 2048
    we = rnd((E, m, n), seed=3)
    idx = np.array([[3, 9, 14]], np.int32)
    xk = rnd((1, 3, n), seed=4)
    pt = PlainTensor(data=jnp.asarray(we))
    got = np.asarray(qmm_experts(pt, jnp.asarray(idx), jnp.asarray(xk)))
    for s in range(3):
        ok &= check(f"plain expert slot {s}", got[0, s], xk[0, s] @ we[idx[0, s]].T)

    q8e, s8e = zip(*(fp8.blockwise_quantize(we[e], (128, 128)) for e in range(E)))
    qt8e = Fp8Tensor(data=jnp.asarray(np.stack(q8e)),
                     scale=jnp.asarray(np.stack(s8e)), block_size=(128, 128))
    got = np.asarray(qmm_experts(qt8e, jnp.asarray(idx), jnp.asarray(xk)))
    deq8 = np.asarray(qt8e.dequant(jnp.float32))
    for s in range(3):
        ok &= check(f"fp8 expert slot {s}", got[0, s], xk[0, s] @ deq8[idx[0, s]].T)

    raws = np.stack([kquant.quantize_q2_k(we[e]) for e in range(E)])
    eqs, esm, ed, edm = repack.repack_q2k(raws, m, n)
    eqt = Q2KTensor(qs=jnp.asarray(eqs), sm=jnp.asarray(esm),
                    d=jnp.asarray(ed), dmin=jnp.asarray(edm))
    got = np.asarray(qmm_experts(eqt, jnp.asarray(idx), jnp.asarray(xk)))
    deq = np.stack([kquant.dequantize_q2_k(raws[e], m, n) for e in range(E)])
    for s in range(3):
        ok &= check(f"q2k expert slot {s}", got[0, s], xk[0, s] @ deq[idx[0, s]].T)

    # turbo K-quant runtime layout (pre-scaled int8 planes)
    from deepseek_tpu.quant.qtensor import q2k_to_turbo, q3k_to_turbo
    tq2 = q2k_to_turbo(qt)
    ok &= check("q2k-turbo qmm", np.asarray(qmm(tq2, jnp.asarray(x))), want)
    tq3 = q3k_to_turbo(qt3)
    ok &= check("q3k-turbo qmm", np.asarray(qmm(tq3, jnp.asarray(x))), want3)
    teqt = q2k_to_turbo(eqt)
    got = np.asarray(qmm_experts(teqt, jnp.asarray(idx), jnp.asarray(xk)))
    for s in range(3):
        ok &= check(f"q2k-turbo expert slot {s}", got[0, s],
                    xk[0, s] @ deq[idx[0, s]].T)

    # nibble K-quant runtime layout (4-bit planes, output-side offset dot)
    from deepseek_tpu.quant.qtensor import q2k_to_nibble, q3k_to_nibble
    nq2 = q2k_to_nibble(qt)
    ok &= check("q2k-nibble qmm", np.asarray(qmm(nq2, jnp.asarray(x))), want)
    nq3 = q3k_to_nibble(qt3)
    ok &= check("q3k-nibble qmm", np.asarray(qmm(nq3, jnp.asarray(x))), want3)
    neqt = q2k_to_nibble(eqt)
    got = np.asarray(qmm_experts(neqt, jnp.asarray(idx), jnp.asarray(xk)))
    for s in range(3):
        ok &= check(f"q2k-nibble expert slot {s}", got[0, s],
                    xk[0, s] @ deq[idx[0, s]].T)

    # fused expert FFN chain (w13 -> GLU -> w2 -> weighted combine in ONE
    # kernel; rowperm w13 layout). Real Mosaic exercises the two-phase
    # grid, dynamic-index scratch stores, SMEM f32 weights and the
    # resident accumulated output block — interpret mode cannot.
    from deepseek_tpu.config import ActivationType
    from deepseek_tpu.models.loader import _rowperm_qt
    from deepseek_tpu.ops.activations import glu_act
    from deepseek_tpu.ops.pallas.qmm import expert_ffn_fusable, qmm_expert_ffn
    import os
    os.environ["DSEEK_FUSED_FFN"] = "1"    # opt-in kernel, still smoke-pinned
    Ef, mhf, nf, df = 8, 256, 2048, 512
    w13f = rnd((Ef, 2 * mhf, nf), seed=21) * 0.1
    w2f = rnd((Ef, df, mhf), seed=22) * 0.1
    raw13 = np.stack([kquant.quantize_q3_k(w13f[e]) for e in range(Ef)])
    raw2 = np.stack([kquant.quantize_q3_k(w2f[e]) for e in range(Ef)])
    f13 = repack.repack_q3k(raw13, 2 * mhf, nf)
    f2 = repack.repack_q3k(raw2, df, mhf)
    nt13 = _rowperm_qt(q3k_to_nibble(Q3KTensor(
        qs=jnp.asarray(f13[0]), hm=jnp.asarray(f13[1]),
        sc=jnp.asarray(f13[2]), d=jnp.asarray(f13[3]))), 2, undo=False)
    nt2 = q3k_to_nibble(Q3KTensor(
        qs=jnp.asarray(f2[0]), hm=jnp.asarray(f2[1]),
        sc=jnp.asarray(f2[2]), d=jnp.asarray(f2[3])))
    assert expert_ffn_fusable(nt13, nt2)
    fidx = jnp.asarray([5, 1, 5, 7], jnp.int32)
    fwts = jnp.asarray([0.5, 1.0, 0.0, 0.25], jnp.float32)
    xf = rnd((1, nf), seed=23) * 0.2
    got = np.asarray(qmm_expert_ffn(
        nt13, nt2, fidx, jnp.asarray(xf), fwts, ActivationType.SILU))[0]
    d13n = np.asarray(nt13.dequant())
    d2n = np.asarray(nt2.dequant())
    want = np.zeros((df,), np.float64)
    for p in range(4):
        e = int(fidx[p])
        hh = np.asarray(glu_act(
            jnp.asarray(xf[0] @ d13n[e, :mhf].T),
            jnp.asarray(xf[0] @ d13n[e, mhf:].T), ActivationType.SILU),
            np.float64)
        want += float(fwts[p]) * (hh @ d2n[e].T)
    ok &= check("fused expert FFN chain", got, want, tol=3e-2)

    # flash-decode attention (bf16 + int8 caches) vs jnp formulation
    from deepseek_tpu.models.kvcache import dequant_rows, quantize_rows
    from deepseek_tpu.ops.attention import decode_attn_mla
    from deepseek_tpu.ops.pallas.attention import mla_decode_attn
    B, H, R, P, S = 2, 16, 512, 64, 1024
    q_c = jnp.asarray(rnd((B, H, R), 5) * 0.2)
    q_r = jnp.asarray(rnd((B, H, P), 6) * 0.2)
    ckv_f = jnp.asarray(rnd((B, S, R), 7) * 0.2)
    kr_f = jnp.asarray(rnd((B, S, P), 8) * 0.2)
    kl = jnp.asarray([600, 1024], jnp.int32)
    want = np.asarray(decode_attn_mla(
        q_c, q_r, ckv_f.astype(jnp.bfloat16), kr_f.astype(jnp.bfloat16),
        kl, 192))
    got = np.asarray(mla_decode_attn(
        q_c, q_r, ckv_f.astype(jnp.bfloat16), kr_f.astype(jnp.bfloat16),
        kl, 192 ** -0.5))
    ok &= check("mla flash-decode bf16", got, want)

    ckv_q, ckv_s = quantize_rows(ckv_f)
    kr_q, kr_s = quantize_rows(kr_f)
    want = np.asarray(decode_attn_mla(
        q_c, q_r, dequant_rows(ckv_q, ckv_s), dequant_rows(kr_q, kr_s),
        kl, 192))
    got = np.asarray(mla_decode_attn(
        q_c, q_r, ckv_q, kr_q, kl, 192 ** -0.5,
        ckv_scale=ckv_s, krope_scale=kr_s))
    ok &= check("mla flash-decode int8", got, want)

    from deepseek_tpu.ops.attention import decode_attn_mha
    from deepseek_tpu.ops.pallas.attention import mha_decode_attn
    Hh, Dh, Dv = 4, 192, 128
    qm = jnp.asarray(rnd((B, Hh, Dh), 9) * 0.2)
    kf = jnp.asarray(rnd((B, S, Hh, Dh), 10) * 0.2)
    vf = jnp.asarray(rnd((B, S, Hh, Dv), 11) * 0.2)
    want = np.asarray(decode_attn_mha(
        qm, kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16), kl))
    got = np.asarray(mha_decode_attn(
        qm, kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16), kl, Dh ** -0.5))
    ok &= check("mha flash-decode bf16", got, want)
    k8, ks = quantize_rows(kf)
    v8, vs = quantize_rows(vf)
    want = np.asarray(decode_attn_mha(
        qm, dequant_rows(k8, ks), dequant_rows(v8, vs), kl))
    got = np.asarray(mha_decode_attn(
        qm, k8, v8, kl, Dh ** -0.5, k_scale=jnp.swapaxes(ks, 1, 2),
        v_scale=jnp.swapaxes(vs, 1, 2)))
    ok &= check("mha flash-decode int8", got, want)

    # seq-parallel partials on real Mosaic: two half-window shards with
    # flash stats must merge to the full-window result. This exercises the
    # (1, hc, 1) stat output block specs — interpret-mode tests cannot
    # catch Mosaic lowering violations (CLAUDE.md).
    def fmerge(parts):
        (a0, m0, l0), (a1, m1, l1) = parts
        mg = jnp.maximum(m0, m1)
        w0, w1 = jnp.exp(m0 - mg), jnp.exp(m1 - mg)
        den = jnp.maximum(l0 * w0 + l1 * w1, 1e-30)
        return np.asarray((a0 * w0[..., None] + a1 * w1[..., None])
                          / den[..., None])

    half = S // 2
    kbf, vbf = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
    got = fmerge([mha_decode_attn(
        qm, kbf[:, s * half:(s + 1) * half],
        vbf[:, s * half:(s + 1) * half],
        jnp.clip(kl - s * half, 0, half), Dh ** -0.5, partials=True)
        for s in range(2)])
    want = np.asarray(mha_decode_attn(qm, kbf, vbf, kl, Dh ** -0.5))
    ok &= check("mha flash-decode partials merge", got, want)

    ckv_bf, kr_bf = ckv_f.astype(jnp.bfloat16), kr_f.astype(jnp.bfloat16)
    got = fmerge([mla_decode_attn(
        q_c, q_r, ckv_bf[:, s * half:(s + 1) * half],
        kr_bf[:, s * half:(s + 1) * half],
        jnp.clip(kl - s * half, 0, half), 192 ** -0.5, partials=True)
        for s in range(2)])
    want = np.asarray(mla_decode_attn(q_c, q_r, ckv_bf, kr_bf, kl,
                                      192 ** -0.5))
    ok &= check("mla flash-decode partials merge", got, want)

    # flash prefill kernels (chunked causal) vs the jnp formulation, full
    # window and as two merged window slices (the seq/context-parallel
    # prefill path)
    from deepseek_tpu.ops.attention import prefill_attn_mha, prefill_attn_mla
    from deepseek_tpu.ops.pallas.attention import (
        mha_prefill_attn, mla_prefill_attn,
    )
    Tt = 128
    pos_q = jnp.arange(Tt, dtype=jnp.int32) + (S - Tt)
    cache_pos = jnp.arange(S, dtype=jnp.int32)

    qc2 = jnp.asarray(rnd((B, Tt, H, R), 12) * 0.2)
    qr2 = jnp.asarray(rnd((B, Tt, H, P), 13) * 0.2)
    want = np.asarray(prefill_attn_mla(
        qc2, qr2, ckv_bf, kr_bf, pos_q, cache_pos, 192))
    got = np.asarray(mla_prefill_attn(
        qc2, qr2, ckv_bf, kr_bf, jnp.int32(S - Tt), jnp.int32(0),
        192 ** -0.5))
    ok &= check("mla flash-prefill bf16", got, want)
    got = fmerge([mla_prefill_attn(
        qc2, qr2, ckv_bf[:, s * half:(s + 1) * half],
        kr_bf[:, s * half:(s + 1) * half], jnp.int32(S - Tt),
        jnp.int32(s * half), 192 ** -0.5, partials=True)
        for s in range(2)])
    ok &= check("mla flash-prefill partials merge", got, want)

    qm2 = jnp.asarray(rnd((B, Tt, Hh, Dh), 14) * 0.2)
    want = np.asarray(prefill_attn_mha(
        qm2, kbf, vbf, pos_q, cache_pos, Dh ** -0.5))
    got = np.asarray(mha_prefill_attn(
        qm2, kbf, vbf, jnp.int32(S - Tt), jnp.int32(0), Dh ** -0.5))
    ok &= check("mha flash-prefill bf16", got, want)
    got = fmerge([mha_prefill_attn(
        qm2, kbf[:, s * half:(s + 1) * half],
        vbf[:, s * half:(s + 1) * half], jnp.int32(S - Tt),
        jnp.int32(s * half), Dh ** -0.5, partials=True)
        for s in range(2)])
    ok &= check("mha flash-prefill partials merge", got, want)

    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
