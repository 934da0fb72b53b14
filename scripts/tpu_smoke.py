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

    raws = np.stack([kquant.quantize_q2_k(we[e]) for e in range(E)])
    eqs, esm, ed, edm = repack.repack_q2k(raws, m, n)
    eqt = Q2KTensor(qs=jnp.asarray(eqs), sm=jnp.asarray(esm),
                    d=jnp.asarray(ed), dmin=jnp.asarray(edm))
    got = np.asarray(qmm_experts(eqt, jnp.asarray(idx), jnp.asarray(xk)))
    deq = np.stack([kquant.dequantize_q2_k(raws[e], m, n) for e in range(E)])
    for s in range(3):
        ok &= check(f"q2k expert slot {s}", got[0, s], xk[0, s] @ deq[idx[0, s]].T)

    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
