"""Decompose the V3 MoE decode layer's fixed small-op cost on the chip.

The round-3 k-ablation (PERFORMANCE.md "Known headroom") put the V3
MoE-layer decode cost at 0.83 ms vs 0.48 ms of pure expert-byte streaming:
~46-57 us/pair of kernel marginal plus ~0.26 ms/layer of FIXED small-op
cost (gate top-k, counting-sort dispatch, expert-kernel launches,
segment-sum combine). This bench times each constituent in isolation at
the exact V3 shapes (dim 7168, E=256 noaux_tc k=8 + 1 shared, m=2048,
Q3_K nibble) so the optimization targets are measured, not guessed.

Every op iterates inside one lax.scan with an x data dependence; per-iter
cost is the two-length slope (see scripts/bench_ops.bench and the axon
timing rules in CLAUDE.md).

Usage: python scripts/bench_moe_micro.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp

from bench_ops import bench

from deepseek_tpu.models.testing import (
    deepseek_v3_proportions, random_fused_params,
)
from deepseek_tpu.models.deepseek import _ffn
from deepseek_tpu.ops.gating import moe_gate
from deepseek_tpu.ops.matmul import kernel_impl
from deepseek_tpu.ops.pallas.qmm import qmm_experts
from deepseek_tpu.parallel.spmd import NULL_CTX


def main():
    cfg = deepseek_v3_proportions(n_layers=1, first_k_dense_replace=0)
    impl = kernel_impl(cfg, prefill=False)
    print(f"backend={jax.default_backend()} impl={impl}")
    params = random_fused_params(cfg, "q3_k_nibble")
    jax.block_until_ready(jax.tree.leaves(params))
    lp = params.layers[0]
    dim, k, E = cfg.dim, cfg.n_active_routed, cfg.n_routed_experts
    m = cfg.moe_intermediate_size
    ns = cfg.n_shared_experts
    N = k + ns                       # pairs per token at B=1

    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (1, 1, dim), jnp.float32) * 0.1

    # --- 1. the full MoE block (what the layer actually pays) -----------
    def full(x, lp):
        out, _ = _ffn(lp, cfg, x, 0, False, impl, NULL_CTX)
        return out
    t_full = bench("MoE block full (gate+dispatch+kernels+combine)",
                   full, xb, 0, consts=(lp,))

    # --- 2. router + gate ------------------------------------------------
    def gate(x, moegate, bias):
        logits = jnp.einsum("btd,ed->bte", x.astype(jnp.float32), moegate,
                            preferred_element_type=jnp.float32)
        w, idx = moe_gate(logits, bias, cfg)
        return w + idx.astype(jnp.float32)
    t_gate = bench("router einsum + moe_gate (noaux_tc E=256)",
                   gate, xb, 0, consts=(lp.moegate, lp.moegate_bias))

    def router_only(x, moegate):
        return jnp.einsum("btd,ed->bte", x.astype(jnp.float32), moegate,
                          preferred_element_type=jnp.float32)
    t_router = bench("router einsum only", router_only, xb,
                     lp.moegate.nbytes, consts=(lp.moegate,))

    # --- 3. gate + shared-fold + dispatch_pairs -------------------------
    def gate_dispatch(x, moegate, bias):
        logits = jnp.einsum("btd,ed->bte", x.astype(jnp.float32), moegate,
                            preferred_element_type=jnp.float32)
        w, idx = moe_gate(logits, bias, cfg)
        sid = jnp.arange(E, E + ns, dtype=idx.dtype)
        idx = jnp.concatenate([idx, jnp.broadcast_to(sid, (1, 1, ns))], -1)
        w = jnp.concatenate([w, jnp.ones((1, 1, ns), w.dtype)], -1)
        lidx, wts, tok = NULL_CTX.dispatch_pairs(
            idx.reshape(1, N), w.reshape(1, N), E + ns)
        return wts + lidx.astype(jnp.float32) + tok.astype(jnp.float32)
    t_gdis = bench("gate + fold + dispatch_pairs", gate_dispatch, xb, 0,
                   consts=(lp.moegate, lp.moegate_bias))

    # --- 4. kernels+combine with a FIXED pair list -----------------------
    lidx0 = jnp.arange(N, dtype=jnp.int32)[None] * (E // N)   # distinct experts
    wts0 = jnp.full((N,), 1.0 / N, jnp.float32)
    tok0 = jnp.zeros((N,), jnp.int32)

    def kernels(x, w13, w2, lidx, wts, tok):
        x2 = x.reshape(1, dim)
        xk = x2[tok][None]
        h2 = qmm_experts(w13, lidx, xk, interpret=impl["interpret"])
        h = jax.nn.silu(h2[..., :m]) * h2[..., m:]
        per = qmm_experts(w2, lidx, h.astype(x.dtype),
                          interpret=impl["interpret"])[0]
        out = jax.ops.segment_sum(per * wts[:, None], tok, num_segments=1)
        return out
    active = (3 * m * dim) * N * 0.625   # nibble bytes/weight, distinct experts
    t_kern = bench("pair kernels + combine (fixed pair list)", kernels, xb,
                   active, consts=(lp.w13s, lp.w2s, lidx0, wts0, tok0))

    # --- 5. w13 kernel alone / w2 alone ----------------------------------
    def w13_only(x, w13, lidx, tok):
        xk = x.reshape(1, dim)[tok][None]
        return qmm_experts(w13, lidx, xk, interpret=impl["interpret"])
    t_w13 = bench("qmm_experts w13 (9 pairs, distinct)", w13_only, xb,
                  (2 * m * dim) * N * 0.625, consts=(lp.w13s, lidx0, tok0))

    h0 = jax.random.normal(key, (1, N, m), jnp.float32) * 0.1
    def w2_only(x, w2, lidx, h):
        hx = h + x[..., :1]            # x dependence
        return qmm_experts(w2, lidx, hx, interpret=impl["interpret"])
    t_w2 = bench("qmm_experts w2 (9 pairs, distinct)", w2_only, xb,
                 (m * dim) * N * 0.625, consts=(lp.w2s, lidx0, h0))

    # --- 6. combine alone -------------------------------------------------
    per0 = jax.random.normal(key, (N, dim), jnp.float32)
    def combine(x, per, wts, tok):
        p = per + x.reshape(1, dim)
        return jax.ops.segment_sum(p * wts[:, None], tok, num_segments=1)
    t_comb = bench("segment_sum combine (9 pairs -> 1 row)", combine, xb,
                   0, consts=(per0, wts0, tok0))

    def combine_mm(x, per, wts, tok):
        p = per + x.reshape(1, dim)
        oh = (tok[:, None] == jnp.arange(1)[None, :]).astype(jnp.float32)
        return jnp.einsum("nb,nd->bd", oh, p * wts[:, None],
                          preferred_element_type=jnp.float32)
    t_combm = bench("one-hot matmul combine (alternative)", combine_mm, xb,
                    0, consts=(per0, wts0, tok0))

    print()
    print(f"full block        {t_full*1e6:8.1f} us")
    print(f"  gate            {t_gate*1e6:8.1f} us "
          f"(router alone {t_router*1e6:.1f})")
    print(f"  gate+dispatch   {t_gdis*1e6:8.1f} us "
          f"(dispatch delta {(t_gdis-t_gate)*1e6:.1f})")
    print(f"  kernels+combine {t_kern*1e6:8.1f} us "
          f"(w13 {t_w13*1e6:.1f} + w2 {t_w2*1e6:.1f} + comb {t_comb*1e6:.1f}"
          f" / mm-comb {t_combm*1e6:.1f})")
    print(f"  unaccounted     {(t_full-t_gdis-t_kern)*1e6:8.1f} us")


if __name__ == "__main__":
    main()
