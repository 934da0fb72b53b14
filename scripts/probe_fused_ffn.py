"""A/B the fused expert-chain kernel vs the 3-dispatch chain on chip.

V3 decode shapes (dim 7168, E=257 incl. shared, m=2048, 9 distinct pairs,
Q3_K nibble). Two-length-slope timing (bench_ops.bench). The fused
kernel's tile budget comes from DSEEK_FFN_VMEM_MB (both phases share it),
so run this per-budget:

    python scripts/probe_fused_ffn.py            # defaults
    DSEEK_FFN_VMEM_MB=48 python scripts/probe_fused_ffn.py
"""

import os
import sys

os.environ["DSEEK_FUSED_FFN"] = "1"
sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp

from bench_ops import bench

from deepseek_tpu.config import ActivationType
from deepseek_tpu.models.testing import (
    deepseek_v3_proportions, random_fused_params,
)
from deepseek_tpu.ops.pallas.qmm import (
    _FFN_VMEM_MB, _ffn_tile, expert_ffn_fusable, qmm_expert_ffn, qmm_experts,
)


def main():
    cfg = deepseek_v3_proportions(n_layers=1, first_k_dense_replace=0)
    params = random_fused_params(cfg, "q3_k_nibble")
    jax.block_until_ready(jax.tree.leaves(params))
    lp = params.layers[0]
    dim, k, E = cfg.dim, cfg.n_active_routed, cfg.n_routed_experts
    m = cfg.moe_intermediate_size
    N = k + cfg.n_shared_experts

    w13, w2 = lp.w13s, lp.w2s
    assert expert_ffn_fusable(w13, w2)
    half = _FFN_VMEM_MB / 2
    td13, td2 = _ffn_tile(2 * m, dim, half), _ffn_tile(dim, m, half)
    print(f"backend={jax.default_backend()} budget={_FFN_VMEM_MB}MB "
          f"td13={td13} (J13={2 * m // td13}) td2={td2} "
          f"(J2={dim // td2})")

    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (1, dim), jnp.float32) * 0.1
    lidx = jnp.arange(N, dtype=jnp.int32) * (E // N)   # distinct experts
    wts = jnp.full((N,), 1.0 / N, jnp.float32)
    tok = jnp.zeros((N,), jnp.int32)
    active = (3 * m * dim) * N * 0.625                 # nibble bytes

    def fused(x, w13, w2, lidx, wts):
        return qmm_expert_ffn(w13, w2, lidx, x, wts, ActivationType.SILU)

    t_f = bench("fused expert chain (1 dispatch)", fused, xb, active,
                consts=(w13, w2, lidx, wts))

    def chain(x, w13, w2, lidx, wts, tok):
        xk = x[tok][None]
        h2 = qmm_experts(w13, lidx[None], xk, pair_major=True)
        h = jax.nn.silu(h2[..., :m]) * h2[..., m:]
        per = qmm_experts(w2, lidx[None], h, pair_major=True,
                          x_prepermuted=True)[0]
        return jax.ops.segment_sum(per * wts[:, None], tok, num_segments=1)

    t_c = bench("3-dispatch chain (pair-major)", chain, xb, active,
                consts=(w13, w2, lidx, wts, tok))

    print(f"\nfused {t_f*1e6:.1f} us  ({active / t_f / 1e9:.0f} GB/s of "
          f"layout bytes)")
    print(f"chain {t_c*1e6:.1f} us  ({active / t_c / 1e9:.0f} GB/s)")
    print(f"delta {(t_c - t_f)*1e6:+.1f} us ({t_c / t_f:.3f}x)")


if __name__ == "__main__":
    main()
