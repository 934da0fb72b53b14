"""Decompose the V3 decode ATTENTION block's cost on the chip.

Companion to scripts/bench_moe_micro.py: that bench showed the MoE FFN
block runs near its kernel roofline (~393 us at 665 GB/s) with only
~48 us of gate/dispatch/combine overhead — so the 0.81 ms marginal
MoE-layer cost must be ~half attention-side. This times each attention
constituent at the exact V3 decode shapes (B=1, dim 7168, H=128 absorbed
MLA r=512 + rope 64, q_lora 1536, S=4096 window, Q3_K nibble weights).

Suspected hot spot: the per-head wv_b up-projection runs qmm_experts with
idx = head index — a 128-step grid whose ~2.5 us/step fixed pair cost
would alone be ~320 us at H=128 (it was sized for 16-head V2-Lite).

Usage: python scripts/bench_attn_micro.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp

from bench_ops import bench

from deepseek_tpu.models import init_cache
from deepseek_tpu.models.deepseek import _attention, decode_positions
from deepseek_tpu.models.testing import (
    deepseek_v3_proportions, random_fused_params,
)
from deepseek_tpu.ops.matmul import kernel_impl, qmatmul, reshape_rows
from deepseek_tpu.ops.pallas.attention import mla_decode_attn
from deepseek_tpu.ops.pallas.qmm import qmm_experts
from deepseek_tpu.ops.rope import apply_rope
from deepseek_tpu.parallel.spmd import NULL_CTX


def main():
    cfg = deepseek_v3_proportions(n_layers=1, first_k_dense_replace=0)
    impl = kernel_impl(cfg, prefill=False)
    print(f"backend={jax.default_backend()} impl={impl}")
    params = random_fused_params(cfg, "q3_k_nibble")
    jax.block_until_ready(jax.tree.leaves(params))
    lp = params.layers[0]
    dim, H = cfg.dim, cfg.n_heads
    R, P, Dv = cfg.kv_lora_rank, cfg.qk_rope_head_dim, cfg.v_head_dim
    S = cfg.kv_window

    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (1, 1, dim), jnp.float32) * 0.1
    cache = init_cache(cfg, batch=1)
    nib = 0.625  # bytes/weight, Q3_K nibble

    # --- full attention block (decode, absorbed MLA) ---------------------
    pos_vec, cache_start, kv_len, kv_sink = decode_positions(
        cfg, 1, jnp.int32(S - 2))

    def full(x, lp, ckv, krope, sink):
        from deepseek_tpu.models.kvcache import KVCache
        c = KVCache(k=None, v=None, ckv=ckv, krope=krope, sink_krope=sink)
        attn, _ = _attention(lp, cfg, x, c, 0, pos_vec, cache_start,
                             kv_len, kv_sink, False, impl, NULL_CTX)
        return attn
    t_full = bench("attention block full (decode)", full, xb, 0,
                   consts=(lp, cache.ckv, cache.krope, cache.sink_krope))

    # --- projections ------------------------------------------------------
    t_kvq = bench("wkvq matvec (2112 x 7168)",
                  lambda x, w: qmatmul(w, x, impl=impl), xb,
                  (R + P + cfg.q_lora_rank) * dim * nib, consts=(lp.wkvq,))

    qa = jax.random.normal(key, (1, 1, cfg.q_lora_rank), jnp.float32) * 0.1
    t_cr = bench("wcr matvec (73728 x 1536)",
                 lambda x, w: qmatmul(w, x, impl=impl), qa,
                 H * (P + R) * cfg.q_lora_rank * nib, consts=(lp.wcr,))

    vrow = jax.random.normal(key, (1, 1, H * Dv), jnp.float32) * 0.1
    t_wo = bench("wo matvec (7168 x 16384)",
                 lambda x, w: qmatmul(w, x, impl=impl), vrow,
                 dim * H * Dv * nib, consts=(lp.wo,))

    # --- per-head wv_b up-projection (the H=128-grid suspect) ------------
    lat = jax.random.normal(key, (1, H, R), jnp.float32) * 0.1
    wv3 = reshape_rows(lp.wv_b, H)
    hidx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (1, H))

    def wvb_kernel(x, wv3, hidx):
        l = x + 0.0
        return qmm_experts(wv3, hidx, l, interpret=impl["interpret"])
    t_wvb = bench("wv_b per-head qmm_experts (H=128 grid)", wvb_kernel, lat,
                  H * Dv * R * nib, consts=(wv3, hidx))

    def wvb_dense(x, wvb):
        w = wvb.dequant(jnp.float32).reshape(H, Dv, R)
        return jnp.einsum("bhr,hvr->bhv", x, w,
                          preferred_element_type=jnp.float32)
    t_wvbd = bench("wv_b XLA dequant+batched einsum", wvb_dense, lat,
                   H * Dv * R * nib, consts=(lp.wv_b,))

    wvb_bf = lp.wv_b.dequant(jnp.bfloat16).reshape(H, Dv, R)
    def wvb_plain(x, w):
        return jnp.einsum("bhr,hvr->bhv", x.astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
    t_wvbp = bench("wv_b bf16-resident batched einsum", wvb_plain, lat,
                   H * Dv * R * 2, consts=(wvb_bf,))

    # --- decode attention kernel ------------------------------------------
    qc = jax.random.normal(key, (1, H, R), jnp.float32) * 0.1
    qr = jax.random.normal(key, (1, H, P), jnp.float32) * 0.1
    sm = float(cfg.attn_softmax_scale())

    def attnk(x, qr, ckv, krope, kvl):
        return mla_decode_attn(x, qr, ckv[0], krope[0], kvl, sm,
                               interpret=impl["interpret"])
    t_attnk = bench("mla_decode_attn kernel (S=4096, H=128)", attnk, qc,
                    cache.ckv[0].nbytes + cache.krope[0].nbytes,
                    consts=(qr, cache.ckv, cache.krope, kv_len))

    # --- cache writes + sink rotation (scatter ops) ------------------------
    kr = jax.random.normal(key, (1, 1, P), jnp.float32)
    cv = jax.random.normal(key, (1, 1, R), jnp.float32)

    def cache_write(x, ckv, krope):
        ckv2 = jax.lax.dynamic_update_slice(
            ckv, (cv + x[..., :1]).astype(ckv.dtype)[None], (0, 0, 77, 0))
        krope2 = jax.lax.dynamic_update_slice(
            krope, kr.astype(krope.dtype)[None], (0, 0, 77, 0))
        rot = apply_rope(krope2[0, :, :3].astype(jnp.float32), 1,
                         cfg.rope_theta, True, None)
        krope2 = krope2.at[0, :, :3].set(rot.astype(krope.dtype))
        return jnp.sum(ckv2[0, 0, 77]) + jnp.sum(krope2[0, 0, 77])
    t_cw = bench("cache writes + sink re-rotation", cache_write, xb,
                 0, consts=(cache.ckv, cache.krope))

    acc = (t_kvq + t_cr + t_wo + t_wvb + t_attnk + t_cw)
    print()
    print(f"full attention     {t_full*1e6:8.1f} us")
    print(f"  wkvq             {t_kvq*1e6:8.1f} us")
    print(f"  wcr              {t_cr*1e6:8.1f} us")
    print(f"  wo               {t_wo*1e6:8.1f} us")
    print(f"  wv_b kernel      {t_wvb*1e6:8.1f} us  "
          f"(XLA dequant {t_wvbd*1e6:.1f}, bf16 einsum {t_wvbp*1e6:.1f})")
    print(f"  attn kernel      {t_attnk*1e6:8.1f} us")
    print(f"  cache writes     {t_cw*1e6:8.1f} us")
    print(f"  sum / unaccounted {acc*1e6:7.1f} / {(t_full-acc)*1e6:.1f} us")


if __name__ == "__main__":
    main()
