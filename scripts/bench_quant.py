"""Quantized decode benchmark: Q2_K / Q3_K / FP8 variants of the bench model
on the attached chip (the BASELINE headline is DeepSeek-V3 Q2_K decode).

Synthesizes random packed quantized weights on device (values don't affect
throughput; encode/decode correctness is covered by the golden tests) and
measures the fused-kernel decode loop. Usage:

    python scripts/bench_quant.py [q2_k|q3_k|f8e5m2|q2_k_turbo|q3_k_turbo] [layers]

The *_turbo modes run the pre-scaled int8-plane runtime layout
(quant.qtensor.Q2KTurboTensor): ~3x fewer dequant VPU ops per weight.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_config
from deepseek_tpu.models import init_cache
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.models.loader import params_active_bytes
from deepseek_tpu.models.params import LayerParams, ModelParams
from deepseek_tpu.quant.qtensor import (
    Fp8Tensor, PlainTensor, Q2KTensor, Q3KTensor, q2k_to_turbo, q3k_to_turbo,
)


_KEY = [jax.random.PRNGKey(1234)]


def _k():
    _KEY[0], sub = jax.random.split(_KEY[0])
    return sub


def _quantize(shape, quant: str):
    """Random *packed* quantized tensor synthesized directly on device.

    Throughput doesn't depend on weight values, and generating the packed
    planes on-chip avoids both the CPU K-quant encode (~0.3s per expert
    matrix) and gigabytes of host->device transfers — the real loader path
    is exercised by tests/test_kquant.py golden tests instead.
    """
    rows, cols = shape[-2], shape[-1]
    lead = shape[:-2]
    turbo = quant.endswith("_turbo")
    quant = quant[:-6] if turbo else quant
    if quant in ("q2_k", "q3_k") and cols % 256 == 0:
        qs = jax.random.randint(_k(), (*lead, rows, cols // 4), 0, 256, jnp.int32
                                ).astype(jnp.uint8)
        d = jax.random.uniform(_k(), (*lead, rows, cols // 256), jnp.float32,
                               0.001, 0.01)
        if quant == "q2_k":
            sm = jax.random.randint(_k(), (*lead, rows, cols // 16), 0, 256,
                                    jnp.int32).astype(jnp.uint8)
            dmin = jax.random.uniform(_k(), d.shape, jnp.float32, 0.001, 0.01)
            qt = Q2KTensor(qs=qs, sm=sm, d=d, dmin=dmin)
            return q2k_to_turbo(qt) if turbo else qt
        hm = jax.random.randint(_k(), (*lead, rows, cols // 8), 0, 256,
                                jnp.int32).astype(jnp.uint8)
        sc = jax.random.randint(_k(), (*lead, rows, cols // 16), -32, 32,
                                jnp.int32).astype(jnp.int8)
        qt = Q3KTensor(qs=qs, hm=hm, sc=sc, d=d)
        return q3k_to_turbo(qt) if turbo else qt
    if quant == "f8e5m2" and rows % 128 == 0 and cols % 128 == 0:
        data = (jax.random.normal(_k(), (*lead, rows, cols), jnp.bfloat16)
                ).astype(jnp.float8_e5m2)
        scale = jax.random.uniform(
            _k(), (*lead, rows // 128, cols // 128), jnp.float32, 0.005, 0.02)
        return Fp8Tensor(data=data, scale=scale, block_size=(128, 128))
    # fallback (odd dims): bf16
    return PlainTensor(
        data=jax.random.normal(_k(), shape, jnp.bfloat16) * 0.02)


def quantized_params(cfg, quant: str, seed=0) -> ModelParams:
    def w(*shape):
        return jax.random.normal(_k(), shape, jnp.float32) * 0.02

    def qt(*shape):
        return _quantize(shape, quant)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    c = cfg
    H, hd, nope, P, Dv, R = (c.n_heads, c.head_dim, c.qk_nope_head_dim,
                             c.qk_rope_head_dim, c.v_head_dim, c.kv_lora_rank)
    layers = []
    for l in range(c.n_layers):
        moe = c.is_moe_layer(l)
        E, m = c.n_routed_experts, c.moe_intermediate_size
        layers.append(LayerParams(
            attn_norm=ones(c.dim), ffn_norm=ones(c.dim), kv_a_norm=ones(R),
            q_a_norm=ones(c.q_lora_rank),
            wkv_a=qt(R + P, c.dim), wo=qt(c.dim, H * Dv),
            wq=None, wq_a=qt(c.q_lora_rank, c.dim), wq_b=None, wkv_b=None,
            wc=qt(H * R, c.q_lora_rank), wq_rope_b=qt(H * P, c.q_lora_rank),
            wv_b=qt(H * Dv, R),
            w1=qt(E, m, c.dim) if moe else qt(c.hidden_dim, c.dim),
            w2=qt(E, c.dim, m) if moe else qt(c.dim, c.hidden_dim),
            w3=qt(E, m, c.dim) if moe else qt(c.hidden_dim, c.dim),
            shared_w1=qt(c.n_shared_experts * m, c.dim) if moe else None,
            shared_w2=qt(c.dim, c.n_shared_experts * m) if moe else None,
            shared_w3=qt(c.n_shared_experts * m, c.dim) if moe else None,
            moegate=w(E, c.dim) if moe else None,
            moegate_bias=None,
        ))
    return ModelParams(
        embed=PlainTensor(data=w(c.vocab_size, c.dim).astype(jnp.bfloat16)),
        layers=layers, final_norm=ones(c.dim),
        lm_head=qt(c.vocab_size, c.dim))


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "q2_k"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    backend = jax.default_backend()
    cfg = bench_config(layers)
    # moe_intermediate 1408 is not 256-divisible; use 1536 for K-quant rows
    import dataclasses
    if quant.startswith(("q2_k", "q3_k")):
        cfg = dataclasses.replace(cfg, moe_intermediate_size=1536)

    t0 = time.perf_counter()
    params = quantized_params(cfg, quant)
    from deepseek_tpu.models.loader import fuse_projections
    params = fuse_projections(params, cfg, consume=True)
    jax.block_until_ready(jax.tree.leaves(params))
    print(f"quantize+load: {time.perf_counter()-t0:.1f}s")

    cache = init_cache(cfg, batch=1)
    block = 32 if backend != "cpu" else 4
    loop = make_decode_loop(cfg, block)
    key = jax.random.PRNGKey(0)
    args = (jnp.float32(0.0), jnp.float32(1.0))

    tok = jnp.zeros((1, 1), jnp.int32)
    for wu in range(2):  # 2x: first post-compile dispatch is ~3x slow
        toks, _, cache = loop(params, cache, tok, jnp.int32(wu * block),
                              key, *args)
        tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])

    n_blocks = 8 if backend != "cpu" else 1
    t0 = time.perf_counter()
    for i in range(n_blocks):
        toks, _, cache = loop(params, cache, tok,
                              jnp.int32(block * (i + 2)), key, *args)
        tok = toks[:, -1:]
    _ = int(np.asarray(tok)[0, 0])
    dt = time.perf_counter() - t0
    n = n_blocks * block
    tok_s = n / dt
    gb = params_active_bytes(params, cfg, n) / 1e9
    print(f"{quant} L{layers} decode: {tok_s:.1f} tok/s  "
          f"({gb:.2f} GB active/token -> {gb*tok_s:.0f} GB/s)")


if __name__ == "__main__":
    main()
