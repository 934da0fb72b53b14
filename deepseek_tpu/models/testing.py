"""Random-parameter model builders (benchmarks, compile checks, dry runs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models.params import LayerParams, ModelParams
from deepseek_tpu.quant.qtensor import PlainTensor


def random_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16,
                  scale: float = 0.02) -> ModelParams:
    """Random weights with the exact pytree structure the loader produces."""
    key = jax.random.PRNGKey(seed)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(*shape):
        return PlainTensor(data=(jax.random.normal(nxt(), shape, jnp.float32)
                                 * scale).astype(dtype))

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    c = cfg
    H, hd, nope, P, Dv, R = (c.n_heads, c.head_dim, c.qk_nope_head_dim,
                             c.qk_rope_head_dim, c.v_head_dim, c.kv_lora_rank)

    def mla_weights():
        """Hybrid MLA weights with a CONSISTENT factorization: random
        wq_b/wkv_b, and wc/wq_rope_b/wv_b DERIVED from them exactly like
        the converter's offline absorption (convert.py c_proj math) — the
        decompressed prefill path and the absorbed decode path must compute
        the same function, or prefill==decode parity (and speculative
        acceptance) silently breaks on random checkpoints."""
        wq_b = w(H * hd, c.q_lora_rank)
        wkv_b = w(H * (nope + Dv), R)
        qb = wq_b.data.astype(jnp.float32).reshape(H, hd, c.q_lora_rank)
        kvb = wkv_b.data.astype(jnp.float32).reshape(H, nope + Dv, R)
        q_nope_b, q_rope_b = qb[:, :nope], qb[:, nope:]
        k_nope_b, v_b = kvb[:, :nope], kvb[:, nope:]
        c_proj = jnp.einsum("hnr,hnq->hrq", k_nope_b, q_nope_b)
        mk = lambda a: PlainTensor(data=a.astype(dtype))
        return (wq_b, wkv_b,
                mk(c_proj.reshape(H * R, c.q_lora_rank)),
                mk(q_rope_b.reshape(H * P, c.q_lora_rank)),
                mk(v_b.reshape(H * Dv, R)))

    layers = []
    for l in range(c.n_layers):
        moe = c.is_moe_layer(l)
        E, m = c.n_routed_experts, c.moe_intermediate_size
        if c.use_mla:
            wq_b, wkv_b, wc, wq_rope_b, wv_b = mla_weights()
        else:
            wq_b = w(H * hd, c.q_lora_rank) if c.q_lora_rank > 0 else None
            wkv_b = w(H * (nope + Dv), R)
            wc = wq_rope_b = wv_b = None
        layers.append(LayerParams(
            attn_norm=ones(c.dim), ffn_norm=ones(c.dim),
            kv_a_norm=ones(R),
            q_a_norm=ones(c.q_lora_rank) if c.q_lora_rank > 0 else None,
            wkv_a=w(R + P, c.dim),
            wo=w(c.dim, H * Dv),
            wq=None if c.q_lora_rank > 0 else (None if c.use_mla else w(H * hd, c.dim)),
            wq_a=w(c.q_lora_rank, c.dim) if c.q_lora_rank > 0 else None,
            # MLA checkpoints keep the decompressed projections too
            # (hybrid prefill path, see convert.py / models/deepseek.py)
            wq_b=wq_b,
            wkv_b=wkv_b,
            wc=wc,
            wq_rope_b=wq_rope_b,
            wv_b=wv_b,
            w1=w(E, m, c.dim) if moe else w(c.hidden_dim, c.dim),
            w2=w(E, c.dim, m) if moe else w(c.dim, c.hidden_dim),
            w3=w(E, m, c.dim) if moe else w(c.hidden_dim, c.dim),
            shared_w1=w(c.n_shared_experts * m, c.dim) if (moe and c.n_shared_experts) else None,
            shared_w2=w(c.dim, c.n_shared_experts * m) if (moe and c.n_shared_experts) else None,
            shared_w3=w(c.n_shared_experts * m, c.dim) if (moe and c.n_shared_experts) else None,
            moegate=(jax.random.normal(nxt(), (E, c.dim), jnp.float32) * scale) if moe else None,
            moegate_bias=(jnp.zeros((E,), jnp.float32)
                          if (moe and c.has_moegate_bias) else None),
        ))
    return ModelParams(
        embed=w(c.vocab_size, c.dim),
        layers=layers,
        final_norm=ones(c.dim),
        lm_head=w(c.vocab_size, c.dim),
    )


def _random_qtensor(key_gen, shape, quant: str):
    """Random *packed* quantized tensor synthesized directly on device.

    Throughput doesn't depend on weight values, and generating the packed
    planes on-chip avoids both the CPU K-quant encode (~0.3s per expert
    matrix) and gigabytes of host->device transfers — the real loader path
    is exercised by tests/test_kquant.py golden tests instead.
    """
    from deepseek_tpu.quant.qtensor import (
        Fp8Tensor, Q2KTensor, Q3KTensor, q2k_to_nibble, q2k_to_turbo,
        q3k_to_nibble, q3k_to_turbo,
    )
    rows, cols = shape[-2], shape[-1]
    lead = shape[:-2]
    turbo = quant.endswith("_turbo")
    nibble = quant.endswith("_nibble")
    quant = quant[:-7] if nibble else quant[:-6] if turbo else quant
    if quant in ("q2_k", "q3_k") and cols % 256 == 0:
        qs = jax.random.randint(key_gen(), (*lead, rows, cols // 4), 0, 256,
                                jnp.int32).astype(jnp.uint8)
        d = jax.random.uniform(key_gen(), (*lead, rows, cols // 256),
                               jnp.float32, 0.001, 0.01)
        if quant == "q2_k":
            sm = jax.random.randint(key_gen(), (*lead, rows, cols // 16), 0,
                                    256, jnp.int32).astype(jnp.uint8)
            dmin = jax.random.uniform(key_gen(), d.shape, jnp.float32,
                                      0.001, 0.01)
            qt = Q2KTensor(qs=qs, sm=sm, d=d, dmin=dmin)
            return (q2k_to_turbo(qt) if turbo
                    else q2k_to_nibble(qt) if nibble else qt)
        hm = jax.random.randint(key_gen(), (*lead, rows, cols // 8), 0, 256,
                                jnp.int32).astype(jnp.uint8)
        sc = jax.random.randint(key_gen(), (*lead, rows, cols // 16), -32, 32,
                                jnp.int32).astype(jnp.int8)
        qt = Q3KTensor(qs=qs, hm=hm, sc=sc, d=d)
        return (q3k_to_turbo(qt) if turbo
                else q3k_to_nibble(qt) if nibble else qt)
    if quant == "f8e5m2" and rows % 128 == 0 and cols % 128 == 0:
        data = (jax.random.normal(key_gen(), (*lead, rows, cols),
                                  jnp.bfloat16)).astype(jnp.float8_e5m2)
        scale = jax.random.uniform(
            key_gen(), (*lead, rows // 128, cols // 128), jnp.float32,
            0.005, 0.02)
        return Fp8Tensor(data=data, scale=scale, block_size=(128, 128))
    # fallback (odd dims): bf16
    return PlainTensor(
        data=jax.random.normal(key_gen(), shape, jnp.bfloat16) * 0.02)


def random_quantized_params(cfg: ModelConfig, quant: str,
                            seed: int = 1234) -> ModelParams:
    """Random packed-plane quantized model for throughput benchmarks
    (absorbed-MLA layout; bench.py / scripts/bench_quant.py).

    ``quant``: q2_k | q3_k | f8e5m2 | q2_k_turbo | q3_k_turbo |
    q2_k_nibble | q3_k_nibble.
    """
    key = [jax.random.PRNGKey(seed)]

    def nxt():
        key[0], sub = jax.random.split(key[0])
        return sub

    def w(*shape):
        return jax.random.normal(nxt(), shape, jnp.float32) * 0.02

    def qt(*shape):
        return _random_qtensor(nxt, shape, quant)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    c = cfg
    H, P, Dv, R = (c.n_heads, c.qk_rope_head_dim, c.v_head_dim,
                   c.kv_lora_rank)
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
