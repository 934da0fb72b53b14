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
    layers = []
    for l in range(c.n_layers):
        moe = c.is_moe_layer(l)
        E, m = c.n_routed_experts, c.moe_intermediate_size
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
            wq_b=w(H * hd, c.q_lora_rank) if c.q_lora_rank > 0 else None,
            wkv_b=w(H * (nope + Dv), R),
            wc=w(H * R, c.q_lora_rank) if c.use_mla else None,
            wq_rope_b=w(H * P, c.q_lora_rank) if c.use_mla else None,
            wv_b=w(H * Dv, R) if c.use_mla else None,
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
