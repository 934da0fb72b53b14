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
