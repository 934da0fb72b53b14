"""Tiny random checkpoints (reference tensor layout) for model tests."""

from __future__ import annotations

import numpy as np

from deepseek_tpu.config import (
    ActivationType, ModelConfig, QuantKind, ScoringFunc, TopKMethod,
)
from deepseek_tpu.utils.codec import pack_tokenizer_tokens


def tiny_config(use_mla=False, q_lora=12, quant=QuantKind.F32, **overrides) -> ModelConfig:
    base = dict(
        dim=32, hidden_dim=48, n_layers=3, n_heads=2, vocab_size=64,
        max_seq_len=32, rope_theta=10000.0, norm_eps=1e-6,
        act=ActivationType.SILU, first_k_dense_replace=1,
        n_shared_experts=1, n_routed_experts=4, n_active_routed=2,
        moe_intermediate_size=24, routed_scaling_factor=1.0, n_group=2,
        norm_topk_prob=False, scoring_func=ScoringFunc.SOFTMAX, topk_group=1,
        topk_method=TopKMethod.GREEDY, has_moegate_bias=False,
        use_mla=use_mla, kv_lora_rank=16, q_lora_rank=q_lora,
        qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
        weight_quant=quant,
        rs_original_max_position_embeddings=16,
    )
    base.update(overrides)
    return ModelConfig(**base)


def tiny_weights(cfg: ModelConfig, seed=0, scale=0.25) -> dict:
    """Random f32 weights in the checkpoint tensor layout (convert.py names)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ones(*shape):
        return (1.0 + 0.1 * rng.standard_normal(shape)).astype(np.float32)

    c = cfg
    H, hd, nope, P, Dv, R = (c.n_heads, c.head_dim, c.qk_nope_head_dim,
                             c.qk_rope_head_dim, c.v_head_dim, c.kv_lora_rank)
    wd = {"model.embed.weight": w(c.vocab_size, c.dim),
          "model.norm.weight": ones(c.dim),
          "model.output.weight": w(c.vocab_size, c.dim)}
    for l in range(c.n_layers):
        p = f"model.layers.{l}"
        wd[f"{p}.attn.norm.weight"] = ones(c.dim)
        wd[f"{p}.mlp.norm.weight"] = ones(c.dim)
        wd[f"{p}.attn.kv_a_norm.weight"] = ones(R)
        wd[f"{p}.attn.wkv_a.weight"] = w(R + P, c.dim)
        wd[f"{p}.attn.wo.weight"] = w(c.dim, H * Dv)
        if c.use_mla:
            assert c.q_lora_rank > 0
            wd[f"{p}.attn.q_a_norm.weight"] = ones(c.q_lora_rank)
            wd[f"{p}.attn.wq_a.weight"] = w(c.q_lora_rank, c.dim)
            wd[f"{p}.attn.wq_rope_b.weight"] = w(H * P, c.q_lora_rank)
            wd[f"{p}.attn.wc.weight"] = w(H * R, c.q_lora_rank)
            wd[f"{p}.attn.wv_b.weight"] = w(H * Dv, R)
        else:
            wd[f"{p}.attn.wkv_b.weight"] = w(H * (nope + Dv), R)
            if c.q_lora_rank > 0:
                wd[f"{p}.attn.q_a_norm.weight"] = ones(c.q_lora_rank)
                wd[f"{p}.attn.wq_a.weight"] = w(c.q_lora_rank, c.dim)
                wd[f"{p}.attn.wq_b.weight"] = w(H * hd, c.q_lora_rank)
            else:
                wd[f"{p}.attn.wq.weight"] = w(H * hd, c.dim)
        if cfg.is_moe_layer(l):
            E, m = c.n_routed_experts, c.moe_intermediate_size
            wd[f"{p}.moegate.weight"] = w(E, c.dim)
            if c.has_moegate_bias:
                wd[f"{p}.moegate.bias"] = w(E)
            wd[f"{p}.mlp.w1.weight"] = w(E, m, c.dim)
            wd[f"{p}.mlp.w2.weight"] = w(E, c.dim, m)
            wd[f"{p}.mlp.w3.weight"] = w(E, m, c.dim)
            if c.n_shared_experts > 0:
                sm = c.n_shared_experts * m
                wd[f"{p}.shared_mlp.w1.weight"] = w(sm, c.dim)
                wd[f"{p}.shared_mlp.w2.weight"] = w(c.dim, sm)
                wd[f"{p}.shared_mlp.w3.weight"] = w(sm, c.dim)
        else:
            wd[f"{p}.mlp.w1.weight"] = w(c.hidden_dim, c.dim)
            wd[f"{p}.mlp.w2.weight"] = w(c.dim, c.hidden_dim)
            wd[f"{p}.mlp.w3.weight"] = w(c.hidden_dim, c.dim)
    return wd


def tiny_vocab(vocab_size=64):
    vocab = [b"<unk>", b"<s>", b"</s>"]
    vocab += [f"<0x{i:02X}>".encode() for i in range(min(256, vocab_size - 3))]
    while len(vocab) < vocab_size:
        vocab.append(f"tok{len(vocab)}".encode())
    return vocab[:vocab_size]


def tiny_checkpoint_tensors(cfg: ModelConfig, wd: dict) -> dict:
    """Full tensor dict for codec.save_checkpoint (adds tokenizer)."""
    tensors = dict(wd)
    tensors["tokenizer.tokens"] = pack_tokenizer_tokens(tiny_vocab(cfg.vocab_size))
    return tensors


def tiny_metadata(cfg: ModelConfig) -> dict:
    md = cfg.to_metadata()
    md["bos_token_id"] = "1"
    md["eos_token_id"] = "2"
    return md
