"""Fake HuggingFace checkpoint builder for converter tests."""

from __future__ import annotations

import json
import os

import numpy as np

from deepseek_tpu.utils import codec


def hf_config(dim=32, hidden=48, layers=3, heads=2, vocab=300, q_lora=12,
              kv_lora=16, nope=8, rope=4, v_dim=8, first_dense=1,
              n_experts=4, n_active=2, moe_inter=24, n_shared=1,
              arch="DeepseekV2ForCausalLM", topk_method="greedy",
              scoring="softmax", tie=False):
    return {
        "architectures": [arch],
        "hidden_size": dim, "intermediate_size": hidden,
        "num_hidden_layers": layers, "num_attention_heads": heads,
        "vocab_size": vocab, "bos_token_id": 1, "eos_token_id": 2,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6, "hidden_act": "silu",
        "first_k_dense_replace": first_dense,
        "kv_lora_rank": kv_lora, "q_lora_rank": q_lora or None,
        "qk_nope_head_dim": nope, "qk_rope_head_dim": rope, "v_head_dim": v_dim,
        "n_shared_experts": n_shared, "n_routed_experts": n_experts,
        "num_experts_per_tok": n_active, "moe_intermediate_size": moe_inter,
        "routed_scaling_factor": 1.0, "n_group": 2, "norm_topk_prob": False,
        "scoring_func": scoring, "topk_group": 1, "topk_method": topk_method,
        "tie_word_embeddings": tie,
        "rope_scaling": {
            "type": "yarn", "beta_fast": 32, "beta_slow": 1, "factor": 40,
            "mscale": 0.707, "mscale_all_dim": 0.707,
            "original_max_position_embeddings": 24,
        },
    }


def hf_weights(cfg: dict, seed=0, scale=0.25, mtp=False) -> dict:
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ones(*shape):
        return (1.0 + 0.1 * rng.standard_normal(shape)).astype(np.float32)

    dim = cfg["hidden_size"]
    H = cfg["num_attention_heads"]
    nope, rope, v_dim = (cfg["qk_nope_head_dim"], cfg["qk_rope_head_dim"],
                         cfg["v_head_dim"])
    q_lora = cfg["q_lora_rank"] or 0
    kv_lora = cfg["kv_lora_rank"]
    wd = {
        "model.embed_tokens.weight": w(cfg["vocab_size"], dim),
        "model.norm.weight": ones(dim),
    }
    if not cfg.get("tie_word_embeddings"):
        wd["lm_head.weight"] = w(cfg["vocab_size"], dim)
    n_block_layers = cfg["num_hidden_layers"] + (1 if mtp else 0)
    for l in range(n_block_layers):
        p = f"model.layers.{l}"
        if mtp and l == cfg["num_hidden_layers"]:
            # DeepSeek-V3 MTP module at the extra layer index
            wd[f"{p}.enorm.weight"] = ones(dim)
            wd[f"{p}.hnorm.weight"] = ones(dim)
            wd[f"{p}.eh_proj.weight"] = w(dim, 2 * dim)
            wd[f"{p}.shared_head.norm.weight"] = ones(dim)
        wd[f"{p}.input_layernorm.weight"] = ones(dim)
        wd[f"{p}.post_attention_layernorm.weight"] = ones(dim)
        wd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = w(kv_lora + rope, dim)
        wd[f"{p}.self_attn.kv_a_layernorm.weight"] = ones(kv_lora)
        wd[f"{p}.self_attn.kv_b_proj.weight"] = w(H * (nope + v_dim), kv_lora)
        wd[f"{p}.self_attn.o_proj.weight"] = w(dim, H * v_dim)
        if q_lora > 0:
            wd[f"{p}.self_attn.q_a_proj.weight"] = w(q_lora, dim)
            wd[f"{p}.self_attn.q_a_layernorm.weight"] = ones(q_lora)
            wd[f"{p}.self_attn.q_b_proj.weight"] = w(H * (nope + rope), q_lora)
        else:
            wd[f"{p}.self_attn.q_proj.weight"] = w(H * (nope + rope), dim)
        if l < cfg["first_k_dense_replace"]:
            wd[f"{p}.mlp.gate_proj.weight"] = w(cfg["intermediate_size"], dim)
            wd[f"{p}.mlp.down_proj.weight"] = w(dim, cfg["intermediate_size"])
            wd[f"{p}.mlp.up_proj.weight"] = w(cfg["intermediate_size"], dim)
        else:
            E, m = cfg["n_routed_experts"], cfg["moe_intermediate_size"]
            wd[f"{p}.mlp.gate.weight"] = w(E, dim)
            if cfg["architectures"][0] == "DeepseekV3ForCausalLM":
                wd[f"{p}.mlp.gate.e_score_correction_bias"] = w(E)
            for e in range(E):
                wd[f"{p}.mlp.experts.{e}.gate_proj.weight"] = w(m, dim)
                wd[f"{p}.mlp.experts.{e}.down_proj.weight"] = w(dim, m)
                wd[f"{p}.mlp.experts.{e}.up_proj.weight"] = w(m, dim)
            sm = cfg["n_shared_experts"] * m
            wd[f"{p}.mlp.shared_experts.gate_proj.weight"] = w(sm, dim)
            wd[f"{p}.mlp.shared_experts.down_proj.weight"] = w(dim, sm)
            wd[f"{p}.mlp.shared_experts.up_proj.weight"] = w(sm, dim)
    return wd


def hf_tokenizer_json(vocab_size=300):
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(256):
        vocab[f"<0x{i:02X}>"] = 3 + i
    i = 259
    for piece in ["▁hello", "▁world", "he", "ll", "o"]:
        if i < vocab_size:
            vocab[piece] = i
            i += 1
    while i < vocab_size:
        vocab[f"tok{i}"] = i
        i += 1
    return {"model": {"vocab": vocab, "byte_fallback": True}, "added_tokens": []}


def write_hf_dir(path: str, cfg: dict, wd: dict, vocab_size=None,
                 n_files: int = 1, tokenizer_config: dict = None):
    """``n_files > 1`` splits the weights across several .safetensors
    files (HF multi-shard layout) — exercises the converter's multi-shard
    memmap path. ``tokenizer_config`` adds extra tokenizer_config.json
    keys (e.g. chat_template)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"model_max_length": 128, **(tokenizer_config or {})}, f)
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(hf_tokenizer_json(vocab_size or cfg["vocab_size"]), f)
    if n_files <= 1:
        codec.save_shard(os.path.join(path, "model.safetensors"), wd)
        return
    names = list(wd)
    per = -(-len(names) // n_files)
    for i in range(n_files):
        part = {k: wd[k] for k in names[i * per:(i + 1) * per]}
        if part:
            codec.save_shard(
                os.path.join(path, f"model-{i:05d}.safetensors"), part)
