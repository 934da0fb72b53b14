"""DeepSeek-V3 multi-token-prediction module forward.

The V3 checkpoint ships one extra transformer layer (HF index
num_hidden_layers) that predicts token t+2 from the main model's final
hidden state at position t and the embedding of token t+1:

    h' = eh_proj([RMSNorm_e(embed(tok_{t+1})); RMSNorm_h(h_t)])
    h_mtp = TransformerBlock(h')          (own 1-layer KV cache)
    logits_{t+2} = lm_head(RMSNorm(h_mtp))   (head shared with the main model)

The reference drops these weights entirely; here they power LOSSLESS
self-speculative decoding (engine.generate_mtp): the MTP drafts are always
verified by the main model, so draft quality affects speed only, never the
output distribution. MTP cache entries are keyed by position like the main
ring cache and self-heal the same way (a slot is rewritten whenever its
position is re-fed).

Sharding intent: the MTP drafter is a single-host engine hook and always
runs with NULL_CTX (replicated, no collectives) — one extra layer of
drafting compute is not worth sharding. parallel.sharding still writes
replicated placement specs for its weights so GSPMD placement of the full
param pytree stays well-defined on a mesh.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models.deepseek import _attention, _ffn
from deepseek_tpu.models.kvcache import init_cache, ring_positions
from deepseek_tpu.models.params import ModelParams, embed_lookup
from deepseek_tpu.ops import rmsnorm
from deepseek_tpu.ops.matmul import kernel_impl, qmatmul


def init_mtp_cache(cfg: ModelConfig, batch: int = 1):
    """One-layer KV cache for the MTP block (same window/ring semantics)."""
    return init_cache(dataclasses.replace(cfg, n_layers=1), batch=batch)


def _mtp_impl(params: ModelParams, cache, tokens, h, pos0,
              cfg: ModelConfig, prefill: bool):
    """tokens (B,T) = the NEXT tokens; h (B,T,dim) = main hidden states at
    the base positions. Returns (logits, h_mtp, cache)."""
    from deepseek_tpu.parallel.spmd import NULL_CTX

    mp = params.mtp
    assert mp is not None, "checkpoint has no MTP module"
    B, T = tokens.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    impl = kernel_impl(cfg, prefill=prefill)

    e = rmsnorm(embed_lookup(params.embed, tokens, jnp.float32).astype(dtype),
                mp.enorm, cfg.norm_eps)
    hh = rmsnorm(h.astype(dtype), mp.hnorm, cfg.norm_eps)
    x = qmatmul(mp.eh_proj, jnp.concatenate([e, hh], axis=-1),
                impl=impl).astype(dtype)

    pos0 = jnp.asarray(pos0, jnp.int32)
    if prefill and pos0.ndim == 1:
        # VERIFY MODE (mirrors _forward_impl): per-row chunk starts — the
        # batched MTP re-hydration writes each slot's (token, hidden)
        # pairs at its own position (speculative.make_batched_mtp_spec_
        # rounds). Caller guards pos0 + T <= kv_window per row.
        pos_vec = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)   # (B, T)
        cache_start, kv_len, kv_sink = pos0, None, None
    elif prefill:
        pos_vec = pos0 + jnp.arange(T, dtype=jnp.int32)
        cache_start, kv_len, kv_sink = pos0, None, None
    else:
        assert T == 1
        pos_b = jnp.broadcast_to(pos0.reshape(-1), (B,))
        kv_sink, kv_pos, kv_len = ring_positions(cfg, pos_b)
        pos_vec = pos_b[:, None]
        cache_start = kv_pos

    lp = mp.block
    xb = rmsnorm(x, lp.attn_norm, cfg.norm_eps)
    attn, cache = _attention(lp, cfg, xb, cache, 0, pos_vec, cache_start,
                             kv_len, kv_sink, prefill, impl, NULL_CTX)
    x = x + attn
    xb = rmsnorm(x, lp.ffn_norm, cfg.norm_eps)
    # the block's FFN form follows its own weights (V3's MTP layer is MoE)
    layer_kind = cfg.first_k_dense_replace if lp.moegate is not None else 0
    x = x + _ffn(lp, cfg, xb, layer_kind, prefill, impl, NULL_CTX)[0]

    logits = qmatmul(params.lm_head,
                     rmsnorm(x, mp.final_norm, cfg.norm_eps)
                     .astype(jnp.float32), impl=impl)
    return logits, x, cache


def make_mtp_forward(cfg: ModelConfig, *, prefill: bool = False,
                     jit: bool = True):
    """fn(params, mtp_cache, tokens (B,T), h (B,T,dim), pos0)
    -> (logits (B,T,V), h_mtp (B,T,dim), cache), cache donated."""
    fn = functools.partial(_mtp_impl, cfg=cfg, prefill=prefill)
    if jit:
        fn = jax.jit(fn, donate_argnums=(1,))
    return fn
