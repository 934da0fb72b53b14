"""Attention kernels over the ring-buffer KV cache.

Decode-step attention for both paths of the reference
(infer.cpp:728-804): the decompressed **MHA** path (per-head K/V caches)
and the absorbed **MLA** path, where scores and mixing happen in the shared
compressed-latent space — MQA-style: one (kv_lora_rank + rope) cache serves
all heads, which is exactly the memory-bandwidth win of MLA.

These are batched einsum formulations that XLA fuses well on TPU; the masked
softmax runs in float32. `kv_len` masks the valid prefix of the static-shape
ring buffer (no dynamic shapes under jit). Prefill variants take a causal
band mask instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.where(mask, scores, _NEG_INF)
    m = scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(mask, e, 0.0)
    return e / e.sum(axis=-1, keepdims=True)


def _len_mask(kv_len, B: int, S: int) -> jnp.ndarray:
    """(B, 1, S) bool mask of valid cache slots; kv_len scalar or (B,)."""
    s = jnp.arange(S, dtype=jnp.int32)
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    return s[None, None, :] < kv_len[:, None, None]


def decode_attn_mha(
    q: jnp.ndarray,        # (B, H, head_dim)
    k_cache: jnp.ndarray,  # (B, S, H, head_dim)
    v_cache: jnp.ndarray,  # (B, S, H, v_head_dim)
    kv_len,                # scalar or (B,) number of valid cache slots
    softmax_scale=None,    # default 1/sqrt(head_dim)
) -> jnp.ndarray:          # (B, H, v_head_dim)
    B, S = k_cache.shape[0], k_cache.shape[1]
    head_dim = q.shape[-1]
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = jnp.einsum(
        "bhd,bshd->bhs", q.astype(jnp.float32), k_cache.astype(jnp.float32)) * scale
    w = _masked_softmax(scores, _len_mask(kv_len, B, S))
    out = jnp.einsum("bhs,bshv->bhv", w, v_cache.astype(jnp.float32))
    return out


def decode_attn_mla(
    q_c: jnp.ndarray,       # (B, H, kv_lora_rank) — absorbed latent query
    q_rope: jnp.ndarray,    # (B, H, qk_rope_head_dim)
    ckv_cache: jnp.ndarray, # (B, S, kv_lora_rank) — shared latent cache
    krope_cache: jnp.ndarray,  # (B, S, qk_rope_head_dim)
    kv_len,
    head_dim: int,          # softmax scale uses the *full* head_dim (attn_mla)
    softmax_scale=None,
) -> jnp.ndarray:           # (B, H, kv_lora_rank) — attended latents
    B, S = ckv_cache.shape[0], ckv_cache.shape[1]
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = (
        jnp.einsum("bhr,bsr->bhs", q_c.astype(jnp.float32), ckv_cache.astype(jnp.float32))
        + jnp.einsum("bhp,bsp->bhs", q_rope.astype(jnp.float32), krope_cache.astype(jnp.float32))
    ) * scale
    w = _masked_softmax(scores, _len_mask(kv_len, B, S))
    return jnp.einsum("bhs,bsr->bhr", w, ckv_cache.astype(jnp.float32))


def decode_attn_mla_partial(
    q_c: jnp.ndarray,       # (B, H, kv_lora_rank)
    q_rope: jnp.ndarray,    # (B, H, qk_rope_head_dim)
    ckv_cache: jnp.ndarray,   # (B, S_local, kv_lora_rank) — one seq shard
    krope_cache: jnp.ndarray,  # (B, S_local, qk_rope_head_dim)
    kv_len_local,           # (B,) valid prefix length WITHIN this shard
    head_dim: int,
    softmax_scale=None,
):
    """Sequence-parallel partial of decode_attn_mla: returns the
    UNNORMALIZED accumulator plus the flash statistics so shards can be
    merged exactly:  out = psum(acc*e^(m-m*)) / psum(l*e^(m-m*)).

    Returns (acc (B,H,R), m (B,H), l (B,H)); an empty shard yields
    acc=0, l=0, m=-inf-ish, which contributes nothing to the merge."""
    B, S = ckv_cache.shape[0], ckv_cache.shape[1]
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = (
        jnp.einsum("bhr,bsr->bhs", q_c.astype(jnp.float32),
                   ckv_cache.astype(jnp.float32))
        + jnp.einsum("bhp,bsp->bhs", q_rope.astype(jnp.float32),
                     krope_cache.astype(jnp.float32))
    ) * scale
    mask = _len_mask(kv_len_local, B, S)
    scores = jnp.where(mask, scores, _NEG_INF)
    m = scores.max(axis=-1)                                   # (B, H)
    e = jnp.where(mask, jnp.exp(scores - m[..., None]), 0.0)
    l = e.sum(axis=-1)                                        # (B, H)
    acc = jnp.einsum("bhs,bsr->bhr", e, ckv_cache.astype(jnp.float32))
    return acc, m, l


def decode_attn_mha_partial(
    q: jnp.ndarray,        # (B, H, head_dim)
    k_cache: jnp.ndarray,  # (B, S_local, H, head_dim) — one seq shard
    v_cache: jnp.ndarray,  # (B, S_local, H, v_head_dim)
    kv_len_local,          # (B,) valid prefix length WITHIN this shard
    softmax_scale=None,
):
    """Sequence-parallel partial of decode_attn_mha (see
    decode_attn_mla_partial). Returns (acc (B,H,Dv), m (B,H), l (B,H))."""
    B, S = k_cache.shape[0], k_cache.shape[1]
    head_dim = q.shape[-1]
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = jnp.einsum(
        "bhd,bshd->bhs", q.astype(jnp.float32),
        k_cache.astype(jnp.float32)) * scale
    mask = _len_mask(kv_len_local, B, S)
    scores = jnp.where(mask, scores, _NEG_INF)
    m = scores.max(axis=-1)                                   # (B, H)
    e = jnp.where(mask, jnp.exp(scores - m[..., None]), 0.0)
    l = e.sum(axis=-1)                                        # (B, H)
    acc = jnp.einsum("bhs,bshv->bhv", e, v_cache.astype(jnp.float32))
    return acc, m, l


def prefill_attn_mha(
    q: jnp.ndarray,        # (B, T, H, head_dim) — query chunk
    k_cache: jnp.ndarray,  # (B, S, H, head_dim)
    v_cache: jnp.ndarray,  # (B, S, H, v_head_dim)
    q_pos: jnp.ndarray,    # (T,) query positions — or (B, T) per-row (verify mode)
    cache_pos: jnp.ndarray,  # (S,) absolute position stored in each cache slot (-1 = empty)
    softmax_scale=None,
) -> jnp.ndarray:          # (B, T, H, v_head_dim)
    """Chunked causal attention: query t attends to cache slots whose stored
    position <= q_pos[t]. Slot positions handle the ring buffer generically;
    (B, T) q_pos gives each batch row its own chunk positions (the batched
    speculative-verify mode)."""
    head_dim = q.shape[-1]
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), k_cache.astype(jnp.float32)) * scale
    mask = (cache_pos[None, :] <= q_pos[..., :, None]) & (cache_pos >= 0)
    # (T, S) broadcasts over (B, H); (B, T, S) inserts the head axis
    mask = mask[None, None] if q_pos.ndim == 1 else mask[:, None]
    w = _masked_softmax(scores, mask)
    return jnp.einsum("bhts,bshv->bthv", w, v_cache.astype(jnp.float32))


def prefill_attn_mha_partial(
    q: jnp.ndarray,        # (B, T, H, head_dim)
    k_cache: jnp.ndarray,  # (B, S_local, H, head_dim) — one seq shard
    v_cache: jnp.ndarray,  # (B, S_local, H, v_head_dim)
    q_pos: jnp.ndarray,    # (T,)
    cache_pos: jnp.ndarray,  # (S_local,) GLOBAL positions of local slots
    softmax_scale=None,
):
    """Sequence-parallel partial of prefill_attn_mha: unnormalized
    accumulator + flash stats, merged across shards by SpmdCtx.seq_merge.
    Returns (acc (B,T,H,Dv), m (B,T,H), l (B,T,H))."""
    head_dim = q.shape[-1]
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32),
        k_cache.astype(jnp.float32)) * scale
    mask = (cache_pos[None, :] <= q_pos[:, None]) & (cache_pos[None, :] >= 0)
    scores = jnp.where(mask[None, None], scores, _NEG_INF)
    m = scores.max(axis=-1)                                     # (B, H, T)
    e = jnp.where(mask[None, None], jnp.exp(scores - m[..., None]), 0.0)
    l = e.sum(axis=-1)                                          # (B, H, T)
    acc = jnp.einsum("bhts,bshv->bthv", e, v_cache.astype(jnp.float32))
    return acc, jnp.swapaxes(m, 1, 2), jnp.swapaxes(l, 1, 2)


def prefill_attn_mla_partial(
    q_c: jnp.ndarray,       # (B, T, H, kv_lora_rank)
    q_rope: jnp.ndarray,    # (B, T, H, qk_rope_head_dim)
    ckv_cache: jnp.ndarray,  # (B, S_local, kv_lora_rank) — one seq shard
    krope_cache: jnp.ndarray,  # (B, S_local, qk_rope_head_dim)
    q_pos: jnp.ndarray,     # (T,)
    cache_pos: jnp.ndarray,  # (S_local,) GLOBAL positions of local slots
    head_dim: int,
    softmax_scale=None,
):
    """Sequence-parallel partial of prefill_attn_mla (see
    prefill_attn_mha_partial). Returns (acc (B,T,H,R), m, l (B,T,H))."""
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = (
        jnp.einsum("bthr,bsr->bhts", q_c.astype(jnp.float32),
                   ckv_cache.astype(jnp.float32))
        + jnp.einsum("bthp,bsp->bhts", q_rope.astype(jnp.float32),
                     krope_cache.astype(jnp.float32))
    ) * scale
    mask = (cache_pos[None, :] <= q_pos[:, None]) & (cache_pos[None, :] >= 0)
    scores = jnp.where(mask[None, None], scores, _NEG_INF)
    m = scores.max(axis=-1)                                     # (B, H, T)
    e = jnp.where(mask[None, None], jnp.exp(scores - m[..., None]), 0.0)
    l = e.sum(axis=-1)
    acc = jnp.einsum("bhts,bsr->bthr", e, ckv_cache.astype(jnp.float32))
    return acc, jnp.swapaxes(m, 1, 2), jnp.swapaxes(l, 1, 2)


def prefill_attn_mla(
    q_c: jnp.ndarray,       # (B, T, H, kv_lora_rank)
    q_rope: jnp.ndarray,    # (B, T, H, qk_rope_head_dim)
    ckv_cache: jnp.ndarray,  # (B, S, kv_lora_rank)
    krope_cache: jnp.ndarray,  # (B, S, qk_rope_head_dim)
    q_pos: jnp.ndarray,     # (T,) — or (B, T) per-row (verify mode)
    cache_pos: jnp.ndarray,  # (S,)
    head_dim: int,
    softmax_scale=None,
) -> jnp.ndarray:           # (B, T, H, kv_lora_rank)
    scale = jnp.float32(softmax_scale) if softmax_scale is not None \
        else 1.0 / jnp.sqrt(jnp.float32(head_dim))
    scores = (
        jnp.einsum("bthr,bsr->bhts", q_c.astype(jnp.float32), ckv_cache.astype(jnp.float32))
        + jnp.einsum("bthp,bsp->bhts", q_rope.astype(jnp.float32), krope_cache.astype(jnp.float32))
    ) * scale
    mask = (cache_pos[None, :] <= q_pos[..., :, None]) & (cache_pos >= 0)
    mask = mask[None, None] if q_pos.ndim == 1 else mask[:, None]
    w = _masked_softmax(scores, mask)
    return jnp.einsum("bhts,bsr->bthr", w, ckv_cache.astype(jnp.float32))
