"""Ring-buffer + attention-sink KV cache.

Static-shape cache of ``kv_window`` slots per layer (the reference windows at
``rs_original_max_position_embeddings``, NOT max_seq_len —
infer.cpp:1271-1277). Past the window, slots are replaced in ring order while
the first ``KV_SINKS`` slots hold StreamingLLM attention sinks whose rope
chunk is re-rotated by +1 every step (infer.cpp:1004-1020).

MLA caches only the shared compressed latent + rope key — the whole point of
absorbed MLA: cache bytes per token are (kv_lora_rank + qk_rope_head_dim)
instead of n_heads * (head_dim + v_head_dim).

``kv_cache_dtype: int8`` stores rows as int8 with one f32 amax scale per
(slot, [head]) row — half the bytes of bf16 (capability beyond the
reference, whose cache is fixed f16). Quantize/dequant helpers live here;
the attention kernels dequantize in VMEM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deepseek_tpu.config import KV_SINKS, ModelConfig


@dataclasses.dataclass
class KVCache:
    # MHA (decompressed) path
    k: Optional[jax.Array]      # (L, B, S, H, head_dim)
    v: Optional[jax.Array]      # (L, B, S, H, v_head_dim)
    # MLA (absorbed) path
    ckv: Optional[jax.Array]    # (L, B, S, kv_lora_rank)
    krope: Optional[jax.Array]  # (L, B, S, qk_rope_head_dim)
    # per-row f32 scales, only for int8 caches (amax/127 of the stored row)
    k_s: Optional[jax.Array] = None      # (L, B, S, H)
    v_s: Optional[jax.Array] = None      # (L, B, S, H)
    ckv_s: Optional[jax.Array] = None    # (L, B, S)
    krope_s: Optional[jax.Array] = None  # (L, B, S)
    # float master copies of the StreamingLLM sink rows (int8 caches only):
    # the per-step sink re-rotation would otherwise round-trip the rows
    # through int8 every step and the rounding error compounds as a random
    # walk — rotating the float master and quantizing fresh keeps it bounded
    sink_krope: Optional[jax.Array] = None  # (L, B, KV_SINKS, P) f32
    sink_k: Optional[jax.Array] = None      # (L, B, KV_SINKS, H, head_dim) f32

    @property
    def batch(self) -> int:
        arr = self.k if self.k is not None else self.ckv
        return arr.shape[1]

    @property
    def window(self) -> int:
        arr = self.k if self.k is not None else self.ckv
        return arr.shape[2]

    @property
    def quantized(self) -> bool:
        arr = self.k if self.k is not None else self.ckv
        return arr.dtype == jnp.int8

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in (self.k, self.v, self.ckv, self.krope,
                                      self.k_s, self.v_s, self.ckv_s,
                                      self.krope_s) if a is not None)


jax.tree_util.register_dataclass(
    KVCache,
    data_fields=["k", "v", "ckv", "krope", "k_s", "v_s", "ckv_s", "krope_s",
                 "sink_krope", "sink_k"],
    meta_fields=[])


def init_cache(cfg: ModelConfig, batch: int = 1) -> KVCache:
    L, S = cfg.n_layers, cfg.kv_window
    dt = jnp.dtype(cfg.kv_cache_dtype)
    q8 = dt == jnp.int8
    if cfg.use_mla:
        return KVCache(
            k=None, v=None,
            ckv=jnp.zeros((L, batch, S, cfg.kv_lora_rank), dt),
            krope=jnp.zeros((L, batch, S, cfg.qk_rope_head_dim), dt),
            ckv_s=jnp.zeros((L, batch, S), jnp.float32) if q8 else None,
            krope_s=jnp.zeros((L, batch, S), jnp.float32) if q8 else None,
            sink_krope=(jnp.zeros((L, batch, KV_SINKS, cfg.qk_rope_head_dim),
                                  jnp.float32) if q8 else None),
        )
    H = cfg.n_heads
    return KVCache(
        k=jnp.zeros((L, batch, S, H, cfg.head_dim), dt),
        v=jnp.zeros((L, batch, S, H, cfg.v_head_dim), dt),
        ckv=None, krope=None,
        k_s=jnp.zeros((L, batch, S, H), jnp.float32) if q8 else None,
        v_s=jnp.zeros((L, batch, S, H), jnp.float32) if q8 else None,
        sink_k=(jnp.zeros((L, batch, KV_SINKS, H, cfg.head_dim), jnp.float32)
                if q8 else None),
    )


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., D) f32 -> (int8 rows, f32 amax/127 scale (...,))."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = amax / 127.0
    q = jnp.round(x / jnp.maximum(scale, 1e-20)[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale.astype(jnp.float32)


def dequant_rows(q: jnp.ndarray, scale: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of quantize_rows; passthrough for unquantized caches."""
    if scale is None:
        return q
    return q.astype(jnp.float32) * scale[..., None]


def ring_positions(cfg: ModelConfig, pos) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(kv_sink, kv_pos, kv_len) for decode position ``pos`` (traced scalar).

    Mirrors infer.cpp:1271-1277:
      kv_sink = pos >= window ? KV_SINKS : 0
      kv_pos  = kv_sink + (pos - kv_sink) % (window - kv_sink)
      kv_len  = min(pos + 1, window)
    """
    window = cfg.kv_window
    pos = jnp.asarray(pos, jnp.int32)
    kv_sink = jnp.where(pos >= window, KV_SINKS, 0).astype(jnp.int32)
    kv_pos = kv_sink + (pos - kv_sink) % (window - kv_sink)
    kv_len = jnp.minimum(pos + 1, window)
    return kv_sink, kv_pos, kv_len
