"""Rotary position embeddings — DeepSeek V2 and V3 variants.

The DeepSeek family applies rope only to the `qk_rope_head_dim` chunk of each
head. Two layouts exist (reference infer.cpp:648-724, selected by
``is_v3 = has_moegate_bias``):

- **V2 ("transposed")**: consecutive input pairs (x[2i], x[2i+1]) rotate by
  angle(i), but outputs land *split*: real parts in the first half, imaginary
  parts in the second half of the vector.
- **V3 ("interleaved")**: same rotation, outputs stay interleaved in place.

Both use plain theta^(-2i/d) frequencies — YaRN parameters are parsed and
stored but not applied, matching the reference's sinks-not-yarn behavior
(README.md:93).
"""

from __future__ import annotations

import jax.numpy as jnp


def _angles(pos, d: int, theta: float):
    """pos: scalar or (...,) array. Returns (cos, sin) of shape pos.shape + (d//2,)."""
    i = jnp.arange(0, d, 2, dtype=jnp.float32)
    freq = jnp.power(theta, -(i / d))
    val = jnp.asarray(pos, jnp.float32)[..., None] * freq
    return jnp.cos(val), jnp.sin(val)


def rope_v2(x: jnp.ndarray, pos, theta: float) -> jnp.ndarray:
    """V2 transposed-output rope over the last axis (length d, even).

    x: (..., d); pos broadcastable to x.shape[:-1].
    """
    d = x.shape[-1]
    cos, sin = _angles(pos, d, theta)
    x0 = x[..., 0::2].astype(jnp.float32)
    x1 = x[..., 1::2].astype(jnp.float32)
    out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.astype(x.dtype)


def rope_v3(x: jnp.ndarray, pos, theta: float) -> jnp.ndarray:
    """V3 interleaved rope over the last axis (length d, even)."""
    d = x.shape[-1]
    cos, sin = _angles(pos, d, theta)
    x0 = x[..., 0::2].astype(jnp.float32)
    x1 = x[..., 1::2].astype(jnp.float32)
    r = x0 * cos - x1 * sin
    im = x0 * sin + x1 * cos
    out = jnp.stack([r, im], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def apply_rope(x: jnp.ndarray, pos, theta: float, is_v3: bool) -> jnp.ndarray:
    return rope_v3(x, pos, theta) if is_v3 else rope_v2(x, pos, theta)
