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

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class YarnParams:
    """YaRN frequency-interpolation parameters (static).

    The reference parses these but never applies them ("sinks rather than
    yarn", README.md:93, upstream PR #15); enabling cfg.use_yarn applies the
    standard YaRN recipe: interpolated inverse frequencies with a ramp
    between beta_fast/beta_slow correction dims, and magnitude scaling
    (mscale) folded into cos/sin.
    """

    factor: float
    beta_fast: float
    beta_slow: float
    mscale: float
    mscale_all_dim: float
    original_max_position: int


def yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_inv_freq(d: int, theta: float, yp: YarnParams) -> np.ndarray:
    """Interpolated inverse frequencies, one per rotation pair (d//2,)."""
    dim_idx = np.arange(0, d, 2, dtype=np.float64)
    freq_extra = theta ** -(dim_idx / d)
    freq_inter = freq_extra / yp.factor

    def correction_dim(num_rot):
        return (d * math.log(yp.original_max_position / (num_rot * 2 * math.pi))
                / (2 * math.log(theta)))

    low = max(math.floor(correction_dim(yp.beta_fast)), 0)
    high = min(math.ceil(correction_dim(yp.beta_slow)), d - 1)
    ramp = np.clip((np.arange(d // 2, dtype=np.float64) - low)
                   / max(high - low, 0.001), 0.0, 1.0)
    inv_freq_mask = 1.0 - ramp
    return (freq_inter * (1 - inv_freq_mask)
            + freq_extra * inv_freq_mask).astype(np.float32)


def yarn_attention_mscale(yp: YarnParams) -> float:
    """Extra factor on the attention softmax scale under YaRN
    (DeepseekV2's softmax_scale *= mscale(all_dim)^2)."""
    m = yarn_get_mscale(yp.factor, yp.mscale_all_dim)
    return m * m


def _angles(pos, d: int, theta: float, yarn: Optional[YarnParams] = None):
    """pos: scalar or (...,) array. Returns (cos, sin) of shape pos.shape + (d//2,)."""
    if yarn is not None and yarn.factor > 1.0:
        freq = jnp.asarray(_yarn_inv_freq(d, theta, yarn))
        m = (yarn_get_mscale(yarn.factor, yarn.mscale)
             / yarn_get_mscale(yarn.factor, yarn.mscale_all_dim))
    else:
        i = jnp.arange(0, d, 2, dtype=jnp.float32)
        freq = jnp.power(theta, -(i / d))
        m = 1.0
    val = jnp.asarray(pos, jnp.float32)[..., None] * freq
    return jnp.cos(val) * m, jnp.sin(val) * m


def rope_v2(x: jnp.ndarray, pos, theta: float,
            yarn: Optional[YarnParams] = None) -> jnp.ndarray:
    """V2 transposed-output rope over the last axis (length d, even).

    x: (..., d); pos broadcastable to x.shape[:-1].
    """
    d = x.shape[-1]
    cos, sin = _angles(pos, d, theta, yarn)
    x0 = x[..., 0::2].astype(jnp.float32)
    x1 = x[..., 1::2].astype(jnp.float32)
    out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.astype(x.dtype)


def rope_v3(x: jnp.ndarray, pos, theta: float,
            yarn: Optional[YarnParams] = None) -> jnp.ndarray:
    """V3 interleaved rope over the last axis (length d, even)."""
    d = x.shape[-1]
    cos, sin = _angles(pos, d, theta, yarn)
    x0 = x[..., 0::2].astype(jnp.float32)
    x1 = x[..., 1::2].astype(jnp.float32)
    r = x0 * cos - x1 * sin
    im = x0 * sin + x1 * cos
    out = jnp.stack([r, im], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def apply_rope(x: jnp.ndarray, pos, theta: float, is_v3: bool,
               yarn: Optional[YarnParams] = None) -> jnp.ndarray:
    return rope_v3(x, pos, theta, yarn) if is_v3 else rope_v2(x, pos, theta, yarn)
