"""On-device token sampling (temperature + nucleus top-p).

Device-side counterpart of deepseek_tpu.sampler.Sampler: identical nucleus
semantics (smallest prefix of the descending-probability ordering whose mass
reaches top_p, renormalized), implemented with a full sort + cumsum so the
whole decode loop — forward, sample, feedback — stays on chip across a
lax.scan rollout. temperature == 0 selects argmax via a jnp.where.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def sample_token(logits: jnp.ndarray, key, temperature, top_p) -> jnp.ndarray:
    """logits (B, V) f32 -> (B,) int32. temperature/top_p may be traced."""
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    scaled = logits / t
    order = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose preceding cumulative mass is < top_p (>= 1 kept)
    keep = (cum - probs) < jnp.asarray(top_p, jnp.float32)
    masked = jnp.where(keep, sorted_logits, _NEG_INF)
    choice = jax.random.categorical(key, masked, axis=-1)
    sampled = jnp.take_along_axis(order, choice[..., None], axis=-1)[..., 0]
    return jnp.where(jnp.asarray(temperature) == 0.0, greedy,
                     sampled.astype(jnp.int32))
