"""Normalization ops (reference semantics: infer.cpp:601-611)."""

from __future__ import annotations

import jax.numpy as jnp


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """y = x / sqrt(mean(x^2) + eps) * weight, over the last axis.

    The reduction runs in float32 regardless of input dtype (the reference
    keeps activations in f32 throughout; we allow bf16 activations but keep
    the statistics exact).
    """
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(ms + eps))
    return (y * weight.astype(jnp.float32)).astype(x.dtype)
