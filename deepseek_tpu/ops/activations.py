"""GLU feed-forward activations (reference infer.cpp:636-646)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ActivationType


def glu_act(gate: jnp.ndarray, up: jnp.ndarray, act: ActivationType) -> jnp.ndarray:
    """act(gate) * up — the GLU nonlinearity used in every FFN."""
    g = gate.astype(jnp.float32)
    if act == ActivationType.SILU:
        a = g * jax.nn.sigmoid(g)
    else:  # tanh-approximated GELU, matching the reference's gelu()
        a = 0.5 * g * (1.0 + jnp.tanh(0.797885 * (g + 0.044715 * g * g * g)))
    return (a * up.astype(jnp.float32)).astype(gate.dtype)
