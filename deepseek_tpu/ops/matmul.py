"""Quantized matmul dispatch.

``qmatmul(qt, x)`` applies a stored projection ``W (out, in)`` to activations
``x (..., in)`` for any QTensor variant (reference dispatcher:
infer.cpp:381-417). The default path dequantizes inline and lets XLA fuse the
dequant arithmetic into the contraction; Pallas fused-dequant kernels
(deepseek_tpu.ops.pallas) slot in behind the same signature for the hot
decode shapes.

``gather_experts`` implements the reference's matmul_expert indexing
(infer.cpp:423-469) as a pytree gather over the stacked expert axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepseek_tpu.quant.qtensor import QTensorLike


def qmatmul(qt, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """x (..., in) @ W.T -> (..., out). Accumulates in float32 on the MXU."""
    dtype = dtype or x.dtype
    w = qt.dequant(dtype)
    assert w.ndim == 2, f"qmatmul expects 2-D weight, got {w.shape}"
    out = jnp.einsum("...n,dn->...d", x, w, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def batched_qmatmul(qt, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Stacked weights W (E, out, in) applied per-row: x (E, ..., in) -> (E, ..., out)."""
    dtype = dtype or x.dtype
    w = qt.dequant(dtype)
    assert w.ndim == 3
    out = jnp.einsum("e...n,edn->e...d", x, w, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def gather_experts(qt, idx: jnp.ndarray):
    """Gather expert slices from a stacked QTensor along its leading axis.

    Works for every variant because all data fields carry the expert axis.
    idx may have any shape; the result's leading dims are idx.shape.
    """
    return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), qt)
