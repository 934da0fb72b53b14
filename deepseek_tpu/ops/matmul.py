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

from deepseek_tpu.quant.qtensor import PlainTensor


_AUTO_PALLAS = True  # scripts/tpu_smoke.py passes on v5e (all kernels ~4e-7)


def kernel_impl(cfg) -> dict | None:
    """Resolve cfg.kernel_impl -> None (XLA path) or {'interpret': bool}."""
    mode = getattr(cfg, "kernel_impl", "auto")
    if mode == "xla":
        return None
    on_tpu = jax.default_backend() == "tpu"
    if mode == "pallas":
        return {"interpret": not on_tpu}
    # "auto": pallas on TPU once per-primitive Mosaic support is verified
    # (scripts/tpu_smoke.py); conservatively XLA until then
    return {"interpret": False} if on_tpu and _AUTO_PALLAS else None


def qmatmul(qt, x: jnp.ndarray, dtype=None, impl: dict | None = None) -> jnp.ndarray:
    """x (..., in) @ W.T -> (..., out). Accumulates in float32 on the MXU.

    With ``impl`` set and a quantized weight, dispatches to the Pallas
    fused-dequant kernel (the dequantized weight never hits HBM)."""
    if impl is not None and not isinstance(qt, PlainTensor):
        from deepseek_tpu.ops.pallas.qmm import qmm
        return qmm(qt, x, interpret=impl["interpret"]).astype(x.dtype)
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

    NOTE: under XLA on TPU this lowers to a gather that reads ALL experts
    (measured: decode time scales with E, not k) — the decode hot path uses
    deepseek_tpu.ops.pallas.qmm.qmm_experts instead, which DMAs only the
    selected experts via scalar-prefetch index maps.
    """
    return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), qt)


def reshape_rows(qt, lead: int):
    """View a stacked-rows QTensor (lead*r, n) as (lead, r, n) (e.g. wv_b's
    per-head blocks, model.h:447). Valid when every field's row count
    divides by ``lead``."""
    def r(a):
        rows = a.shape[-2]
        assert rows % lead == 0
        return a.reshape(*a.shape[:-2], lead, rows // lead, a.shape[-1])
    return jax.tree.map(r, qt)
