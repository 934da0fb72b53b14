"""Model parameter pytrees.

The reference's ``Block``/``BlockMHA``/``BlockMLA`` class hierarchy
(model.h:182-453) becomes two flat dataclasses of (possibly quantized)
arrays; which attention/FFN branch a layer takes is decided by which fields
are populated plus the static config — no virtual dispatch, everything
jit-traceable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from deepseek_tpu.quant.qtensor import Fp8Tensor, PlainTensor, Q2KTensor, Q3KTensor

QT = Any  # one of the QTensor variants


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass
class LayerParams:
    # norms (always f32)
    attn_norm: jax.Array            # (dim,)
    ffn_norm: jax.Array             # (dim,)
    kv_a_norm: jax.Array            # (kv_lora_rank,) — note: reference stores
                                    # (kv_lora_rank + rope) but normalizes only the latent chunk
    q_a_norm: Optional[jax.Array]   # (q_lora_rank,)

    # attention projections (checkpoint layout: (out, in))
    wkv_a: QT                       # (kv_lora_rank + qk_rope_head_dim, dim)
    wo: QT                          # (dim, n_heads * v_head_dim)
    # MHA (decompressed) path
    wq: Optional[QT]                # (n_heads * head_dim, dim) — q_lora_rank == 0
    wq_a: Optional[QT]              # (q_lora_rank, dim)
    wq_b: Optional[QT]              # (n_heads * head_dim, q_lora_rank)
    wkv_b: Optional[QT]             # (n_heads * (qk_nope + v_head_dim), kv_lora_rank)
    # MLA (absorbed) path — produced offline by the converter's absorption
    wc: Optional[QT]                # (n_heads * kv_lora_rank, q_lora_rank)
    wq_rope_b: Optional[QT]         # (n_heads * qk_rope_head_dim, q_lora_rank)
    wv_b: Optional[QT]              # (n_heads * v_head_dim, kv_lora_rank)

    # FFN: dense (hidden_dim, dim) or routed experts (E, moe_inter, dim)
    w1: QT
    w2: QT                          # (dim, hidden) or (E, dim, moe_inter)
    w3: QT
    shared_w1: Optional[QT]         # (n_shared * moe_inter, dim)
    shared_w2: Optional[QT]
    shared_w3: Optional[QT]
    moegate: Optional[jax.Array]    # (E, dim) f32
    moegate_bias: Optional[jax.Array]  # (E,) f32 — V3 e-score correction

    # --- fused projection pairs (single-chip decode optimization) -------
    # Built by models.loader.fuse_projections: pairs that consume the same
    # activation are concatenated along their output rows so one kernel
    # dispatch (and one weight sweep) replaces two. The component fields
    # are set to None when a fused field is present. Mesh/sharded runs
    # keep the UNFUSED layout (TP splits rows per projection).
    w13: Optional[QT] = None        # [w1; w3] rows — (2*hidden, dim) or (E, 2m, dim)
    shared_w13: Optional[QT] = None  # [shared_w1; shared_w3]
    wcr: Optional[QT] = None        # [wq_rope_b; wc] rows (absorbed MLA)
    wkvq: Optional[QT] = None       # [wkv_a; wq_a] rows
    # shared experts FOLDED into the routed tables as n_shared always-on
    # experts (weight 1.0): one expert kernel covers routed + shared, and
    # prefill's grouped matmul absorbs the shared GEMMs too
    w13s: Optional[QT] = None       # (E + n_shared, 2m, dim)
    w2s: Optional[QT] = None        # (E + n_shared, dim, m)


@dataclasses.dataclass
class StackedLayers:
    """``n`` structurally-identical layers with every array stacked on a
    new leading axis, executed as ONE ``lax.scan`` iteration space by
    ``models.deepseek.run_layer_stack``.

    Why: fully unrolling deep stacks makes the compiled program grow
    linearly with depth and TPU decode falls off a cliff once the program
    outgrows the core's instruction budget (measured: Q2_K V2-Lite-class
    marginal layer cost 0.32 ms for L<=24, 1.34 ms at L=27 —
    PERFORMANCE.md). A scanned stack keeps the program size
    depth-independent and cuts compile time. Built by
    ``models.loader.stack_layer_groups``; single-chip only (sharded runs
    keep the flat tuple — parallel.sharding.shard_params unstacks).
    """

    lp: "LayerParams"   # every non-None field has a leading (n, ...) axis
    n: int              # static layer count


jax.tree_util.register_dataclass(
    StackedLayers, data_fields=["lp"], meta_fields=["n"])


@_register
@dataclasses.dataclass
class MTPParams:
    """DeepSeek-V3 multi-token-prediction module (the extra checkpoint
    layer the reference ignores): predicts token t+2 from the main model's
    final hidden state at t plus the embedding of token t+1. Used for
    lossless self-speculative decoding (engine.generate_mtp)."""

    enorm: jax.Array                # (dim,) — norm on the next-token embedding
    hnorm: jax.Array                # (dim,) — norm on the main hidden state
    eh_proj: QT                     # (dim, 2*dim) — fuse [emb; hidden]
    block: "LayerParams"            # one standard transformer block
    final_norm: jax.Array           # (dim,) — shared_head.norm
    # the output head is the main model's lm_head (shared)


@_register
@dataclasses.dataclass
class ModelParams:
    embed: QT                       # (vocab_size, dim)
    layers: List[LayerParams]
    final_norm: jax.Array           # (dim,)
    lm_head: QT                     # (vocab_size, dim); tied checkpoints reuse embed
    mtp: Optional[MTPParams] = None


def embed_lookup(qt, tokens: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Gather + dequantize embedding rows (reference _copy_embedding,
    infer.cpp:1217-1263). tokens: (...,) int32 -> (..., dim)."""
    if isinstance(qt, PlainTensor):
        return jnp.take(qt.data, tokens, axis=0).astype(dtype)
    if isinstance(qt, Fp8Tensor):
        rows = jnp.take(qt.data, tokens, axis=0).astype(dtype)
        if qt.block_size == (0, 0):
            return rows * qt.scale.astype(dtype)
        b0, b1 = qt.block_size
        dim = qt.data.shape[-1]
        srow = jnp.take(qt.scale, tokens // b0, axis=0)          # (..., g1)
        srow = jnp.repeat(srow, b1, axis=-1)[..., :dim]
        return rows * srow.astype(dtype)
    from deepseek_tpu.quant.qtensor import (
        KNibbleTensor, Q2KTurboTensor, Q3KTurboTensor,
    )
    if isinstance(qt, (Q2KTensor, Q3KTensor, Q2KTurboTensor, Q3KTurboTensor,
                       KNibbleTensor)):
        sub = jax.tree.map(lambda a: jnp.take(a, tokens, axis=0), qt)
        return sub.dequant(dtype)
    raise TypeError(f"unsupported embedding tensor {type(qt)}")
