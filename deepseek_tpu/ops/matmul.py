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

import functools

import jax
import jax.numpy as jnp

from deepseek_tpu.quant.qtensor import PlainTensor


_AUTO_PALLAS = True  # scripts/tpu_smoke.py passes on v5e (all kernels ~4e-7)


def kernel_impl(cfg, prefill: bool = False) -> dict | None:
    """Resolve cfg.kernel_impl -> None (XLA path) or {'interpret': bool}.

    ``prefill`` tags the dict so row-count-sensitive dispatches (qmatmul's
    scanned-stack branch) can pick the chunk-amortized formulation."""
    mode = getattr(cfg, "kernel_impl", "auto")
    if mode == "xla":
        return None
    on_tpu = jax.default_backend() == "tpu"
    if mode == "pallas":
        impl = {"interpret": not on_tpu}
    elif on_tpu and _AUTO_PALLAS:
        # "auto": pallas on TPU once per-primitive Mosaic support is
        # verified (scripts/tpu_smoke.py); conservatively XLA until then
        impl = {"interpret": False}
    else:
        return None
    if prefill:
        impl["prefill"] = True
    return impl


import dataclasses as _dc


@_dc.dataclass
class LayerSlicedQT:
    """One layer's weight inside a scanned StackedLayers group: the whole
    stacked QTensor (leading axis = group size) plus a TRACED layer index.

    Why not slice eagerly: ``lax.scan`` feeding a slice to an opaque
    Pallas kernel materializes the slice as a full HBM copy every
    iteration — measured 85 -> 19 tok/s on the 27-layer Q2_K bench. The
    kernel paths instead treat the stacked tensor as an expert table and
    index it with the traced layer id through the SAME scalar-prefetch
    machinery qmm_experts already uses: only the addressed layer's tiles
    leave HBM. Non-kernel (XLA) consumers ``materialize()`` the slice —
    correct everywhere, copy-free nowhere, which is fine off the TPU hot
    path (CPU tests, debug)."""

    qt: object   # stacked QTensor; every data field has a leading (Lg,) axis
    li: object   # int32 scalar (may be a tracer) — index within the group

    @property
    def shape(self):
        return tuple(self.qt.shape[1:])

    def materialize(self):
        return jax.tree.map(lambda a: a[self.li], self.qt)

    def dequant(self, dtype=jnp.float32):
        return self.materialize().dequant(dtype)


jax.tree_util.register_dataclass(
    LayerSlicedQT, data_fields=["qt", "li"], meta_fields=[])


def expert_table(t, idx):
    """Normalize an expert-table operand for qmm_experts/gather_experts.

    Plain stacked tensors pass through. A LayerSlicedQT merges its layer
    axis into the expert axis — (Lg, E, out, in) -> (Lg*E, out, in), a
    free row-major reshape — and offsets the indices by li*E, so the
    scalar-prefetch kernels address the right layer with zero copies."""
    if isinstance(t, LayerSlicedQT):
        E = t.qt.shape[1]
        flat = jax.tree.map(
            lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]),
            t.qt)
        return flat, idx + jnp.asarray(t.li, idx.dtype) * E
    return t, idx


def qmatmul(qt, x: jnp.ndarray, dtype=None, impl: dict | None = None) -> jnp.ndarray:
    """x (..., in) @ W.T -> (..., out). Accumulates in float32 on the MXU.

    With ``impl`` set, dispatches to the Pallas kernels: fused dequant for
    quantized weights (the dequantized weight never hits HBM) and a tiled
    matvec for large plain weights (small ones fall back to einsum inside
    qmm so XLA keeps fusing them with neighbors)."""
    if isinstance(qt, LayerSlicedQT):
        from deepseek_tpu.quant.qtensor import Fp8Tensor
        if (isinstance(qt.qt, Fp8Tensor)
                and tuple(qt.qt.block_size) == (0, 0)):
            qt = qt.materialize()   # per-tensor fp8 has no kernel anywhere
        if (isinstance(qt, LayerSlicedQT) and impl is not None
                and not impl.get("prefill")):
            # DECODE: the stacked weight IS an expert table with one
            # "expert" per layer — the gather kernel DMAs only layer li's
            # packed tiles, no slice copy per scan iteration (measured
            # 85 -> 19 tok/s when sliced). The pair-flat grid dequants
            # once per ROW though, so PREFILL chunks (hundreds of rows)
            # skip this branch and materialize the slice instead — one
            # copy per chunk per layer, amortized over the chunk's
            # tokens, then the batch-tiled qmm dequants once per 128
            # rows (same policy as _ffn's grouped prefill)
            from deepseek_tpu.ops.pallas.qmm import qmm_experts
            lead, n = x.shape[:-1], x.shape[-1]
            x2 = x.reshape(1, -1, n)                       # (1, rows, n)
            rows = x2.shape[1]
            idx = jnp.broadcast_to(jnp.asarray(qt.li, jnp.int32), (1, rows))
            out = qmm_experts(qt.qt, idx, x2,
                              interpret=impl["interpret"])  # (1, rows, out)
            return out.reshape(*lead, out.shape[-1]).astype(x.dtype)
        if isinstance(qt, LayerSlicedQT):
            qt = qt.materialize()
    if impl is not None:
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


def ep_prefill_capacity(n_pairs: int, ep: int, cf: float,
                        tile: int = 128) -> int:
    """Static per-shard pair capacity for EP prefill compaction.

    EP prefill dispatch design: activations are replicated across the
    expert mesh axis, so "dispatch" is a local selection — each shard
    counting-sorts its OWNED token-expert pairs into a capacity-C buffer
    and runs the grouped matmuls on those rows only. Per-shard MoE FLOPs
    therefore scale ~cf*k/EP instead of k (the pre-dispatch path computed
    every pair on every shard, zero-weighted). Pairs past the capacity
    (pathological routing skew) are counted and reported; their output
    contribution is missing, so callers retry the chunk with cf=0 (exact).
    """
    if ep <= 1 or cf <= 0:
        return -(-n_pairs // tile) * tile
    c = min(n_pairs, int(cf * n_pairs / ep) + 1)
    return min(-(-c // tile) * tile, -(-n_pairs // tile) * tile)


def _ep_owned(flat_idx, flat_w, ctx, e_local: int):
    """Ownership + per-expert counting-sort ranks for this shard.

    Returns (lidx, owned, within, counts, w): local expert id per pair
    (0 for non-owned), ownership mask, rank among same-expert owned pairs,
    per-local-expert owned counts, weights with non-owned zeroed.
    (Thin composition of the shared spmd helpers — the decode pair
    dispatch, SpmdCtx.dispatch_pairs, uses the same core.)
    """
    from deepseek_tpu.parallel.spmd import counting_rank, ep_ownership
    lidx, owned, flat_w = ep_ownership(flat_idx, flat_w, ctx, e_local)
    if owned is None:
        owned = jnp.ones(flat_idx.shape, bool)
    cls = jnp.where(owned, lidx, e_local)                    # (N,)
    within, counts, _ = counting_rank(cls, e_local + 1)
    return lidx, owned, within, counts[:e_local], flat_w


def _quantized_grouped_ffn(w1, w2, w3, xb, weights, idx, act, ctx, interpret,
                           w13=None):
    """Quantized-expert prefill FFN: counting dispatch into 128-row tiles
    (each tile belongs to one expert) + qmm_grouped, which dequantizes the
    expert's packed bytes in VMEM — no HBM dequant materialization.

    Static tile budget: G = E_local + C/128 where C is the EP capacity
    (= all N pairs when ep==1; see ep_prefill_capacity) — each expert
    wastes < one tile to ragged fragmentation; surplus tiles point at the
    last expert and compute discarded rows.

    Returns (out (B,T,dim), overflow count).
    """
    from deepseek_tpu.ops.activations import glu_act
    from deepseek_tpu.ops.pallas.qmm import (
        _group_sums, _group_sums_perm, _perm_x, qmm_grouped,
    )
    from deepseek_tpu.quant.qtensor import (
        KNibbleTensor, Q2KTensor, Q2KTurboTensor, Q3KTensor, Q3KTurboTensor,
    )

    TB = 128
    B, T, k = idx.shape
    dim = xb.shape[-1]
    dtype = xb.dtype
    N = B * T * k
    e_local = (w13 if w13 is not None else w1).shape[0]
    C = ep_prefill_capacity(N, ctx.ep, ctx.ep_capacity_factor, TB)
    G = e_local + C // TB                                    # static budget

    lidx, owned, within, counts, flat_w = _ep_owned(
        idx.reshape(N), weights.reshape(N), ctx, e_local)
    tiles_e = -(-counts // TB)
    tile_start = jnp.cumsum(tiles_e) - tiles_e               # (E_local,)
    t_idx = jnp.arange(G, dtype=jnp.int32)
    tile_expert = jnp.clip(
        (t_idx[:, None] >= tile_start[None, :]).sum(axis=1) - 1,
        0, e_local - 1).astype(jnp.int32)
    dest = jnp.where(owned, tile_start[lidx] * TB + within, G * TB)
    keep = dest < G * TB
    ovf = jnp.sum(owned & ~keep).astype(jnp.int32)

    src = jnp.zeros((G * TB,), jnp.int32).at[
        jnp.where(keep, dest, G * TB)].set(jnp.arange(N, dtype=jnp.int32),
                                           mode="drop")
    # unfilled slots keep src=0 (token 0's row); their outputs are never
    # gathered back through `dest`
    x_rows = xb.reshape(B * T, dim)[src // k].astype(jnp.float32)

    wp = w13 if w13 is not None else w1
    kq = isinstance(wp, (Q2KTensor, Q3KTensor, Q3KTurboTensor,
                         KNibbleTensor))
    need_s16 = isinstance(wp, (Q2KTurboTensor, KNibbleTensor))
    s16x = (_group_sums(x_rows, dim).reshape(G, TB, dim // 16)
            if need_s16 else None)
    xin = _perm_x(x_rows, dim) if kq else x_rows  # Q2 turbo stays natural
    gq = functools.partial(qmm_grouped, interpret=interpret)
    if w13 is not None:
        h2 = gq(w13, tile_expert, xin.reshape(G, TB, dim), s16_tiles=s16x)
        mh = h2.shape[-1] // 2
        h = glu_act(h2[..., :mh], h2[..., mh:], act)
    else:
        h = glu_act(
            gq(w1, tile_expert, xin.reshape(G, TB, dim), s16_tiles=s16x),
            gq(w3, tile_expert, xin.reshape(G, TB, dim), s16_tiles=s16x),
            act)
    m = h.shape[-1]
    # rowperm w13 (KNibbleTensor.rowperm): h is already in `_perm_x`
    # order per half — skip the activation permute, group-sum over the
    # permuted layout instead
    rp = bool(getattr(wp, "rowperm", 0)) and w13 is not None
    s16h = None
    if need_s16:
        gs = _group_sums_perm if rp else _group_sums
        s16h = gs(h.reshape(G * TB, m), m).reshape(G, TB, m // 16)
    if kq and not rp:
        hin = _perm_x(h.reshape(G * TB, m), m)
    else:
        hin = h.reshape(G * TB, m)
    y = gq(w2, tile_expert, hin.reshape(G, TB, m), s16_tiles=s16h)

    y = jnp.where(keep[:, None],
                  y.reshape(G * TB, dim)[jnp.clip(dest, 0, G * TB - 1)], 0.0)
    y = (y * flat_w[:, None]).reshape(B, T, k, dim)
    return ctx.psum_e(y.sum(axis=2)).astype(dtype), ctx.psum_e(ovf)


def grouped_expert_ffn(w1, w2, w3, xb: jnp.ndarray, weights: jnp.ndarray,
                       idx: jnp.ndarray, act, ctx, interpret: bool = False,
                       w13=None) -> jnp.ndarray:
    """Prefill MoE FFN as a ragged grouped matmul (megablocks-style).

    Sorts the (B*T*k) token-expert pairs by expert id and runs the three
    expert projections as `megablox.gmm` grouped matmuls — FLOPs scale with
    the k *routed* experts per token instead of all E (the dense-over-experts
    formulation costs E/k more MXU work; measured >10x prefill win at
    DeepSeek-V2-Lite shapes).

    w1/w3 (E, m, dim), w2 (E, dim, m) QTensors (dequantized here — same
    materialization class as the dense path), xb (B, T, dim), weights/idx
    (B, T, k). Under EP (ctx.ep > 1) only this shard's OWNED pairs are
    computed, compacted to the static EP capacity (see ep_prefill_capacity);
    psum_e restores the full mixture. Returns (out, overflow count).
    """
    from jax.experimental.pallas.ops.tpu import megablox

    if not isinstance(w13 if w13 is not None else w1, PlainTensor):
        return _quantized_grouped_ffn(w1, w2, w3, xb, weights, idx, act,
                                      ctx, interpret, w13=w13)

    B, T, k = idx.shape
    dim = xb.shape[-1]
    dtype = xb.dtype
    N = B * T * k
    d13 = w13.dequant(dtype) if w13 is not None else None
    if d13 is None:
        d1, d3 = w1.dequant(dtype), w3.dequant(dtype)
    d2 = w2.dequant(dtype)
    e_local = d2.shape[0]
    # gmm tiles m/k/n by 128; C = all N pairs (128-padded) when ep == 1
    C = ep_prefill_capacity(N, ctx.ep, ctx.ep_capacity_factor, 128)

    # grouping permutation built from a one-hot-cumsum counting sort — a TPU
    # sort HLO on the pair list costs milliseconds (argsort+gathers measured
    # 6.3ms at T=512, more than the grouped matmuls themselves)
    lidx, owned, within, counts, flat_w = _ep_owned(
        idx.reshape(N), weights.reshape(N), ctx, e_local)
    starts = jnp.cumsum(counts) - counts
    dest = jnp.where(owned, starts[lidx] + within, C)      # non-owned OOB
    keep = dest < C
    ovf = jnp.sum(owned & ~keep).astype(jnp.int32)
    src = jnp.zeros((C,), jnp.int32).at[
        jnp.where(keep, dest, C)].set(jnp.arange(N, dtype=jnp.int32),
                                      mode="drop")
    # per-group sizes clipped to the capacity; slack rows (unfilled, src=0)
    # attach to the LAST expert and their outputs are never gathered back
    g_start = jnp.minimum(starts, C)
    g_end = jnp.minimum(starts + counts, C)
    sizes = (g_end - g_start).astype(jnp.int32)
    sizes = sizes.at[-1].add(C - sizes.sum())
    x_rows = xb.reshape(B * T, dim)[src // k]              # (C, dim) sorted

    def tiling(k, n):
        # full-k tiles + wide n measured 2.6x over the (128,128,128) default
        # on v5e; m stays 128 (ragged groups pad each group to one m-tile)
        kt = min(k, 2048)
        if n % 128 == 0 and kt * n * 2 <= 8 * 1024 * 1024:
            return (128, kt, n)
        for nt in (512, 256, 128):
            if n % nt == 0:
                return (128, kt, nt)
        return (128, 128, 128)

    def mm(lhs, rhs, sizes):
        g, n, k = rhs.shape  # stored (E, out, in); gmm sees transposed rhs
        return megablox.gmm(lhs, rhs, sizes,
                            preferred_element_type=jnp.float32,
                            transpose_rhs=True, tiling=tiling(k, n),
                            interpret=interpret)

    from deepseek_tpu.ops.activations import glu_act
    if d13 is not None:
        h2 = mm(x_rows, d13, sizes)
        mh = h2.shape[-1] // 2
        h = glu_act(h2[:, :mh], h2[:, mh:], act).astype(dtype)
    else:
        h = glu_act(mm(x_rows, d1, sizes), mm(x_rows, d3, sizes),
                    act).astype(dtype)
    y = mm(h, d2, sizes)                                   # (C, dim) f32

    y = jnp.where(keep[:, None], y[jnp.clip(dest, 0, C - 1)], 0.0)
    y = (y * flat_w[:, None]).reshape(B, T, k, dim)
    return ctx.psum_e(y.sum(axis=2)).astype(dtype), ctx.psum_e(ovf)


def per_tensor_fp8(t) -> bool:
    """True for an Fp8Tensor with a per-tensor scalar scale ((0,0) block) —
    a compatibility format (reference convert.py:326-334) with no fused
    kernel: the scalar-scale dequant is one XLA multiply, so those paths
    fall back to the dequant formulation instead of qmm_experts/
    qmm_grouped (which assert on it)."""
    from deepseek_tpu.quant.qtensor import Fp8Tensor
    tt = t.qt if isinstance(t, LayerSlicedQT) else t
    return isinstance(tt, Fp8Tensor) and tuple(tt.block_size) == (0, 0)


def grouped_ffn_supported(cfg, w1=None) -> bool:
    """Tile/kernel divisibility for the grouped prefill paths: gmm tiles
    m/k/n by 128 (plain weights); qmm_grouped needs K-quant superblocks
    (256) to divide both contraction dims (quantized/turbo weights).
    Per-tensor fp8 has no grouped kernel (see per_tensor_fp8)."""
    from deepseek_tpu.quant.qtensor import (
        KNibbleTensor, Q2KTensor, Q2KTurboTensor, Q3KTensor, Q3KTurboTensor,
    )
    if w1 is not None and per_tensor_fp8(w1):
        return False
    if w1 is not None and isinstance(w1, (Q2KTensor, Q3KTensor,
                                          Q2KTurboTensor, Q3KTurboTensor,
                                          KNibbleTensor)):
        return (cfg.dim % 256 == 0 and cfg.moe_intermediate_size % 256 == 0)
    return (cfg.dim % 128 == 0 and cfg.moe_intermediate_size % 128 == 0)


def reshape_rows(qt, lead: int):
    """View a stacked-rows QTensor (lead*r, n) as (lead, r, n) (e.g. wv_b's
    per-head blocks, model.h:447). Valid when every field's row count
    divides by ``lead``."""
    def r(a):
        rows = a.shape[-2]
        assert rows % lead == 0
        return a.reshape(*a.shape[:-2], lead, rows // lead, a.shape[-1])
    return jax.tree.map(r, qt)
