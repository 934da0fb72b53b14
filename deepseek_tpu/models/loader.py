"""Checkpoint -> ModelParams.

Replaces the reference's Model constructor tensor wiring
(model.cpp:756-872): reads the `.dseek` tensor map, constructs the right
QTensor variant per stored dtype (with K-quant repacking into TPU planes),
and assembles the parameter pytree. Tied-embedding checkpoints reuse the
embedding as lm_head (model.cpp:846-871).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_tpu.config import ModelConfig, QuantKind
from deepseek_tpu.models.params import LayerParams, ModelParams, MTPParams
from deepseek_tpu.quant.kquant import Q2K_BLOCK_BYTES, Q3K_BLOCK_BYTES, QK_K
from deepseek_tpu.quant.qtensor import Fp8Tensor, PlainTensor, Q2KTensor, Q3KTensor
from deepseek_tpu.quant.repack import repack_q2k, repack_q3k
from deepseek_tpu.utils.codec import CheckpointData

# hook: (tensor_name, array) -> device/sharding placement (parallel layer
# installs one; default = single default device)
PutFn = Callable[[str, np.ndarray], jax.Array]


def _default_put(name: str, arr: np.ndarray) -> jax.Array:
    return jnp.asarray(arr)


def _logical_shape(data: CheckpointData, name: str, w, cfg: ModelConfig):
    """Logical (…, out, in) shape of a stored tensor (K-quant raw blocks
    encode 256 weights per block)."""
    dt = data.tensors[name + ".weight"].dtype_str
    shp = tuple(w.shape)
    if dt in ("F32", "F16", "BF16", "F8_E5M2"):
        return shp
    if dt == "U8":
        bb = (Q2K_BLOCK_BYTES if cfg.weight_quant == QuantKind.Q2_K
              else Q3K_BLOCK_BYTES)
        return shp[:-1] + (shp[-1] // bb * QK_K,)
    return None


def load_params(
    data: CheckpointData,
    cfg: ModelConfig,
    *,
    runtime_dtype: Optional[str] = None,
    put: PutFn = _default_put,
    load_mtp: bool = True,
    kquant_runtime: Optional[str] = None,
) -> ModelParams:
    """runtime_dtype: optionally cast f32/f16 weights at load (e.g. "bfloat16"
    keeps decode matmuls native on the MXU).

    kquant_runtime="turbo": expand K-quant weights to pre-scaled int8
    planes at load (quant.qtensor.q2k_to_turbo) — ~3x fewer dequant VPU
    ops per weight at decode for ~3x the packed HBM bytes (still far under
    bf16). The wire format is unchanged; this is an in-HBM layout choice.

    kquant_runtime="nibble": 4-bit nibble planes + bf16 per-16 scales
    (quant.qtensor.KNibbleTensor) — ~1000 Gelem/s decode (2x the packed
    planes, 1.5x turbo) at 5-6 bits/weight, the layout that fits
    full-depth V2-Lite-class checkpoints in one v5e HBM.
    """

    def norm(name: str, expect: Optional[tuple] = None) -> Optional[jax.Array]:
        arr = data.get(name + ".weight")
        if arr is None:
            return None
        arr = np.asarray(arr, dtype=np.float32)
        if expect is not None and tuple(arr.shape) != tuple(expect):
            raise ValueError(
                f"checkpoint tensor {name}.weight has shape "
                f"{tuple(arr.shape)}, config expects {tuple(expect)}")
        return put(name, arr)

    def qt(name: str, expert: bool = False, expect: Optional[tuple] = None):
        """expect: logical (…, out, in) shape from the config — load fails
        loudly on mismatched checkpoints (reference check_tensor,
        model.cpp:131-147 / QTensor::from_codec_tensor, codec.cpp:166-234)."""
        w = data.get(name + ".weight")
        if w is None:
            return None
        if expect is not None:
            got = _logical_shape(data, name, w, cfg)
            if got is not None and tuple(got) != tuple(expect):
                raise ValueError(
                    f"checkpoint tensor {name}.weight has logical shape "
                    f"{tuple(got)}, config expects {tuple(expect)}")
        scale = data.get(name + ".scale")
        dt = data.tensors[name + ".weight"].dtype_str

        if dt in ("F32", "F16", "BF16"):
            arr = np.asarray(w)
            if runtime_dtype is not None:
                arr = arr.astype(jnp.dtype(runtime_dtype))
            elif dt == "F16" and jax.default_backend() == "tpu":
                # the TPU has no native f16: Mosaic rejects it outright and
                # XLA emulates it. bf16 is the hardware dtype — same byte
                # footprint, MXU-native (reference reads f16 via F16C,
                # codec.h:23; the TPU equivalent of "native half" is bf16)
                arr = arr.astype(jnp.bfloat16)
            return PlainTensor(data=put(name, arr))

        if dt == "F8_E5M2":
            block = cfg.block_size if (scale is not None and scale.ndim >= 2) else (0, 0)
            s = np.asarray(scale, np.float32) if scale is not None else np.float32(1.0).reshape(())
            arr = np.asarray(w)
            if block == (0, 0) and arr.ndim == 3 and s.size == 1:
                # per-tensor scalar over an expert stack (the reference
                # wire format, convert.py:344-362): broadcast to (E,1,1)
                # so the scale gathers along the expert axis with the
                # weights and broadcasts in dequant
                s = np.full((arr.shape[0], 1, 1), s.item(), np.float32)
            return Fp8Tensor(data=put(name, arr),
                             scale=put(name + ".scale", s),
                             block_size=tuple(block))

        if dt == "U8":  # K-quant raw blocks: (..., rows, blocks_per_row * block_bytes)
            raw = np.asarray(w)
            rows = raw.shape[-2]
            if cfg.weight_quant == QuantKind.Q2_K:
                cols = raw.shape[-1] // Q2K_BLOCK_BYTES * QK_K
                qs, sm, d, dmin = repack_q2k(raw, rows, cols)
                qt = Q2KTensor(qs=put(name + ".qs", qs), sm=put(name + ".sm", sm),
                               d=put(name + ".d", d), dmin=put(name + ".dmin", dmin))
                if kquant_runtime == "turbo":
                    from deepseek_tpu.quant.qtensor import q2k_to_turbo
                    qt = q2k_to_turbo(qt)
                elif kquant_runtime == "nibble":
                    from deepseek_tpu.quant.qtensor import q2k_to_nibble
                    qt = q2k_to_nibble(qt)
                return qt
            if cfg.weight_quant == QuantKind.Q3_K:
                cols = raw.shape[-1] // Q3K_BLOCK_BYTES * QK_K
                qs, hm, sc, d = repack_q3k(raw, rows, cols)
                qt = Q3KTensor(qs=put(name + ".qs", qs), hm=put(name + ".hm", hm),
                               sc=put(name + ".sc", sc), d=put(name + ".d", d))
                if kquant_runtime == "turbo":
                    from deepseek_tpu.quant.qtensor import q3k_to_turbo
                    qt = q3k_to_turbo(qt)
                elif kquant_runtime == "nibble":
                    from deepseek_tpu.quant.qtensor import q3k_to_nibble
                    qt = q3k_to_nibble(qt)
                return qt
            raise ValueError(
                f"U8 tensor {name} but weight_quant={cfg.weight_quant}")

        raise ValueError(f"unsupported stored dtype {dt} for {name}")

    def block_params(p: str, moe: bool) -> LayerParams:
        c = cfg
        H, hd = c.n_heads, c.head_dim
        R, P = c.kv_lora_rank, c.qk_rope_head_dim
        nope, Dv = c.qk_nope_head_dim, c.v_head_dim
        E, m = c.n_routed_experts, c.moe_intermediate_size
        ql = c.q_lora_rank
        moegate = norm(f"{p}.moegate",
                       expect=(E, c.dim) if c.n_routed_experts else None)
        moegate_bias = None
        if moegate is not None:
            bias = data.get(f"{p}.moegate.bias")
            if bias is not None:
                moegate_bias = put(f"{p}.moegate.bias", np.asarray(bias, np.float32))
        ffn1 = (E, m, c.dim) if moe else (c.hidden_dim, c.dim)
        ffn2 = (E, c.dim, m) if moe else (c.dim, c.hidden_dim)
        return LayerParams(
            attn_norm=norm(f"{p}.attn.norm", expect=(c.dim,)),
            ffn_norm=norm(f"{p}.mlp.norm", expect=(c.dim,)),
            kv_a_norm=norm(f"{p}.attn.kv_a_norm", expect=(R,)),
            q_a_norm=norm(f"{p}.attn.q_a_norm",
                          expect=(ql,) if ql > 0 else None),
            wkv_a=qt(f"{p}.attn.wkv_a", expect=(R + P, c.dim)),
            wo=qt(f"{p}.attn.wo", expect=(c.dim, H * Dv)),
            wq=qt(f"{p}.attn.wq", expect=(H * hd, c.dim)),
            wq_a=qt(f"{p}.attn.wq_a", expect=(ql, c.dim)),
            wq_b=qt(f"{p}.attn.wq_b", expect=(H * hd, ql)),
            wkv_b=qt(f"{p}.attn.wkv_b", expect=(H * (nope + Dv), R)),
            wc=qt(f"{p}.attn.wc", expect=(H * R, ql)),
            wq_rope_b=qt(f"{p}.attn.wq_rope_b", expect=(H * P, ql)),
            wv_b=qt(f"{p}.attn.wv_b", expect=(H * Dv, R)),
            w1=qt(f"{p}.mlp.w1", expert=True, expect=ffn1),
            w2=qt(f"{p}.mlp.w2", expert=True, expect=ffn2),
            w3=qt(f"{p}.mlp.w3", expert=True, expect=ffn1),
            shared_w1=qt(f"{p}.shared_mlp.w1",
                         expect=(c.n_shared_experts * m, c.dim)),
            shared_w2=qt(f"{p}.shared_mlp.w2",
                         expect=(c.dim, c.n_shared_experts * m)),
            shared_w3=qt(f"{p}.shared_mlp.w3",
                         expect=(c.n_shared_experts * m, c.dim)),
            moegate=moegate,
            moegate_bias=moegate_bias,
        )

    layers = [block_params(f"model.layers.{l}", cfg.is_moe_layer(l))
              for l in range(cfg.n_layers)]

    mtp = None
    if load_mtp and data.get("model.mtp.eh_proj.weight") is not None:
        mtp = MTPParams(
            enorm=norm("model.mtp.enorm"),
            hnorm=norm("model.mtp.hnorm"),
            eh_proj=qt("model.mtp.eh_proj"),
            block=block_params("model.mtp.block", cfg.n_routed_experts > 0),
            final_norm=norm("model.mtp.norm"),
        )

    embed = qt("model.embed", expect=(cfg.vocab_size, cfg.dim))
    lm_head = qt("model.output", expect=(cfg.vocab_size, cfg.dim))
    if lm_head is None:
        lm_head = embed  # tied embeddings

    return ModelParams(
        embed=embed,
        layers=layers,
        final_norm=norm("model.norm"),
        lm_head=lm_head,
        mtp=mtp,
    )


def _qt_concat_rows(a, b):
    """Concatenate two same-type QTensors along their output-rows axis
    (every field of the K-quant/plain layouts scales with the rows).
    Returns None when the pair cannot be fused losslessly."""
    if a is None or b is None or type(a) is not type(b):
        return None
    if isinstance(a, Fp8Tensor):
        if a.block_size != b.block_size or a.block_size == (0, 0):
            return None   # per-tensor scales differ; can't merge scalars
        b0 = a.block_size[0]
        if a.shape[-2] % b0 or b.shape[-2] % b0:
            return None   # scale grid would straddle the seam
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=-2), a, b)


def _qt_split_rows(qt, rows_a: int, rows_b: int):
    """Inverse of _qt_concat_rows."""
    total = rows_a + rows_b

    def cut(x):
        r = x.shape[-2]
        ra = r * rows_a // total
        return x[..., :ra, :], x[..., ra:, :]
    parts = jax.tree.map(cut, qt)
    a = jax.tree.map(lambda p: p[0], parts,
                     is_leaf=lambda v: isinstance(v, tuple))
    b = jax.tree.map(lambda p: p[1], parts,
                     is_leaf=lambda v: isinstance(v, tuple))
    return a, b


def _qt_concat0(a, b):
    """Concatenate expert-stacked QTensors along the expert axis."""
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def _qt_rows_to_experts(qt, ns: int):
    """(ns*m, cols…) -> (ns, m, cols…): rows split trivially for every
    layout (row-major packing)."""
    from deepseek_tpu.ops.matmul import reshape_rows
    return reshape_rows(qt, ns)


def _qt_split_cols_to_experts(qt, ns: int, m: int):
    """(dim, ns*m) -> (ns, dim, m) when the layout permits a clean LOGICAL
    column split (natural column order + aligned scale grids); None
    otherwise (stride-16 permuted K-quant planes interleave columns)."""
    from deepseek_tpu.quant.qtensor import (
        Fp8Tensor, PlainTensor, Q2KTurboTensor,
    )

    def split(a, cols_per_m: int):
        lead = a.shape[:-1]
        out = a.reshape(*lead, ns, cols_per_m)
        return jnp.moveaxis(out, -2, 0)

    if isinstance(qt, PlainTensor):
        return PlainTensor(data=split(qt.data, m))
    if isinstance(qt, Fp8Tensor):
        b0, b1 = qt.block_size
        if (b0, b1) == (0, 0) or m % b1:
            return None
        return Fp8Tensor(data=split(qt.data, m),
                         scale=split(qt.scale, m // b1),
                         block_size=qt.block_size)
    if isinstance(qt, Q2KTurboTensor):
        if m % 256:
            return None
        return Q2KTurboTensor(p=split(qt.p, m), d=split(qt.d, m // 256),
                              bm=split(qt.bm, m // 16))
    return None


def fuse_projections(params: ModelParams, cfg: ModelConfig,
                     consume: bool = False) -> ModelParams:
    """Single-chip decode optimization: concatenate projection pairs that
    consume the same activation ([w1;w3], [shared_w1;shared_w3],
    [wq_rope_b;wc], [wkv_a;wq_a]) so one kernel dispatch and one weight
    sweep replace two — ~4 fewer matmul dispatches per layer per token.
    Component fields become None. Mesh runs need the unfused layout (TP
    splits rows per projection); parallel.sharding.shard_params unfuses
    automatically."""
    import dataclasses

    def fuse_layer(lp: LayerParams) -> LayerParams:
        w13 = _qt_concat_rows(lp.w1, lp.w3)
        wcr = _qt_concat_rows(lp.wq_rope_b, lp.wc)
        wkvq = _qt_concat_rows(lp.wkv_a, lp.wq_a)

        # shared-expert fold: append the n_shared shared experts to the
        # routed tables as always-on slots (weight 1.0) — one expert
        # kernel per projection covers routed AND shared, and prefill's
        # grouped matmul absorbs the shared GEMMs
        w13s = w2s = None
        ns, m = cfg.n_shared_experts, cfg.moe_intermediate_size
        if (lp.moegate is not None and w13 is not None and ns > 0
                and lp.shared_w1 is not None
                and lp.shared_w1.shape[-2] == ns * m):
            w2sh = _qt_split_cols_to_experts(lp.shared_w2, ns, m)
            if w2sh is not None:
                sh13 = _qt_concat_rows(_qt_rows_to_experts(lp.shared_w1, ns),
                                       _qt_rows_to_experts(lp.shared_w3, ns))
                w13s = _qt_concat0(w13, sh13)
                w2s = _qt_concat0(lp.w2, w2sh)

        if w13s is not None:
            return dataclasses.replace(
                lp, w13s=w13s, w2s=w2s, w13=None, w1=None, w2=None, w3=None,
                shared_w1=None, shared_w2=None, shared_w3=None,
                shared_w13=None,
                wcr=wcr, wq_rope_b=None if wcr is not None else lp.wq_rope_b,
                wc=None if wcr is not None else lp.wc,
                wkvq=wkvq, wkv_a=None if wkvq is not None else lp.wkv_a,
                wq_a=None if wkvq is not None else lp.wq_a,
            )
        s13 = _qt_concat_rows(lp.shared_w1, lp.shared_w3)
        return dataclasses.replace(
            lp,
            w13=w13, w1=None if w13 is not None else lp.w1,
            w3=None if w13 is not None else lp.w3,
            shared_w13=s13,
            shared_w1=None if s13 is not None else lp.shared_w1,
            shared_w3=None if s13 is not None else lp.shared_w3,
            wcr=wcr, wq_rope_b=None if wcr is not None else lp.wq_rope_b,
            wc=None if wcr is not None else lp.wc,
            wkvq=wkvq, wkv_a=None if wkvq is not None else lp.wkv_a,
            wq_a=None if wkvq is not None else lp.wq_a,
        )

    src = params.layers if consume else list(params.layers)
    layers = []
    for i in range(len(src)):
        lp = src[i]
        if consume:
            src[i] = None      # free the donor layer once fused
        layers.append(_rowperm_layer(fuse_layer(lp)))
        del lp
    mtp = params.mtp
    if mtp is not None:
        mtp = dataclasses.replace(mtp,
                                  block=_rowperm_layer(fuse_layer(mtp.block)))
    return dataclasses.replace(params, layers=layers, mtp=mtp)


def _rowperm_qt(qt, halves: int, undo: bool):
    """Permute a KNibbleTensor's OUT rows stride-16 per contiguous half
    (free reshape/transpose, no gather): permuted position o*(mh/16)+g of
    a half holds natural row g*16+o. Matmul outputs of the permuted
    tensor land in `_perm_x` order per half — the activation layout the
    downstream K-quant kernels consume — so the fused expert-chain kernel
    never permutes h. All fields (p/a/c) share the row axis (-2)."""
    import dataclasses

    from deepseek_tpu.quant.qtensor import KNibbleTensor
    assert isinstance(qt, KNibbleTensor)
    rows = qt.p.shape[-2]
    mh = rows // halves
    assert rows % halves == 0 and mh % 16 == 0

    def perm(a):
        if a is None:
            return None
        lead = a.shape[:-2]
        if undo:
            a = a.reshape(*lead, halves, 16, mh // 16, a.shape[-1])
        else:
            a = a.reshape(*lead, halves, mh // 16, 16, a.shape[-1])
        return a.swapaxes(-3, -2).reshape(*lead, rows, a.shape[-1])

    return dataclasses.replace(
        qt, p=perm(qt.p), a=perm(qt.a), c=perm(qt.c),
        rowperm=0 if undo else halves)


def rowperm_expert_w13(params: ModelParams, cfg: ModelConfig,
                       undo: bool = False) -> ModelParams:
    """Apply (or undo) the stride-16 row permutation on fused expert
    [w1;w3] nibble tables (w13s / w13). Enables the single-dispatch fused
    expert FFN kernel (ops.pallas.qmm.qmm_expert_ffn) and lets the w2
    kernels take h without an activation permute. Single-chip layout:
    sharded runs unfuse first (unfuse_projections undoes this)."""
    import dataclasses

    from deepseek_tpu.quant.qtensor import KNibbleTensor

    return dataclasses.replace(
        params, layers=[_rowperm_layer(lp, undo)
                        if isinstance(lp, LayerParams) else lp
                        for lp in params.layers])


def _rowperm_layer(lp: LayerParams, undo: bool = False) -> LayerParams:
    import dataclasses
    import os

    from deepseek_tpu.quant.qtensor import KNibbleTensor
    # OPT-IN with the fused expert-chain kernel it exists for
    # (DSEEK_FUSED_FFN=1): the x_prepermuted w2 path it forces on batched
    # decode measured -15% at B=8 (1380 vs 1620 tok/s, round-5 A/B) while
    # single-seq decode is neutral — production defaults stay on the
    # natural layout. ``undo`` always runs (sharded unfuse must restore
    # natural rows whenever a permuted table exists).
    if not os.environ.get("DSEEK_FUSED_FFN") and not undo:
        return lp
    rep = {}
    for f in ("w13s", "w13"):
        qt = getattr(lp, f)
        if (isinstance(qt, KNibbleTensor)
                and qt.p.ndim == 3          # expert tables only
                and (bool(qt.rowperm) == undo)
                and qt.p.shape[-2] % 32 == 0):
            rep[f] = _rowperm_qt(qt, 2, undo)
    return dataclasses.replace(lp, **rep) if rep else lp


def unfuse_projections(params: ModelParams, cfg: ModelConfig) -> ModelParams:
    """Exact inverse of fuse_projections (row slices)."""
    import dataclasses

    # restore natural expert-FFN row order first: TP slices rows of w13
    # and columns of w2 consistently in NATURAL order
    params = rowperm_expert_w13(params, cfg, undo=True)

    H, P, R = cfg.n_heads, cfg.qk_rope_head_dim, cfg.kv_lora_rank

    def unfold_shared(lp: LayerParams) -> LayerParams:
        if lp.w13s is None:
            return lp
        E, ns = cfg.n_routed_experts, cfg.n_shared_experts
        m = cfg.moe_intermediate_size

        def head(a):
            return a[:E]

        def tail(a):
            return a[E:]

        w13 = jax.tree.map(head, lp.w13s)
        sh13 = jax.tree.map(tail, lp.w13s)              # (ns, 2m-rows, …)
        sw1_e, sw3_e = _qt_split_rows(sh13, m, m)       # (ns, m-rows, …)
        merge_rows = lambda a: a.reshape(-1, *a.shape[2:])
        sw1 = jax.tree.map(merge_rows, sw1_e)
        sw3 = jax.tree.map(merge_rows, sw3_e)
        w2 = jax.tree.map(head, lp.w2s)
        sw2 = jax.tree.map(lambda a: jnp.moveaxis(a[E:], 0, -2).reshape(
            *a.shape[1:-1], -1), lp.w2s)
        return dataclasses.replace(
            lp, w13s=None, w2s=None, w13=w13, w2=w2,
            shared_w1=sw1, shared_w2=sw2, shared_w3=sw3)

    def unfuse_layer(lp: LayerParams) -> LayerParams:
        lp = unfold_shared(lp)
        kw = {}
        if lp.w13 is not None:
            m = lp.w13.shape[-2] // 2
            kw["w1"], kw["w3"] = _qt_split_rows(lp.w13, m, m)
            kw["w13"] = None
        if lp.shared_w13 is not None:
            m = lp.shared_w13.shape[-2] // 2
            kw["shared_w1"], kw["shared_w3"] = _qt_split_rows(
                lp.shared_w13, m, m)
            kw["shared_w13"] = None
        if lp.wcr is not None:
            kw["wq_rope_b"], kw["wc"] = _qt_split_rows(lp.wcr, H * P, H * R)
            kw["wcr"] = None
        if lp.wkvq is not None:
            kw["wkv_a"], kw["wq_a"] = _qt_split_rows(
                lp.wkvq, R + P, cfg.q_lora_rank)
            kw["wkvq"] = None
        return dataclasses.replace(lp, **kw) if kw else lp

    layers = [unfuse_layer(lp) for lp in params.layers]
    mtp = params.mtp
    if mtp is not None:
        mtp = dataclasses.replace(mtp, block=unfuse_layer(mtp.block))
    return dataclasses.replace(params, layers=layers, mtp=mtp)


@functools.partial(jax.jit, donate_argnums=(0,))
def _stack_fill(buf, piece, i):
    return jax.lax.dynamic_update_index_in_dim(buf, piece, i, 0)


def _stack_lps(lps, consume: bool):
    """Stack a list of structurally-identical LayerParams into one whose
    arrays carry a leading (n,) axis.

    Fills preallocated buffers with donated in-place updates instead of
    jnp.stack (which peaks at 2x the group's bytes and OOMs Q3_K at full
    V2-Lite depth). With ``consume`` the source fields are released as
    they are copied, bounding the transient to roughly the originals plus
    the single largest field's stacked buffer."""
    import dataclasses
    n = len(lps)
    kw = {}
    for f in dataclasses.fields(type(lps[0])):
        v0 = getattr(lps[0], f.name)
        if v0 is None:
            kw[f.name] = None
            continue
        leaves0, treedef = jax.tree.flatten(v0)
        bufs = [jnp.zeros((n,) + x.shape, x.dtype) for x in leaves0]
        for i in range(n):
            pieces = jax.tree.leaves(getattr(lps[i], f.name))
            bufs = [_stack_fill(b, p, jnp.int32(i))
                    for b, p in zip(bufs, pieces)]
            if consume:
                object.__setattr__(lps[i], f.name, None)
        kw[f.name] = jax.tree.unflatten(treedef, bufs)
    return type(lps[0])(**kw)


def stack_layer_groups(params: ModelParams, cfg: ModelConfig,
                       min_group: int = 8,
                       consume: bool = False) -> ModelParams:
    """Stack runs of structurally-identical layers into ``StackedLayers``
    entries so ``run_layer_stack`` executes them as one ``lax.scan``.

    Why (measured): fully-unrolled deep stacks hit a TPU program-size
    cliff — Q2_K V2-Lite-class marginal layer cost is ~0.32 ms up to
    L=24 and 1.7 ms past it (PERFORMANCE.md); scanning keeps the program
    depth-independent. Layers group only when their pytree structure,
    leaf shapes/dtypes and MoE/dense selection agree (is_moe_layer must
    be static inside the scan body). Single-chip layout only — sharded
    runs keep the flat tuple. ``consume`` releases source fields while
    copying (the caller's params object is cannibalized — drop it)."""
    from deepseek_tpu.models.params import StackedLayers
    layers = list(params.layers)

    def sig(i: int, lp) -> tuple:
        leaves, treedef = jax.tree.flatten(lp)
        return (cfg.is_moe_layer(i), str(treedef),
                tuple((tuple(x.shape), str(x.dtype)) for x in leaves))

    out, i, n = [], 0, len(layers)
    while i < n:
        if isinstance(layers[i], StackedLayers):   # idempotent
            out.append(layers[i])
            i += 1
            continue
        j = i + 1
        s0 = sig(i, layers[i])
        while (j < n and not isinstance(layers[j], StackedLayers)
               and sig(j, layers[j]) == s0):
            j += 1
        if j - i >= min_group:
            out.append(StackedLayers(lp=_stack_lps(layers[i:j], consume),
                                     n=j - i))
        else:
            out.extend(layers[i:j])
        i = j
    import dataclasses
    return dataclasses.replace(params, layers=tuple(out))


def unstack_layer_groups(params: ModelParams) -> ModelParams:
    """Inverse of ``stack_layer_groups``: expand every ``StackedLayers``
    entry back into per-layer ``LayerParams``.

    Used by paths that need the flat per-layer layout — ``shard_params``
    (per-layer NamedShardings) and ``Pipeline`` (stage slicing by layer
    index) auto-unstack, mirroring how they auto-unfuse projections. The
    slices are device-side copies, so the transient peak is the stacked
    group plus its slices; multi-chip loads that care should build the
    Engine with ``scan_layers=False`` instead of stacking then undoing."""
    import dataclasses
    from deepseek_tpu.models.params import StackedLayers
    if not any(isinstance(e, StackedLayers) for e in params.layers):
        return params
    layers = []
    for entry in params.layers:
        if isinstance(entry, StackedLayers):
            layers.extend(jax.tree.map(lambda a, k=k: a[k], entry.lp)
                          for k in range(entry.n))
        else:
            layers.append(entry)
    return dataclasses.replace(params, layers=tuple(layers))


def align_param_layouts(params: ModelParams, cfg: ModelConfig,
                        n_steps: int = 32, batch: int = 1) -> ModelParams:
    """Pre-relayout params to the fused decode loop's compiled input
    formats (TPU only; a no-op elsewhere).

    XLA compiles jit programs with AUTO argument layouts: for scanned
    layer stacks it prefers transposed last-two-dim tilings for some
    bf16 scale planes (measured: the stacked MoE w2 scale plane wants
    major_to_minor (0,1,3,2)). Arrays built by normal computation carry
    default layouts, so EVERY dispatch relayout-copies the mismatched
    arguments — a silent per-dispatch tax (~0.8 GB of copies per step
    at full V2-Lite depth on an 11.2 GB param set).

    NOTE: this alignment does NOT rescue the scan+nibble full-depth
    OOM — measured on-chip, the first decode dispatch still exhausts
    HBM with layouts pre-aligned (PERFORMANCE.md), so the Engine's
    scan_layers="auto" keeps nibble models unrolled. The alignment
    remains worthwhile for the scanned packed-K-quant configs where
    the loop runs.

    Fix: lower the SAME decode-loop jit from avals, read the compiled
    ``input_formats``, and ``device_put(..., donate=True)`` each
    mismatched leaf to the layout XLA wants, one at a time (transient
    bounded by the largest single mismatched leaf). Subsequent engine
    dispatches then bind copy-free; jit re-lowers keyed on the committed
    formats and honors them.
    """
    if jax.default_backend() != "tpu":
        return params
    from deepseek_tpu.models import init_cache
    from deepseek_tpu.models.deepseek import make_decode_loop

    pav = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    cav = jax.eval_shape(lambda: init_cache(cfg, batch=batch))
    sc = jax.ShapeDtypeStruct((), jnp.float32)
    loop = jax.jit(make_decode_loop(cfg, n_steps, jit=False),
                   donate_argnums=(1,))
    compiled = loop.lower(
        pav, cav, jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32), sc, sc).compile()
    fmts = compiled.input_formats[0][0]
    moved = [0]

    # leaf-at-a-time with donation means a mid-tree failure (e.g. a
    # transient OOM on a near-full-HBM model — the exact target of this
    # feature) leaves already-donated sources DELETED: the only valid
    # result is the merged tree (moved prefix + live copy of the failing
    # leaf + untouched suffix), never the caller's original reference
    leaves, treedef = jax.tree.flatten(params)
    fleaves = jax.tree.flatten(fmts)[0]
    assert len(leaves) == len(fleaves), (len(leaves), len(fleaves))
    out_leaves = list(leaves)
    try:
        for i, (x, f) in enumerate(zip(leaves, fleaves)):
            if x is None or getattr(x, "format", None) is None:
                continue
            if x.format.layout == f.layout:
                continue
            y = jax.device_put(x, f, donate=True)
            # record y BEFORE syncing: on TPU an allocation OOM often
            # surfaces at block_until_ready, AFTER the donation consumed
            # x — at that point y is the only live handle for this leaf
            out_leaves[i] = y
            y.block_until_ready()      # serialize: bound the transient
            moved[0] += y.nbytes
    except Exception:  # noqa: BLE001 - partial alignment is still valid
        # scrub the merged tree: every slot must hold a LIVE array. The
        # failing leaf may have lost either copy (y poisoned by the OOM,
        # or x consumed before device_put raised) — fall back to
        # whichever survived; if both are gone no valid tree exists and
        # the caller must not dispatch on these params at all.
        for i, src in enumerate(leaves):
            leaf = out_leaves[i]
            if getattr(leaf, "is_deleted", lambda: False)():
                if (src is not leaf
                        and not getattr(src, "is_deleted", lambda: True)()):
                    out_leaves[i] = src
                else:
                    raise
        import logging
        logging.getLogger("deepseek_tpu.loader").warning(
            "param layout alignment stopped early after %.2f GB; "
            "remaining dispatches may pay relayout copies on the "
            "unaligned leaves", moved[0] / 1e9, exc_info=True)
    out = jax.tree.unflatten(treedef, out_leaves)
    if moved[0]:
        import logging
        logging.getLogger("deepseek_tpu.loader").info(
            "aligned %.2f GB of params to the decode loop's compiled "
            "layouts (dispatch relayout copies eliminated)",
            moved[0] / 1e9)
    return out


def _layer_weight_active_bytes(lp, moe: bool, cfg: ModelConfig) -> float:
    """Weight bytes one decode token touches in a layer. Also correct for
    a StackedLayers.lp (fields carry a leading (n,) axis, so the sums
    count all n layers at once — the fractions apply linearly)."""
    total = 0.0
    for name in ("wkv_a", "wo", "wq", "wq_a", "wq_b", "wkv_b",
                 "wc", "wq_rope_b", "wv_b", "wcr", "wkvq"):
        t = getattr(lp, name)
        if t is not None:
            total += t.nbytes_active
    for name in ("attn_norm", "ffn_norm", "kv_a_norm", "q_a_norm"):
        a = getattr(lp, name)
        if a is not None:
            total += a.nbytes
    if moe:
        frac = cfg.n_active_routed / cfg.n_routed_experts
        for name in ("w1", "w2", "w3", "w13"):
            t = getattr(lp, name)
            if t is not None:
                total += t.nbytes_active * frac
        # folded tables: k routed of E plus all n_shared per token
        frac_tab = ((cfg.n_active_routed + cfg.n_shared_experts)
                    / (cfg.n_routed_experts + cfg.n_shared_experts))
        for name in ("w13s", "w2s"):
            t = getattr(lp, name)
            if t is not None:
                total += t.nbytes_active * frac_tab
        for name in ("shared_w1", "shared_w2", "shared_w3",
                     "shared_w13"):
            t = getattr(lp, name)
            if t is not None:
                total += t.nbytes_active
        total += lp.moegate.nbytes
        if lp.moegate_bias is not None:
            total += lp.moegate_bias.nbytes
    else:
        for name in ("w1", "w2", "w3", "w13"):
            t = getattr(lp, name)
            if t is not None:
                total += t.nbytes_active
    return total


def params_active_bytes(params: ModelParams, cfg: ModelConfig, pos: int = 0) -> float:
    """Analytical bytes touched per decode token (reference active_bytes,
    model.cpp:324-352,885-901): full dense weights + only n_active_routed
    experts per MoE layer + KV cache up to kv_len."""
    from deepseek_tpu.models.params import StackedLayers
    total = params.embed.nbytes_active / params.embed.shape[0]  # one embed row
    kv_len = min(pos + 1, cfg.kv_window)
    itemsize = jnp.dtype(cfg.kv_cache_dtype).itemsize
    if cfg.use_mla:
        kv_per_layer = kv_len * (cfg.kv_lora_rank + cfg.qk_rope_head_dim) * itemsize
    else:
        kv_per_layer = kv_len * cfg.n_heads * (cfg.head_dim + cfg.v_head_dim) * itemsize
    l = 0
    for entry in params.layers:
        if isinstance(entry, StackedLayers):
            total += _layer_weight_active_bytes(
                entry.lp, cfg.is_moe_layer(l), cfg)   # counts all n at once
            total += kv_per_layer * entry.n
            l += entry.n
        else:
            total += _layer_weight_active_bytes(entry, cfg.is_moe_layer(l), cfg)
            total += kv_per_layer
            l += 1
    total += params.final_norm.nbytes
    total += params.lm_head.nbytes_active
    return float(total)


def params_bits_per_weight(params: ModelParams) -> float:
    """Measured storage bits per weight across the projection tensors as
    actually loaded (reference stat: bits_per_weight, codec.cpp:40-66 —
    a per-format constant there; here runtime layouts like the turbo
    int8 planes or the 4-bit nibble planes change the true figure, so we
    report storage truth: total packed plane bytes / logical elements,
    the convention BASELINE.md settles the reference's own Q2_K
    inconsistency with)."""
    from deepseek_tpu.quant.qtensor import QTensorLike
    bits = 0.0
    weights = 0.0
    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QTensorLike)):
        if isinstance(leaf, QTensorLike):
            n = 1
            for s in leaf.shape:
                n *= int(s)
            bits += 8.0 * sum(x.nbytes for x in jax.tree.leaves(leaf))
            weights += n
    return bits / weights if weights else 0.0
