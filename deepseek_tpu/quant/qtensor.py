"""Quantized-tensor pytree nodes.

The model parameter tree holds these instead of raw arrays. Each node knows
how to dequantize itself to a compute dtype; the fused matmul paths in
deepseek_tpu.ops consume the packed fields directly without materializing the
dequantized weight in HBM.

Weight convention follows the checkpoint: a projection is stored as
``W (out_features, in_features)`` and applied as ``y = x @ W.T``
(reference matmul: W (d,n) @ x (n,) -> (d,), infer.cpp:381-417).

K-quant tensors are stored in the TPU *plane* layout produced by
deepseek_tpu.quant.repack: 2-bit/1-bit planes are packed so that unpacking is
a shift-and-mask followed by a lane-dimension concatenation (no in-register
shuffles), with per-16-column scale bytes and per-256-column f32 super scales.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_tpu.config import QuantKind


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclasses.dataclass
class PlainTensor:
    """Unquantized weight (fp32 / fp16 / bf16)."""

    data: jax.Array  # (..., out, in)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def nbytes_active(self) -> int:
        return int(np.prod(self.shape)) * self.data.dtype.itemsize

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        return self.data.astype(dtype)


_register(PlainTensor, ["data"], [])


@dataclasses.dataclass
class Fp8Tensor:
    """F8E5M2 weight with a blockwise (or per-tensor) inverse-scale grid."""

    data: jax.Array     # (..., out, in) float8_e5m2
    scale: jax.Array    # (..., ceil(out/b0), ceil(in/b1)) f32, or scalar
    block_size: Tuple[int, int] = dataclasses.field(default=(0, 0))  # (0,0) = per-tensor

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def nbytes_active(self) -> int:
        return int(np.prod(self.shape)) + self.scale.size * 4

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        w = self.data.astype(dtype)
        if self.block_size == (0, 0):
            return w * self.scale.astype(dtype)
        b0, b1 = self.block_size
        d, n = self.shape[-2:]
        s = jnp.repeat(self.scale, b0, axis=-2)[..., :d, :]
        s = jnp.repeat(s, b1, axis=-1)[..., :n]
        return w * s.astype(dtype)


_register(Fp8Tensor, ["data", "scale"], ["block_size"])


def _unpack_2bit_planes(qs: jax.Array) -> jax.Array:
    """(..., d, n//4) uint8 -> (..., d, n) ints in [0,3], ORIGINAL column order
    (planes store the stride-16 permuted order; see quant.repack)."""
    from deepseek_tpu.quant.repack import stride16_inv_perm
    perm = jnp.concatenate([(qs >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)
    n = perm.shape[-1]
    return jnp.take(perm, jnp.asarray(stride16_inv_perm(n)), axis=-1)


def _unpack_1bit_planes(hm: jax.Array) -> jax.Array:
    """(..., d, n//8) uint8 -> (..., d, n) in {0,1}, ORIGINAL column order."""
    from deepseek_tpu.quant.repack import stride16_inv_perm
    perm = jnp.concatenate([(hm >> b) & 1 for b in range(8)], axis=-1)
    n = perm.shape[-1]
    return jnp.take(perm, jnp.asarray(stride16_inv_perm(n)), axis=-1)


@dataclasses.dataclass
class Q2KTensor:
    """Q2_K weight in TPU plane layout. x = d*sc*q - dmin*mn."""

    qs: jax.Array    # (..., out, in//4)  uint8: 4 plane-packed 2-bit quants
    sm: jax.Array    # (..., out, in//16) uint8: sc | mn << 4 (4-bit each)
    d: jax.Array     # (..., out, in//256) f32 super scale
    dmin: jax.Array  # (..., out, in//256) f32 super min scale

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.qs.shape[:-1]) + (self.qs.shape[-1] * 4,)

    @property
    def nbytes_active(self) -> int:
        return self.qs.size + self.sm.size + self.d.size * 4 + self.dmin.size * 4

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        q = _unpack_2bit_planes(self.qs).astype(dtype)
        sc = (self.sm & 0xF).astype(dtype)
        mn = (self.sm >> 4).astype(dtype)
        scale = jnp.repeat(self.d.astype(dtype), 16, axis=-1) * sc
        minv = jnp.repeat(self.dmin.astype(dtype), 16, axis=-1) * mn
        return jnp.repeat(scale, 16, axis=-1) * q - jnp.repeat(minv, 16, axis=-1)


_register(Q2KTensor, ["qs", "sm", "d", "dmin"], [])


@dataclasses.dataclass
class Q3KTensor:
    """Q3_K weight in TPU plane layout. x = d*sc*(qlow + 4*hbit - 4)."""

    qs: jax.Array  # (..., out, in//4)  uint8: low 2 bits, plane-packed
    hm: jax.Array  # (..., out, in//8)  uint8: high bit, plane-packed
    sc: jax.Array  # (..., out, in//16) int8: signed 6-bit scale (already -32)
    d: jax.Array   # (..., out, in//256) f32 super scale

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.qs.shape[:-1]) + (self.qs.shape[-1] * 4,)

    @property
    def nbytes_active(self) -> int:
        return self.qs.size + self.hm.size + self.sc.size + self.d.size * 4

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        qlow = _unpack_2bit_planes(self.qs).astype(jnp.int8)
        hbit = _unpack_1bit_planes(self.hm).astype(jnp.int8)
        q = (qlow + (hbit << 2) - 4).astype(dtype)
        scale = jnp.repeat(self.d.astype(dtype), 16, axis=-1) * self.sc.astype(dtype)
        return jnp.repeat(scale, 16, axis=-1) * q


_register(Q3KTensor, ["qs", "hm", "sc", "d"], [])


@dataclasses.dataclass
class Q2KTurboTensor:
    """Q2_K expanded to a pre-scaled int8 plane at load time ("turbo").

    p[i] = sc_g(i) * q_i — exact in int8 (sc<=15, q<=3) — in NATURAL
    column order, so superblocks are contiguous 256-column slices and the
    kernel scales per-superblock partial dots on the OUTPUT side:
    y = sum_sb (x_sb . p_sb^T) * d[:, sb] - sum_j (dmin*mn)_j * s16_j
    (s16 = per-16-group activation sums, one tiny extra dot). The only
    per-weight VPU work left is the int8->f32 convert — measured 493 tok/s
    class on fp8 with the same structure vs ~350 for materialized-scale
    pipelines. Costs 9.125 bits of HBM per weight instead of 2.625 — a
    speed/capacity trade selected per session (Engine
    kquant_runtime="turbo").
    """

    p: jax.Array    # (..., out, in) int8 = sc * q, NATURAL column order
    d: jax.Array    # (..., out, in//256) f32 super scale
    bm: jax.Array   # (..., out, in//16) bf16 = dmin * mn (min term).
    #                 bf16 storage halves this plane's 0.25 B/weight HBM
    #                 share at IDENTICAL TPU numerics: the min-term dot
    #                 runs DEFAULT MXU precision, which truncates its f32
    #                 operands to bf16 anyway (see ops/pallas/qmm.py
    #                 module docstring). Only the exact-f32 CPU/XLA test
    #                 path sees the 2^-9 rounding.

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.p.shape)

    @property
    def nbytes_active(self) -> int:
        return self.p.nbytes + self.d.nbytes + self.bm.nbytes

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        w = jnp.repeat(self.d.astype(dtype), 256, axis=-1) * self.p.astype(dtype)
        return w - jnp.repeat(self.bm.astype(dtype), 16, axis=-1)


_register(Q2KTurboTensor, ["p", "d", "bm"], [])


@dataclasses.dataclass
class Q3KTurboTensor:
    """Q3_K expanded to an int8 quant plane + per-16 fused f32 scales.

    p = (qlow + 4*hbit - 4) in [-4, 3]; a = d * sc per 16 columns, so the
    kernel is w = rep16(a) * p — convert + repeat + multiply, ~3 VPU ops
    per weight vs ~8 for the packed planes. 9 bits/weight of HBM vs
    3.4375 packed. Columns are in the stride-16 PERMUTED order (the per-16
    scale expansion is a lane-tile repeat, like the packed kernels).
    """

    p: jax.Array    # (..., out, in) int8, PERMUTED column order
    a: jax.Array    # (..., out, in//16) bf16 fused scale, permuted-
    #                 compatible. bf16 halves the plane's HBM share; the
    #                 scaled weight w = rep16(a)*p feeds a DEFAULT-precision
    #                 dot that truncates w to bf16 regardless, so the TPU
    #                 error class (2^-9) is unchanged — only the exact-f32
    #                 CPU/XLA test path sees the storage rounding

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.p.shape)

    @property
    def nbytes_active(self) -> int:
        return self.p.nbytes + self.a.nbytes

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        from deepseek_tpu.quant.repack import stride16_inv_perm
        n = self.p.shape[-1]
        # per-16 expansion in permuted order = tile concatenation
        a_full = jnp.concatenate([self.a.astype(dtype)] * 16, axis=-1)
        w = a_full * self.p.astype(dtype)
        return jnp.take(w, jnp.asarray(stride16_inv_perm(n)), axis=-1)


_register(Q3KTurboTensor, ["p", "a"], [])


@dataclasses.dataclass
class KNibbleTensor:
    """K-quant expanded to a 4-bit nibble plane at load time ("nibble").

    The measured sweet spot between the packed planes (2.625-3.4375 bit/w
    but VPU-bound at ~500 Gelem/s: 4 shift/mask ops per byte) and the
    int8 "turbo" planes (~650 Gelem/s at the HBM roofline of ~9 bit/w):
    two quants per byte unpack with ONE mask + ONE shift, and the Mosaic
    pipeline runs ~1000 Gelem/s (scripts/probe_int4c.py) at 5-6 bit/w —
    so full-depth (27-layer) V2-Lite-class checkpoints fit one v5e HBM
    *and* decode ~2x faster than the packed planes. (Native S4 arrays
    measured even faster — 1.4 Telem/s — but S4 jit arguments crash the
    axon dispatch path, so the plane stays uint8-packed.)

    Layout: unsigned u = q + off stored two-per-byte in the stride-16
    PERMUTED column order (quant.repack): low nibble of byte j = permuted
    column j, high nibble = permuted column j + n/2. The kernel unpack
    `concat([p & 0xF, p >> 4])` therefore lands in exactly the permuted
    order, whose per-16 scale expansion is a tile concatenation
    (pltpu.repeat). The signed/min offset never touches the per-element
    pipeline: it folds into an output-side correction dot against the
    activations' per-16 group sums,

        y = sum_c x_c * a_g(c) * u_c  -  sum_g s16_g * (off*a_g + c_g)

    (Q2_K: off=0, c = dmin*mn, the min term exactly as the turbo kernel;
    Q3_K: off=4, c=None — the -4 shift of q = u-4 becomes 4*a on the
    output side, no stored plane.) Scales are bf16 (numerically free at
    DEFAULT MXU precision, see the turbo docstrings).
    """

    p: jax.Array           # (..., out, in//2) uint8, two nibbles per byte
    a: jax.Array           # (..., out, in//16) bf16 = d*sc per 16-group
    c: object = None       # (..., out, in//16) bf16 min term, or None
    off: int = 0           # u = q + off (static)
    # rowperm > 0: the OUT rows are stored stride-16 permuted, per
    # contiguous half (rowperm = number of halves; 2 for a fused [w1;w3]
    # table). A matmul against this tensor produces outputs already in
    # `_perm_x` order per half — exactly what a downstream K-quant kernel
    # wants as its activation input. Set by loader.rowperm_expert_w13 for
    # expert FFN tables so the fused expert-chain kernel (qmm_expert_ffn)
    # and the w2 kernels skip the activation permute. dequant() restores
    # natural row order.
    rowperm: int = 0

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.p.shape[:-1]) + (self.p.shape[-1] * 2,)

    @property
    def nbytes_active(self) -> int:
        return (self.p.size + self.a.size * 2
                + (self.c.size * 2 if self.c is not None else 0))

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        from deepseek_tpu.quant.repack import stride16_inv_perm
        n2 = self.p.shape[-1]
        u = jnp.concatenate([self.p & 0xF, self.p >> 4], axis=-1)
        a16 = jnp.concatenate([self.a.astype(dtype)] * 16, axis=-1)
        w = a16 * (u.astype(dtype) - float(self.off))
        if self.c is not None:
            w = w - jnp.concatenate([self.c.astype(dtype)] * 16, axis=-1)
        w = jnp.take(w, jnp.asarray(stride16_inv_perm(2 * n2)), axis=-1)
        if self.rowperm:
            # restore natural row order: permuted position o*(mh/16)+g of
            # each half holds natural row g*16+o — the inverse is the
            # (16, mh/16) -> (mh/16, 16) reshape-transpose per half
            rows = w.shape[-2]
            mh = rows // self.rowperm
            lead = w.shape[:-2]
            w = w.reshape(*lead, self.rowperm, 16, mh // 16, w.shape[-1])
            w = w.swapaxes(-3, -2).reshape(*lead, rows, w.shape[-1])
        return w


_register(KNibbleTensor, ["p", "a", "c"], ["off", "rowperm"])


def q2k_to_nibble(qt: Q2KTensor) -> KNibbleTensor:
    """One-time load conversion Q2_K planes -> nibble layout (6 bit/w).
    The planes are already permuted; plain concat-unpack keeps the order."""
    u = jnp.concatenate([(qt.qs >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)
    n = u.shape[-1]
    p = (u[..., :n // 2] | (u[..., n // 2:] << 4)).astype(jnp.uint8)
    sc = (qt.sm & 0xF).astype(jnp.float32)
    mn = (qt.sm >> 4).astype(jnp.float32)
    a = jnp.repeat(qt.d.astype(jnp.float32), 16, axis=-1) * sc
    c = jnp.repeat(qt.dmin.astype(jnp.float32), 16, axis=-1) * mn
    return KNibbleTensor(p=p, a=a.astype(jnp.bfloat16),
                         c=c.astype(jnp.bfloat16), off=0)


def q3k_to_nibble(qt: Q3KTensor) -> KNibbleTensor:
    """One-time load conversion Q3_K planes -> nibble layout (5 bit/w).
    u = qlow + 4*hbit in [0,7]; the -4 offset is output-side (off=4)."""
    qlow = jnp.concatenate([(qt.qs >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)
    hbit = jnp.concatenate([(qt.hm >> b) & 1 for b in range(8)], axis=-1)
    u = qlow + (hbit << 2)
    n = u.shape[-1]
    p = (u[..., :n // 2] | (u[..., n // 2:] << 4)).astype(jnp.uint8)
    a = jnp.repeat(qt.d.astype(jnp.float32), 16, axis=-1) \
        * qt.sc.astype(jnp.float32)
    return KNibbleTensor(p=p, a=a.astype(jnp.bfloat16), c=None, off=4)


def q2k_to_turbo(qt: Q2KTensor) -> Q2KTurboTensor:
    """One-time load conversion Q2_K planes -> pre-scaled int8 plane in
    NATURAL column order (superblocks contiguous for the kernel's
    per-superblock output-side scaling)."""
    q = _unpack_2bit_planes(qt.qs)                       # natural, [0, 3]
    sc = (qt.sm & 0xF).astype(jnp.int32)                 # (out, n/16) natural
    mn = (qt.sm >> 4).astype(jnp.float32)
    p = (jnp.repeat(sc, 16, axis=-1) * q).astype(jnp.int8)   # exact, <= 45
    bm = jnp.repeat(qt.dmin.astype(jnp.float32), 16, axis=-1) * mn
    return Q2KTurboTensor(p=p, d=qt.d.astype(jnp.float32),
                          bm=bm.astype(jnp.bfloat16))


def q3k_to_turbo(qt: Q3KTensor) -> Q3KTurboTensor:
    """One-time load conversion Q3_K planes -> int8 plane + fused scales.

    The plane keeps the packed tensors' PERMUTED column order: position c'
    of the permuted row belongs to scale group c' mod (n/16), matching the
    kernel's tile-repeat expansion."""
    qlow = jnp.concatenate([(qt.qs >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)
    hbit = jnp.concatenate([(qt.hm >> b) & 1 for b in range(8)], axis=-1)
    p = (qlow.astype(jnp.int8) + (hbit.astype(jnp.int8) << 2) - 4)
    a = jnp.repeat(qt.d.astype(jnp.float32), 16, axis=-1) \
        * qt.sc.astype(jnp.float32)                      # (out, in//16)
    return Q3KTurboTensor(p=p, a=a.astype(jnp.bfloat16))


QTensorLike = (PlainTensor, Fp8Tensor, Q2KTensor, Q3KTensor,
               Q2KTurboTensor, Q3KTurboTensor, KNibbleTensor)


def bits_per_weight(quant: QuantKind, block_size: Tuple[int, int] = (0, 0)) -> float:
    """Storage-truth bits per weight (BASELINE.md: storage wins over the
    reference's inconsistent bits_per_weight())."""
    if quant == QuantKind.F32:
        return 32.0
    if quant == QuantKind.F16:
        return 16.0
    if quant == QuantKind.F8E5M2:
        if block_size == (0, 0):
            return 8.0
        return 8.0 + 32.0 / (block_size[0] * block_size[1])
    if quant == QuantKind.Q2_K:
        return 84 * 8 / 256
    if quant == QuantKind.Q3_K:
        return 110 * 8 / 256
    raise ValueError(quant)
