"""Fused dequant + matmul Pallas kernels.

TPU analogue of the reference's dtype-dispatched AVX2 matvec kernels
(infer.cpp:121-417): weights stream from HBM in their packed form (K-quant
bit planes / fp8 blocks), are unpacked and scaled in VMEM, and feed the MXU
— the dequantized weight never exists in HBM, so decode stays at the
quantized-bytes bandwidth roofline.

Layout invariants (deepseek_tpu.quant.repack):
- 2-bit planes: ``(qs >> (2p)) & 3`` is columns ``[p*n/4, (p+1)*n/4)`` —
  unpack is shift + lane-dim concat, no shuffles.
- 1-bit planes likewise with 8 slabs.
- per-16-column scale bytes and per-256-column f32 super scales in original
  column order (lane-broadcast via repeat).

Grid: one program per TILE_D output rows, full reduction dim per program
(activations are small; the weight tile dominates VMEM).

Precision: the big (TD, n)-sized dots run at DEFAULT MXU precision (one
bf16 pass). HIGHEST (6-pass emulated f32) measured 2.8x slower end-to-end
on v5e and buys ~2^-9 relative accuracy that is two orders of magnitude
below the 2/3-bit weight quantization error itself; max observed logit
error vs the exact f32 dequant path is ~4e-3 of the output scale. The
small K-quant scale-expansion dots stay HIGHEST (exact one-hot selection of
f32 scales, output only (TD, n/16)); the fp8 column expansion produces a
full (TD, n) array, so it runs DEFAULT like the big dot (same error class —
its bf16-truncated scales feed a bf16 multiply anyway).
"""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# trace-time evidence that the fused kernels are in the compiled graph:
# each entry point bumps its name once per jit trace. Tests and the driver
# dryrun assert on this (e.g. that the GSPMD auto-upgrade path kept the
# kernels) — reading it is cheap and it never affects compiled code.
TRACE_COUNTS: collections.Counter = collections.Counter()

from deepseek_tpu.quant.qtensor import (
    Fp8Tensor, KNibbleTensor, PlainTensor, Q2KTensor, Q2KTurboTensor,
    Q3KTensor, Q3KTurboTensor,
)


def _unpack2(planes):
    """Shift+concat unpack; result stays in the stride-16 permuted order the
    planes are packed in (quant.repack) — exactly what the kernels want."""
    p32 = planes.astype(jnp.int32)
    return jnp.concatenate([(p32 >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)


def _unpack1(planes):
    p32 = planes.astype(jnp.int32)
    return jnp.concatenate([(p32 >> b) & 1 for b in range(8)], axis=-1)


def _rep16(a):
    """Expand per-16-group values (TD, n/16) to full width (TD, n) in the
    permuted column order: position c' has group c' mod n/16, so tile
    concatenation (pltpu.repeat) is the exact expansion."""
    return pltpu.repeat(a, 16, axis=a.ndim - 1)


def _expand_super(d, n16: int):
    """(TD, n/256) per-superblock scales -> (TD, n/16) per-group, via a tiny
    one-hot matmul (Mosaic has no lane element-repeat): E[i, g] = (g//16 == i)."""
    n256 = d.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (n256, n16), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (n256, n16), 0)
    E = (gi // 16 == ii).astype(jnp.float32)
    return jax.lax.dot_general(
        d, E, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _perm_x(x, n: int):
    """Permute activations into the stride-16 column order (outside
    kernels). The permutation IS a (n/16, 16) transpose — expressed as
    reshape/swapaxes so XLA lowers it as a cheap transpose instead of a
    general gather (measured 16.4 us -> ~2 us per (1, 2048) call on v5e;
    at ~10 K-quant matmuls x 8 layers per decoded token the gather was
    ~1 ms/token, most of the quantized-vs-bf16 decode gap)."""
    lead = x.shape[:-1]
    n16 = n // 16
    return x.reshape(*lead, n16, 16).swapaxes(-1, -2).reshape(*lead, n)


import os

# per-program VMEM budget the output-tile heuristic targets (x1e6 bytes;
# working set ~6 B per weight element across the dequant pipeline).
# Default 32 MB — same-session A/B vs the old 12 MB: V3-slice nibble
# decode 377 -> 404 tok/s (+7%, td 256->512 at n=7168), full-depth 27L
# 182 -> 191 (+4.6%), 8L neutral (689 vs 686). Bigger output tiles
# amortize per-program cost at large reduction dims and stay far under
# the 128 MB hardware VMEM. DSEEK_TILE_VMEM_MB overrides for A/Bs.
_TILE_VMEM_MB = int(os.environ.get("DSEEK_TILE_VMEM_MB", "32"))


def _tile_d(d: int, n: int) -> int:
    """Output-row tile: smaller for huge reduction dims to bound VMEM.
    Grids use cdiv, so td need not divide d (partial tiles are masked).
    Bigger tiles amortize per-program overhead — td=1024 measured ~25%
    faster than 256 for bf16 expert tiles on v5e.

    Floor at 128: td is the OUTPUT block's lane dim, and Mosaic requires
    the last block dim be 128-divisible (or the full array) — td=64 fails
    to lower outright (first hit at DeepSeek-V3's hidden_dim=18432, where
    the VMEM heuristic alone would shrink below the floor; the ~14 MB
    working set at td=128 is well under the scoped-VMEM budget).

    The 1024 ceiling and the cdiv raggedness are both MEASURED optima,
    not oversights (round-4 same-session A/Bs):
    - extending the ladder to 2048/4096 for short reduction dims (w2
      n=2048 -> td 2048, V2-Lite lm_head n=2048 -> 2048) measured
      +0.6% on the V3 slice but -1% on the V2-Lite 8L headline;
    - divisor-exact tiles that eliminate masked-row waste (V3 expert w2
      7168 -> 1792x4 instead of 1024x7, V2-Lite expert w13 2816 ->
      1408x2) were likewise flat-to-negative end-to-end;
    - budgets past ~32 MB hit the 16 MB scoped-VMEM kernel-stack limit
      on big-n shapes (DSEEK_TILE_VMEM_MB=48 OOM'd the V3 wo matvec).
    The short-n shapes' 70-72%-of-roofline (vs 85-91% at n>=7168) is
    per-pair/grid machinery, not tile height — see PERFORMANCE.md
    round-4 decomposition."""
    for td in (1024, 512, 256):
        if td * n * 6 <= _TILE_VMEM_MB * 1024 * 1024:
            return td
    return 128


# ---------------------------------------------------------------------------
# kernel bodies (shared by the dense and expert-gather entry points)
# ---------------------------------------------------------------------------

def _q2k_body(x_ref, qs_ref, sm_ref, d_ref, dmin_ref, o_ref):
    # x_ref holds stride-16 PERMUTED activations (see _perm_x)
    q = _unpack2(qs_ref[...]).astype(jnp.float32)          # (TD, n) permuted
    sm = sm_ref[...].astype(jnp.int32)
    n16 = sm.shape[-1]
    s16 = _expand_super(d_ref[...], n16) * (sm & 0xF).astype(jnp.float32)
    m16 = _expand_super(dmin_ref[...], n16) * (sm >> 4).astype(jnp.float32)
    w = _rep16(s16) * q - _rep16(m16)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q3k_body(x_ref, qs_ref, hm_ref, sc_ref, d_ref, o_ref):
    # x_ref holds stride-16 PERMUTED activations (see _perm_x)
    qlow = _unpack2(qs_ref[...])
    hbit = _unpack1(hm_ref[...])
    q = (qlow + (hbit << 2) - 4).astype(jnp.float32)
    n16 = sc_ref.shape[-1]
    s16 = _expand_super(d_ref[...], n16)         * sc_ref[...].astype(jnp.int32).astype(jnp.float32)
    w = _rep16(s16) * q
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q2kt_body(x_ref, s16_ref, p_ref, d_ref, bm_ref, o_ref):
    """Q2_K turbo: int8 plane p = sc*q in NATURAL order; per-superblock
    scales apply to OUTPUT-side partial dots (y = sum_sb (x_sb . p_sb^T)
    * d[:, sb]) and the per-16 MIN term folds through the activation group
    sums s16 (one small dot). The only per-weight VPU work is the
    int8->f32 convert — the structure that took fp8 from 311 to 493 tok/s
    E2E (see _fp8_body)."""
    pf = p_ref[...].astype(jnp.float32)                    # (TD, n) natural
    x = x_ref[...]
    n = pf.shape[-1]
    d_t = d_ref[...].T                                     # (n/256, TD)
    # bm is stored bf16 — numerically free: this DEFAULT-precision dot
    # truncates f32 operands to bf16 anyway (module docstring)
    acc = -jax.lax.dot_general(
        s16_ref[...], bm_ref[...].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (TB, TD) min term
    for sb in range(n // 256):
        sl = slice(sb * 256, (sb + 1) * 256)
        part = jax.lax.dot_general(
            x[:, sl], pf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + part * d_t[sb:sb + 1]
    o_ref[...] = acc


def _q3kt_body(x_ref, p_ref, a_ref, o_ref):
    """Q3_K turbo: int8 quant plane (permuted) with fused per-16 bf16
    scales a = d*sc (bf16 storage is numerically free: the big dot below
    truncates w to bf16 at DEFAULT precision anyway). ~3 VPU ops/weight."""
    pf = p_ref[...].astype(jnp.float32)
    w = _rep16(a_ref[...].astype(jnp.float32)) * pf
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _knib_body(x_ref, s16_ref, p_ref, *rest, off: int, has_c: bool):
    """K-quant nibble plane (KNibbleTensor): ONE mask + ONE shift unpacks
    two quants per byte (vs four ops/byte for the 2-bit planes — measured
    ~1000 vs ~500 Gelem/s, scripts/probe_int4c.py); per-16 bf16 scales
    expand by tile concatenation in the permuted column order; the
    sign/min offset is an output-side dot against the activations' per-16
    group sums (s16, NATURAL order), never a per-element op."""
    if has_c:
        a_ref, c_ref, o_ref = rest
    else:
        a_ref, o_ref = rest
    pu = p_ref[...].astype(jnp.int32)                       # (TD, n/2)
    u = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1).astype(jnp.float32)
    af = a_ref[...].astype(jnp.float32)                     # (TD, n/16)
    w = pltpu.repeat(af, 16, axis=af.ndim - 1) * u          # (TD, n)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (TB, TD)
    corr = af * float(off) if off else None
    if has_c:
        cf = c_ref[...].astype(jnp.float32)
        corr = cf if corr is None else corr + cf
    if corr is not None:
        acc = acc - jax.lax.dot_general(
            s16_ref[...], corr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _group_sums(x, n: int):
    """Per-16-group sums of NATURAL-order activations x (..., n) ->
    (..., n//16), the s16 operand of the Q2_K turbo kernels."""
    return x.reshape(*x.shape[:-1], n // 16, 16).sum(axis=-1)


def _unperm_x(x, n: int):
    """Inverse of _perm_x (same cheap reshape/swapaxes transpose)."""
    lead = x.shape[:-1]
    n16 = n // 16
    return x.reshape(*lead, 16, n16).swapaxes(-1, -2).reshape(*lead, n)


def _group_sums_perm(x, n: int):
    """Per-16-group sums (natural group order) of activations already in
    stride-16 PERMUTED order: un-permute with the cheap transpose pattern
    and reduce naturally — the SAME one-transpose cost as the natural
    path's _perm_x. Two rejected formulations (round-5 chip A/Bs): the
    direct reshape (…, 16, n/16).sum(-2) lowered to a pathological
    relayout (8L decode 682 -> 365 tok/s), and 16 static lane slices +
    adds cost batched decode 15% (B=8: 1382 vs 1620 tok/s — sub-128-lane
    slice padding)."""
    return _group_sums(_unperm_x(x, n), n)


def _fp8_body(x_ref, w_ref, s_ref, o_ref, *, b0: int, b1: int):
    w = w_ref[...].astype(jnp.float32)                      # (td, n)
    # load the whole block, then squeeze on the VALUE: a ref slice whose
    # lane extent (n/b1) is below the 128 tiling fails Mosaic lowering
    scale = s_ref[...][:, 0, :]                             # (td/b0, n/b1)
    td, n = w.shape
    x = x_ref[...]
    # row-block scale expansion via a small one-hot matmul (no lane
    # element-repeats on TPU)
    ri = jax.lax.broadcasted_iota(jnp.int32, (td, td // b0), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (td, td // b0), 1)
    Er = (ri // b0 == rj).astype(jnp.float32)
    s_rows = jax.lax.dot_general(
        Er, scale, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                 # (td, n/b1)
    # scale per-COLUMN-BLOCK partial dots on the output side instead of
    # materializing a (td, n) scale grid and a scaled weight copy in VMEM:
    # y = sum_cb (x_cb . w_cb^T) * s_rows[:, cb]. VPU work drops from ~2
    # ops/weight to just the fp8->f32 convert; each block dot contracts a
    # full 128 lanes on the MXU.
    s_rows_t = s_rows.T                                     # (n/b1, td)
    acc = None
    for cb in range(n // b1):
        sl = slice(cb * b1, (cb + 1) * b1)
        part = jax.lax.dot_general(
            x[:, sl], w[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (TB, td)
        part = part * s_rows_t[cb:cb + 1]
        acc = part if acc is None else acc + part
    o_ref[...] = acc


# ---------------------------------------------------------------------------
# dense entry point
# ---------------------------------------------------------------------------

def _x2d(x):
    lead = x.shape[:-1]
    return x.reshape(-1, x.shape[-1]), lead


_PLAIN_PALLAS_MIN_BYTES = 32 * 1024 * 1024


def _plain_body(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmm(qt, x, interpret: bool = False):
    """x (..., n) @ W(out, n).T -> (..., out) f32, fused dequant on TPU."""
    TRACE_COUNTS["qmm"] += 1
    x2, lead = _x2d(x)
    B, n = x2.shape
    x2 = x2.astype(jnp.float32)

    if isinstance(qt, PlainTensor):
        d = qt.shape[-2]
        # big unquantized matvecs (the lm_head) go through a tiled Pallas
        # kernel: 763 vs 655 GB/s measured at (102400, 2048) — XLA's matvec
        # leaves ~15% on the table. Small/in-layer matmuls stay einsum so
        # XLA can fuse them with neighbors (layers measure ~98% of HBM
        # roofline already).
        if (B <= 8 and n % 128 == 0 and d % 128 == 0
                and qt.data.nbytes >= _PLAIN_PALLAS_MIN_BYTES):
            td = min(512, d)
            out = pl.pallas_call(
                _plain_body, grid=(pl.cdiv(d, td),),
                out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
                in_specs=[pl.BlockSpec((B, n), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((td, n), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, td), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(x2, qt.data)
            return out.reshape(*lead, -1)
        out = jnp.einsum("bn,dn->bd", x2, qt.data.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return out.reshape(*lead, -1)

    d = qt.shape[-2]
    td = min(_tile_d(d, n), d)
    # batch tiling keeps large-B (prefill chunk) activations inside VMEM;
    # the B axis iterates fastest so each weight tile is fetched once and
    # revisited in place while batch tiles stream through
    tb = B if B <= 128 else 128
    grid = (pl.cdiv(d, td), pl.cdiv(B, tb))
    xspec = pl.BlockSpec((tb, n), lambda i, b: (b, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((tb, td), lambda i, b: (b, i), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, d), jnp.float32)

    def wspec(cols):
        return pl.BlockSpec((td, cols), lambda i, b: (i, 0),
                            memory_space=pltpu.VMEM)

    if isinstance(qt, Q2KTensor):
        out = pl.pallas_call(
            _q2k_body, grid=grid, out_shape=oshape,
            in_specs=[xspec, wspec(n // 4), wspec(n // 16),
                      wspec(n // 256), wspec(n // 256)],
            out_specs=ospec, interpret=interpret,
        )(_perm_x(x2, n), qt.qs, qt.sm, qt.d, qt.dmin)
    elif isinstance(qt, Q3KTensor):
        out = pl.pallas_call(
            _q3k_body, grid=grid, out_shape=oshape,
            in_specs=[xspec, wspec(n // 4), wspec(n // 8),
                      wspec(n // 16), wspec(n // 256)],
            out_specs=ospec, interpret=interpret,
        )(_perm_x(x2, n), qt.qs, qt.hm, qt.sc, qt.d)
    elif isinstance(qt, Q2KTurboTensor):
        s16 = _group_sums(x2, n)
        s16spec = pl.BlockSpec((tb, n // 16), lambda i, b: (b, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _q2kt_body, grid=grid, out_shape=oshape,
            in_specs=[xspec, s16spec, wspec(n), wspec(n // 256),
                      wspec(n // 16)],
            out_specs=ospec, interpret=interpret,
        )(x2, s16, qt.p, qt.d, qt.bm)
    elif isinstance(qt, Q3KTurboTensor):
        out = pl.pallas_call(
            _q3kt_body, grid=grid, out_shape=oshape,
            in_specs=[xspec, wspec(n), wspec(n // 16)],
            out_specs=ospec, interpret=interpret,
        )(_perm_x(x2, n), qt.p, qt.a)
    elif isinstance(qt, KNibbleTensor):
        s16 = _group_sums(x2, n)
        s16spec = pl.BlockSpec((tb, n // 16), lambda i, b: (b, 0),
                               memory_space=pltpu.VMEM)
        has_c = qt.c is not None
        specs = [xspec, s16spec, wspec(n // 2), wspec(n // 16)]
        args = [_perm_x(x2, n), s16, qt.p, qt.a]
        if has_c:
            specs.append(wspec(n // 16))
            args.append(qt.c)
        out = pl.pallas_call(
            functools.partial(_knib_body, off=qt.off, has_c=has_c),
            grid=grid, out_shape=oshape,
            in_specs=specs, out_specs=ospec, interpret=interpret,
        )(*args)
    elif isinstance(qt, Fp8Tensor):
        b0, b1 = qt.block_size
        if (b0, b1) == (0, 0):
            w = qt.data.astype(jnp.float32) * qt.scale
            out = jnp.einsum("bn,dn->bd", x2, w,
                             preferred_element_type=jnp.float32)
            return out.reshape(*lead, -1)
        assert d % b0 == 0 and n % b1 == 0, "fp8 block grid must divide dims"
        td = max(td - td % b0, b0)
        td = min(td, d)
        grid = (pl.cdiv(d, td), pl.cdiv(B, tb))
        ospec = pl.BlockSpec((tb, td), lambda i, b: (b, i),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_fp8_body, b0=b0, b1=b1),
            grid=grid, out_shape=oshape,
            in_specs=[
                xspec,
                pl.BlockSpec((td, n), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((td // b0, 1, n // b1), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=ospec, interpret=interpret,
        )(x2, qt.data, qt.scale[:, None, :])
    else:
        raise TypeError(type(qt))
    return out.reshape(*lead, d)


# ---------------------------------------------------------------------------
# grouped-tile entry point (quantized MoE prefill)
# ---------------------------------------------------------------------------

def _tile_squeeze(body):
    """Adapt a 2-D kernel body to grouped-tile blocks: x (1, TB, n) -> (TB,
    n); weight fields (1, rows, cols) -> (rows, cols); out (1, TB, td)."""
    def f(tile_expert_ref, x_ref, *refs):
        o_ref = refs[-1]
        body(x_ref.at[0], *[r.at[0] for r in refs[:-1]], o_ref.at[0])
    return f


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmm_grouped(qt, tile_expert, x_tiles, interpret: bool = False,
                s16_tiles=None):
    """Ragged grouped matmul over quantized experts (MoE prefill).

    W (E, out, n) packed; tile_expert (G,) int32 maps each 128-row token
    tile to the expert all of its rows belong to (built by the counting
    dispatch in ops.matmul.grouped_expert_ffn); x_tiles (G, TB, n) f32
    (stride-16 PERMUTED for K-quants) -> (G, TB, out) f32. Q2_K turbo
    additionally takes ``s16_tiles`` (G, TB, n//16) per-16 group sums of
    the NATURAL-order rows.

    Each expert's packed bytes are DMA'd once per row tile that touches it
    (~1 tile per expert at typical chunk sizes), and the dequantized weight
    lives only in VMEM — unlike megablox gmm, whose dense rhs would force a
    full dequant materialization in HBM per layer per chunk.
    """
    TRACE_COUNTS["qmm_grouped"] += 1
    G, TB, n = x_tiles.shape
    x_tiles = x_tiles.astype(jnp.float32)
    E, d = qt.shape[0], qt.shape[-2]
    td = min(_tile_d(d, n), d)

    if isinstance(qt, Q2KTensor):
        cols = (n // 4, n // 16, n // 256, n // 256)
        fields = (qt.qs, qt.sm, qt.d, qt.dmin)
        body = _q2k_body
    elif isinstance(qt, Q3KTensor):
        cols = (n // 4, n // 8, n // 16, n // 256)
        fields = (qt.qs, qt.hm, qt.sc, qt.d)
        body = _q3k_body
    elif isinstance(qt, Q2KTurboTensor):
        assert s16_tiles is not None
        cols = (n, n // 256, n // 16)
        fields = (qt.p, qt.d, qt.bm)
        body = _q2kt_body
    elif isinstance(qt, Q3KTurboTensor):
        cols = (n, n // 16)
        fields = (qt.p, qt.a)
        body = _q3kt_body
    elif isinstance(qt, KNibbleTensor):
        assert s16_tiles is not None
        if qt.c is not None:
            cols = (n // 2, n // 16, n // 16)
            fields = (qt.p, qt.a, qt.c)
        else:
            cols = (n // 2, n // 16)
            fields = (qt.p, qt.a)
        body = functools.partial(_knib_body, off=qt.off,
                                 has_c=qt.c is not None)
    elif isinstance(qt, PlainTensor):
        cols = (n,)
        fields = (qt.data,)
        body = _plain_body
    elif isinstance(qt, Fp8Tensor):
        b0, b1 = qt.block_size
        assert (b0, b1) != (0, 0), "per-tensor fp8 unsupported in kernel"
        assert d % b0 == 0 and n % b1 == 0
        td = min(max(td - td % b0, b0), d)
        fields = (qt.data, qt.scale[:, :, None, :])
        body = functools.partial(_fp8_body, b0=b0, b1=b1)
    else:
        raise TypeError(type(qt))

    grid = (G, pl.cdiv(d, td))
    in_specs = [pl.BlockSpec((1, TB, n), lambda g, j, te: (g, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x_tiles]
    if isinstance(qt, (Q2KTurboTensor, KNibbleTensor)):
        in_specs.append(pl.BlockSpec((1, TB, n // 16),
                                     lambda g, j, te: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(s16_tiles.astype(jnp.float32))
    if isinstance(qt, Fp8Tensor):
        in_specs += [
            pl.BlockSpec((1, td, n), lambda g, j, te: (te[g], j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td // b0, 1, n // b1),
                         lambda g, j, te: (te[g], j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        for f, c in zip(fields, cols):
            blk_rows = td if f.shape[-2] == d else td * f.shape[-2] // d
            in_specs.append(pl.BlockSpec(
                (1, blk_rows, c), lambda g, j, te: (te[g], j, 0),
                memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, TB, td), lambda g, j, te: (g, 0, j),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _tile_squeeze(body),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec),
        out_shape=jax.ShapeDtypeStruct((G, TB, d), jnp.float32),
        interpret=interpret,
    )(tile_expert.astype(jnp.int32), *args, *fields)


# ---------------------------------------------------------------------------
# expert-gather entry point (MoE decode)
# ---------------------------------------------------------------------------

def _squeeze_body(body):
    """Adapt a 2-D kernel body to the singleton block dims:
    x (1,1,n)->.at[0] (1,n); weights (1,r,c)->.at[0] (r,c);
    out (1,1,td)->.at[0] (1,td). The singleton penultimate dim keeps
    Mosaic's last-two-dims block rule satisfied (1 == full dim)."""
    def f(idx_ref, x_ref, *refs):
        o_ref = refs[-1]
        sq = [r.at[0] for r in refs[:-1]]
        body(x_ref.at[0], *sq, o_ref.at[0])
    return f


@functools.partial(jax.jit, static_argnames=("interpret", "pair_major",
                                             "x_prepermuted"))
def qmm_experts(qt, idx, x, interpret: bool = False,
                pair_major: bool = False, x_prepermuted: bool = False):
    """Gathered-expert matmul for MoE decode (matmul_expert analogue,
    infer.cpp:423-469).

    W (E, out, n) packed; idx (B, k) int32 per-token expert ids;
    x (B, k, n) per-slot activations -> (B, k, out) f32.

    Only the selected experts' packed bytes are DMA'd: the expert index
    enters the weight BlockSpec index_map via scalar prefetch, so HBM
    traffic is k experts per token — not all E (which is what an XLA gather
    of stacked experts degenerates to).

    Grid order trades two overheads (round-4 A/B, PERFORMANCE.md):

    - default (pair INNERMOST: fixed output tile j, pairs sweep): Mosaic
      skips the weight-tile DMA whenever the index map repeats between
      consecutive iterations, so callers that sort the pair list by
      expert id (ops.matmul / parallel.spmd EP dispatch) pay HBM traffic
      per DISTINCT expert, not per pair — batched decode (same expert
      hit by many tokens) and EP shards (dead pairs aliased to one live
      expert) read each expert once. The cost: the small x/s16/out
      blocks re-DMA every grid step.
    - ``pair_major`` (pair OUTERMOST): x/s16 load once per pair and the
      weight stream walks each expert's tiles sequentially — the dense-
      matvec pattern, ~91% of the byte roofline vs ~70-85% pair-minor.
      Correct for SINGLE-token decode at ep == 1, where the sorted pair
      list is all-distinct (top-k + shared) and there is nothing to
      elide; wrong whenever expert repeats are possible (batched decode,
      EP dead-pair aliasing, verify chunks) — repeats would re-stream
      the whole expert per pair.
    """
    TRACE_COUNTS["qmm_experts"] += 1
    B, k, n = x.shape
    x = x.astype(jnp.float32)
    s16 = None
    if x_prepermuted:
        # x already in stride-16 permuted order (produced by a rowperm
        # weight table — see KNibbleTensor.rowperm); only layouts that
        # consume permuted activations qualify
        assert isinstance(qt, (Q2KTensor, Q3KTensor, Q3KTurboTensor,
                               KNibbleTensor)), type(qt)
        if isinstance(qt, KNibbleTensor):
            s16 = _group_sums_perm(x, n).reshape(B * k, 1, n // 16)
    else:
        if isinstance(qt, (Q2KTurboTensor, KNibbleTensor)):
            s16 = _group_sums(x, n).reshape(B * k, 1, n // 16)
        if isinstance(qt, (Q2KTensor, Q3KTensor, Q3KTurboTensor,
                           KNibbleTensor)):
            x = _perm_x(x, n)       # Q2 turbo consumes NATURAL order
    N = B * k
    x = x.reshape(N, 1, n)                     # pair-flat: see _squeeze_body
    idx = idx.reshape(N)
    E, d = qt.shape[0], qt.shape[-2]
    td = min(_tile_d(d, n), d)

    if isinstance(qt, Q2KTensor):
        cols = (n // 4, n // 16, n // 256, n // 256)
        fields = (qt.qs, qt.sm, qt.d, qt.dmin)
        body = _q2k_body
    elif isinstance(qt, Q3KTensor):
        cols = (n // 4, n // 8, n // 16, n // 256)
        fields = (qt.qs, qt.hm, qt.sc, qt.d)
        body = _q3k_body
    elif isinstance(qt, Q2KTurboTensor):
        cols = (n, n // 256, n // 16)
        fields = (qt.p, qt.d, qt.bm)
        body = _q2kt_body
    elif isinstance(qt, Q3KTurboTensor):
        cols = (n, n // 16)
        fields = (qt.p, qt.a)
        body = _q3kt_body
    elif isinstance(qt, KNibbleTensor):
        if qt.c is not None:
            cols = (n // 2, n // 16, n // 16)
            fields = (qt.p, qt.a, qt.c)
        else:
            cols = (n // 2, n // 16)
            fields = (qt.p, qt.a)
        body = functools.partial(_knib_body, off=qt.off,
                                 has_c=qt.c is not None)
    elif isinstance(qt, PlainTensor):
        cols = (n,)
        fields = (qt.data,)

        def body(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[...].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    elif isinstance(qt, Fp8Tensor):
        b0, b1 = qt.block_size
        assert (b0, b1) != (0, 0), "per-tensor fp8 experts unsupported in kernel"
        assert d % b0 == 0 and n % b1 == 0, "fp8 block grid must divide dims"
        td = min(max(td - td % b0, b0), d)
        # scale gets a singleton penultimate dim (Mosaic block rules)
        fields = (qt.data, qt.scale[:, :, None, :])

        def body(x_ref, w_ref, s_ref, o_ref):
            _fp8_body(x_ref, w_ref, s_ref, o_ref, b0=b0, b1=b1)
    else:
        raise TypeError(type(qt))

    if pair_major:
        grid = (N, pl.cdiv(d, td))
        def pair_map(p, j, idx):
            return (p, 0, 0)
        def wmap(p, j, idx):
            return (idx[p], j, 0)
        def w4map(p, j, idx):
            return (idx[p], j, 0, 0)
        def omap(p, j, idx):
            return (p, 0, j)
    else:
        grid = (pl.cdiv(d, td), N)
        def pair_map(j, p, idx):
            return (p, 0, 0)
        def wmap(j, p, idx):
            return (idx[p], j, 0)
        def w4map(j, p, idx):
            return (idx[p], j, 0, 0)
        def omap(j, p, idx):
            return (p, 0, j)

    in_specs = [pl.BlockSpec((1, 1, n), pair_map, memory_space=pltpu.VMEM)]
    args = [x]
    if s16 is not None:                        # Q2_K turbo group sums
        in_specs.append(pl.BlockSpec((1, 1, n // 16), pair_map,
                                     memory_space=pltpu.VMEM))
        args.append(s16)
    if isinstance(qt, Fp8Tensor):
        in_specs += [
            pl.BlockSpec((1, td, n), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td // b0, 1, n // b1), w4map,
                         memory_space=pltpu.VMEM),
        ]
    else:
        for f, c in zip(fields, cols):
            blk_rows = td if f.shape[-2] == d else td * f.shape[-2] // d
            in_specs.append(pl.BlockSpec(
                (1, blk_rows, c), wmap, memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, 1, td), omap, memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((N, 1, d), jnp.float32)

    out = pl.pallas_call(
        _squeeze_body(body),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec),
        out_shape=oshape, interpret=interpret,
    )(idx.astype(jnp.int32), *args, *fields)
    return out.reshape(B, k, d)


# ---------------------------------------------------------------------------
# fused expert FFN chain (single-token MoE decode)
# ---------------------------------------------------------------------------

# combined working-set budget for the fused expert-chain kernel (both
# phases' pipelines coexist; each phase gets half). Default 48 MB —
# measured on-chip at V3 expert shapes (probe_fused_ffn, round 5):
# 48 MB picks td13=512/td2=1024 -> 326 us (760 GB/s of layout bytes, 93%
# of roofline, 1.14x the 3-dispatch chain); 32 MB drops td13 to 256 and
# LOSES to the chain (414 us); 96 MB (td13=1024) fails the scoped-VMEM
# compile. DSEEK_FFN_VMEM_MB overrides for A/Bs.
_FFN_VMEM_MB = int(os.environ.get("DSEEK_FFN_VMEM_MB", "48"))


def _ffn_tile(rows: int, n: int, budget_mb: float) -> int:
    """Largest ladder tile that divides ``rows`` within the VMEM budget
    (the fused kernel keeps BOTH weight pipelines resident, so each phase
    gets roughly half the usual budget). 0 if nothing divides."""
    for td in (1024, 512, 256, 128):
        if rows % td == 0 and td * n * 6 <= budget_mb * 1024 * 1024:
            return td
    return 0


def expert_ffn_fusable(qt13, qt2) -> bool:
    """Static predicate for the fused expert-chain kernel: both tables in
    the nibble layout, w13 row-permuted (KNibbleTensor.rowperm — h leaves
    phase 1 in the activation order phase 2 consumes), ladder tiles that
    divide both row counts, and 128-lane-clean plane widths."""
    # OPT-IN (DSEEK_FUSED_FFN=1): measured end-to-end NEUTRAL at V3
    # decode (405 vs 404 tok/s) and ~-2.5% at V2-Lite-8L (672 vs 690
    # mean) despite the kernel-level win (PERFORMANCE.md round-5 write-up:
    # the 3-dispatch chain's glue is already hidden by program-level
    # overlap on stream-bound decode). Kept for hardware/workloads where
    # dispatch overhead is NOT hidden; correctness is test- and
    # smoke-pinned either way.
    if not os.environ.get("DSEEK_FUSED_FFN"):
        return False
    if not (isinstance(qt13, KNibbleTensor) and isinstance(qt2, KNibbleTensor)):
        return False
    if qt13.rowperm != 2:
        return False
    m2, n = qt13.shape[-2], qt13.shape[-1]
    d, mh = qt2.shape[-2], qt2.shape[-1]
    if m2 != 2 * mh or mh % 256 != 0 or n % 256 != 0:
        return False
    half = _FFN_VMEM_MB / 2
    return _ffn_tile(m2, n, half) > 0 and _ffn_tile(d, mh, half) > 0


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def qmm_expert_ffn(qt13, qt2, idx, x, wts, act, interpret: bool = False):
    """Single-dispatch fused MoE expert chain for one-token decode:

        y = sum_p wts[p] * ( glu(x @ w1_e(p).T, x @ w3_e(p).T) @ w2_e(p).T )

    (reference runs the whole expert in one loop pass, infer.cpp:853-878;
    the 3-kernel formulation here cost one launch per projection plus an
    HBM round trip of h and an XLA segment-sum).

    qt13 (E, 2m, n) KNibbleTensor with rowperm=2 — its outputs land in
    `_perm_x` order per half, so the intermediate h never needs a lane
    permute; qt2 (E, d, m) KNibbleTensor (natural rows, permuted-column
    planes). idx (N,) int32 expert ids, x (1, n) NATURAL activations,
    wts (N,) f32 routing weights (dead pairs carry 0).

    Grid (w13-tiles then w2-tiles OUTER, pairs inner — the same pair-minor
    order as the 3-kernel chain, so the DMA pipeline never stalls on a
    per-pair phase switch): the w13 phase streams every pair's tiles into
    a VMEM h2 scratch, the phase boundary computes GLU + the per-16 group
    sums of h per pair (once, at each pair's first w2 visit), and the w2
    phase accumulates the wts-weighted output into map-revisited
    (1, 1, td2) output blocks (for a fixed tile row the pair sweep
    revisits the same block, so accumulation is plain static stores; one
    flush per tile row) — h and the per-pair partials never touch HBM. During the w13 phase the w2 index map is held constant (and vice
    versa), so Mosaic's repeat-map DMA elision keeps weight traffic at
    exactly one pass per pair.
    Returns (1, d) f32 — the combined mixture (no segment-sum needed).
    """
    TRACE_COUNTS["qmm_expert_ffn"] += 1
    from deepseek_tpu.ops.activations import glu_act

    assert expert_ffn_fusable(qt13, qt2)
    m2, n = qt13.shape[-2], qt13.shape[-1]
    mh = m2 // 2
    d = qt2.shape[-2]
    N = int(idx.shape[0])
    half = _FFN_VMEM_MB / 2
    td13 = _ffn_tile(m2, n, half)
    td2 = _ffn_tile(d, mh, half)
    J13, J2 = m2 // td13, d // td2
    n16, mh16 = n // 16, mh // 16
    has_c13 = qt13.c is not None
    has_c2 = qt2.c is not None
    off13, off2 = float(qt13.off), float(qt2.off)

    x2 = x.reshape(1, n).astype(jnp.float32)
    xp = _perm_x(x2, n)
    s16x = _group_sums(x2, n)

    def x_map(j, p, idx):
        return (0, 0)

    def w13_map(j, p, idx):
        # held at the last-visited tile during the w2 phase (map repeat ->
        # DMA elided; pair N-1's last tile was the final phase-1 fetch)
        pp = jnp.where(j < J13, p, N - 1)
        return (idx[pp], jnp.minimum(j, J13 - 1), 0)

    def w2_map(j, p, idx):
        # held at pair 0's first tile during the w13 phase (one early
        # prefetch that phase 2 immediately uses)
        pp = jnp.where(j < J13, 0, p)
        return (idx[pp], jnp.maximum(j - J13, 0), 0)

    in_specs = [
        pl.BlockSpec((1, n), x_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n16), x_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),              # wts, whole
        pl.BlockSpec((1, td13, n // 2), w13_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, td13, n16), w13_map, memory_space=pltpu.VMEM),
    ]
    args = [xp, s16x, wts.astype(jnp.float32), qt13.p, qt13.a]
    if has_c13:
        in_specs.append(pl.BlockSpec((1, td13, n16), w13_map,
                                     memory_space=pltpu.VMEM))
        args.append(qt13.c)
    in_specs += [
        pl.BlockSpec((1, td2, mh // 2), w2_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, td2, mh16), w2_map, memory_space=pltpu.VMEM),
    ]
    args += [qt2.p, qt2.a]
    if has_c2:
        in_specs.append(pl.BlockSpec((1, td2, mh16), w2_map,
                                     memory_space=pltpu.VMEM))
        args.append(qt2.c)

    # one (1, 1, td2) output block per w2 tile row: for a fixed jj the
    # pair sweep revisits the SAME block (map repeat -> buffer persists,
    # accumulation across pairs is plain static stores); the block flushes
    # once, when jj advances. Held at block 0 during the w13 phase.
    out_spec = pl.BlockSpec(
        (1, 1, td2),
        lambda j, p, idx: (jnp.maximum(j - J13, 0), 0, 0),
        memory_space=pltpu.VMEM)

    def knib_row(x_row, s16_row, pref, aref, cref, off):
        pu = pref[0].astype(jnp.int32)
        u = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1).astype(jnp.float32)
        af = aref[0].astype(jnp.float32)
        w = pltpu.repeat(af, 16, axis=1) * u
        acc = jax.lax.dot_general(
            x_row, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        corr = af * off if off else None
        if cref is not None:
            cf = cref[0].astype(jnp.float32)
            corr = cf if corr is None else corr + cf
        if corr is not None:
            acc = acc - jax.lax.dot_general(
                s16_row, corr, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    def body(idx_ref, x_ref, s16x_ref, wts_ref, *refs):
        k13 = 3 if has_c13 else 2
        k2 = 3 if has_c2 else 2
        f13 = refs[:k13]
        f2 = refs[k13:k13 + k2]
        o_ref = refs[k13 + k2]
        h2_scr, h_scr, s16h_scr = refs[k13 + k2 + 1:]
        j = pl.program_id(0)
        p = pl.program_id(1)

        @pl.when(j < J13)
        def _w13_phase():
            acc = knib_row(x_ref[...], s16x_ref[...], f13[0], f13[1],
                           f13[2] if has_c13 else None, off13)
            h2_scr[j, p] = acc                               # (1, td13)

        @pl.when(j >= J13)
        def _w2_phase():
            jj = j - J13

            @pl.when(jj == 0)
            def _glu():
                h2 = jnp.concatenate([h2_scr[i, p] for i in range(J13)],
                                     axis=-1)                # (1, 2m)
                g = glu_act(h2[:, :mh], h2[:, mh:], act)
                g = g.astype(jnp.float32) * wts_ref[p]       # fold routing wt
                h_scr[p] = g
                # natural per-16 group sums of the PERMUTED h: group g's
                # members sit at permuted positions {o*(m/16)+g} — 16
                # static lane slabs summed (exact, no matmul)
                s = g[:, :mh16]
                for o in range(1, 16):
                    s = s + g[:, o * mh16:(o + 1) * mh16]
                s16h_scr[p] = s

            acc = knib_row(h_scr[p], s16h_scr[p], f2[0], f2[1],
                           f2[2] if has_c2 else None, off2)

            @pl.when(p == 0)
            def _init():
                o_ref[...] = acc[None]

            @pl.when(p > 0)
            def _acc():
                o_ref[...] = o_ref[...] + acc[None]

    out = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(J13 + J2, N),
            in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((J13, N, 1, td13), jnp.float32),
                pltpu.VMEM((N, 1, mh), jnp.float32),
                pltpu.VMEM((N, 1, mh16), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((J2, 1, td2), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), *args)
    return out.reshape(1, d)
