"""Pallas decode-attention kernels (flash-decode over the ring KV cache).

TPU analogue of the reference's per-head attention kernels
(``attn`` infer.cpp:728-762, ``attn_mla`` infer.cpp:766-804): one pass over
the KV cache per step, online-softmax accumulation in VMEM, scores never
materialized in HBM. The MLA kernel is MQA-shaped — one (kv_lora_rank +
rope) cache tile serves all heads, so each cache byte is read exactly once
per decode step and the kernel runs at the KV-bytes bandwidth roofline.

``kv_len`` masks the valid prefix of the static-shape ring buffer per
sequence (no dynamic shapes): positions >= kv_len[b] contribute nothing.

int8 caches (kv_cache_dtype: int8) pass per-row f32 scales; the scale is
folded into the score/probability rows (lane-aligned (H, TS) multiplies)
instead of dequantizing the (TS, D) tiles:
  score_s = (q . k8_s) * scale_s     and     out = sum_s (p_s * scale_s) k8_s
so the quantized tile feeds the MXU directly and decode runs at the
int8-bytes roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_tile(S: int, row_bytes: int, budget: int = 4 * 1024 * 1024) -> int:
    """KV-tile length: big enough to amortize, small enough to double-buffer.
    The ladder extends down to 8 rows so large-head MHA tiles (all H heads
    per tile) still fit the VMEM budget."""
    for ts in (1024, 512, 256, 128, 64, 32, 16, 8):
        if ts <= S and row_bytes * ts <= budget:
            return ts
    return min(S, 8)


def _pick_head_chunk(H: int, fits) -> int:
    """Head-split chunk for the (…, hc, D) blocks: Mosaic's block rule needs
    the penultimate dim to be a multiple of 8 OR equal to the full array
    dim, so valid chunks are H itself or 8-multiple divisors of H. Picks
    the largest valid chunk passing ``fits`` (a VMEM-budget predicate);
    falls back to the smallest valid chunk when none fit."""
    cands = [H] + [d for d in range(H - 1, 0, -1)
                   if H % d == 0 and d % 8 == 0]
    for hc in cands:
        if fits(hc):
            return hc
    return cands[-1]


# The prefill kernels raise Mosaic's scoped-VMEM stack limit from the
# 16MB default (v5e has 128MB of VMEM; JAX's own flash kernels do the
# same). Tile sizing targets ~half of it: the residency model below
# underestimates Mosaic's true scoped allocation by up to ~1.4x
# (measured on-chip), so the 2x slack keeps compiles safe.
_PREFILL_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_hc_ts(H: int, S: int, ts_max: int, vmem) -> tuple:
    """Joint (head-chunk, KV-tile) choice for the prefill kernels under the
    scoped-VMEM stack limit. KV HBM re-reads scale with H/hc (the
    cache streams once per head group), so maximize hc first; ts only
    amortizes grid overhead, so take the largest that still fits (but
    don't shrink below 128 rows to buy a bigger hc). ``vmem(hc, ts)``
    models the kernel's resident bytes; budget leaves 2x slack under
    ``_PREFILL_VMEM_LIMIT``."""
    budget = _PREFILL_VMEM_LIMIT // 2
    cands = [H] + [d for d in range(H - 1, 0, -1)
                   if H % d == 0 and d % 8 == 0]
    ladder = [t for t in (1024, 512, 256, 128, 64, 32, 16, 8)
              if t <= max(ts_max, 8)]
    for hc in cands:
        for ts in ladder:
            if vmem(hc, ts) <= budget and (ts >= 128 or ts >= S):
                return hc, ts
    hc = cands[-1]
    for ts in ladder:
        if vmem(hc, ts) <= budget:
            return hc, ts
    return hc, ladder[-1]


def _mla_body(kvlen_ref, qc_ref, qr_ref, ckv_ref, kr_ref, *rest,
              ts: int, s_len: int, scale: float, quantized: bool,
              partials: bool = False):
    if quantized:
        ckvs_ref, krs_ref, *outs = rest
    else:
        outs = list(rest)
    if partials:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs
    else:
        o_ref, m_ref, l_ref, acc_ref = outs
    b, si = pl.program_id(0), pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(si == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ckv = ckv_ref[0].astype(jnp.float32)                    # (TS, R)
    kr = kr_ref[0].astype(jnp.float32)                      # (TS, P)
    if quantized:
        ckvs = ckvs_ref[0]                                  # (1, TS)
    if s_len % ts:
        # last tile reads past the array: padded rows/lanes may hold NaN
        # garbage, and 0 * NaN = NaN in the value matmul — zero them out
        rpos = si * ts + jax.lax.broadcasted_iota(jnp.int32, ckv.shape, 0)
        ckv = jnp.where(rpos < s_len, ckv, 0.0)
        if quantized:
            cpos = si * ts + jax.lax.broadcasted_iota(
                jnp.int32, ckvs.shape, 1)
            ckvs = jnp.where(cpos < s_len, ckvs, 0.0)
    qc = qc_ref[0]                                          # (H, R)
    qr = qr_ref[0]                                          # (H, P)

    s = jax.lax.dot_general(
        qc, ckv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sr = jax.lax.dot_general(
        qr, kr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if quantized:
        # per-row cache scales fold into the score rows (lane-aligned)
        s = s * ckvs + sr * krs_ref[0]                      # (H,TS)*(1,TS)
    else:
        s = s + sr
    s = s * scale                                           # (H, TS)

    pos = si * ts + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = pos < kvlen_ref[b]
    s = jnp.where(mask, s, _NEG_INF)

    m_old = m_ref[...]                                      # (H, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if quantized:
        # fold the value-side dequant into p as well: out = (p*scale) @ k8
        p = p * ckvs
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, ckv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(si == last)
    def _():
        if partials:
            # unnormalized accumulator + flash stats for seq-parallel merge;
            # an all-masked shard produces acc=0, l=0, m=-inf (harmless)
            o_ref[0] = acc_ref[...]
            mo_ref[0] = m_ref[...]
            lo_ref[0] = l_ref[...]
        else:
            o_ref[0] = acc_ref[...] / l_ref[...]


@functools.partial(jax.jit, static_argnames=("softmax_scale", "interpret",
                                             "partials"))
def mla_decode_attn(q_c, q_rope, ckv_cache, krope_cache, kv_len,
                    softmax_scale: float, ckv_scale=None, krope_scale=None,
                    interpret: bool = False, partials: bool = False):
    """Absorbed-MLA decode attention (attn_mla, infer.cpp:766-804).

    q_c (B,H,R) f32, q_rope (B,H,P) f32, ckv_cache (B,S,R), krope_cache
    (B,S,P), kv_len (B,) int32 -> attended latents (B,H,R) f32.
    For int8 caches pass per-row scales ckv_scale/krope_scale (B,S) f32.
    """
    B, H, R = q_c.shape
    P = q_rope.shape[-1]
    S = ckv_cache.shape[1]
    quantized = ckv_scale is not None
    ts = _pick_tile(S, (R + P) * ckv_cache.dtype.itemsize)
    if quantized:
        # scale blocks put ts in the LANE dim: Mosaic needs a multiple of
        # 128 (or the full extent) there
        ts = max(ts, min(S, 128))
    grid = (B, pl.cdiv(S, ts))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))

    in_specs = [
        pl.BlockSpec((1, H, R), lambda b, s, kl: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, P), lambda b, s, kl: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, R), lambda b, s, kl: (b, s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, P), lambda b, s, kl: (b, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [kv_len, q_c.astype(jnp.float32), q_rope.astype(jnp.float32),
            ckv_cache, krope_cache]
    if quantized:
        # scales reshape to (B, 1, S): the singleton penultimate dim keeps
        # Mosaic's last-two-dims block rule satisfied (block 1 == full dim)
        in_specs += [pl.BlockSpec((1, 1, ts), lambda b, s, kl: (b, 0, s),
                                  memory_space=pltpu.VMEM)] * 2
        args += [ckv_scale.astype(jnp.float32)[:, None, :],
                 krope_scale.astype(jnp.float32)[:, None, :]]

    out_specs = pl.BlockSpec((1, H, R), lambda b, s, kl: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, H, R), jnp.float32)
    if partials:
        stat_spec = pl.BlockSpec((1, H, 1), lambda b, s, kl: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        stat_shape = jax.ShapeDtypeStruct((B, H, 1), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)

    out = pl.pallas_call(
        functools.partial(_mla_body, ts=ts, s_len=S,
                          scale=float(softmax_scale), quantized=quantized,
                          partials=partials),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, R), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if partials:
        acc, m, l = out
        return acc, m[..., 0], l[..., 0]
    return out


def _mha_body(kvlen_ref, q_ref, k_ref, v_ref, *rest,
              ts: int, s_len: int, scale: float, quantized: bool,
              partials: bool = False):
    if quantized:
        ks_ref, vs_ref, *outs = rest
    else:
        outs = list(rest)
    if partials:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs
    else:
        o_ref, m_ref, l_ref, acc_ref = outs
    # grid (batch, head-group, kv tile); the head split keeps huge-H int8
    # tiles inside the VMEM budget (scales force ts >= 128 lanes)
    b, si = pl.program_id(0), pl.program_id(2)
    last = pl.num_programs(2) - 1

    @pl.when(si == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    H = q_ref.shape[1]
    k = k_ref[0].astype(jnp.float32)                        # (TS, H, Dh)
    v = v_ref[0].astype(jnp.float32)                        # (TS, H, Dv)
    if quantized:
        vs = vs_ref[0]                                      # (H, TS)
    if s_len % ts:
        rpos = si * ts + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(rpos < s_len, v, 0.0)
        if quantized:
            cpos = si * ts + jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
            vs = jnp.where(cpos < s_len, vs, 0.0)
    q = q_ref[0]                                            # (H, Dh)

    # per-head dots over the (TS, H, ·) tile (H is small; a static loop
    # avoids transposing the tile into head-major layout)
    s = jnp.concatenate([
        jax.lax.dot_general(q[h:h + 1], k[:, h, :], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                         # (H, TS)
    if quantized:
        s = s * ks_ref[0]                                   # (H, TS) scales
    s = s * scale
    pos = si * ts + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = pos < kvlen_ref[b]
    s = jnp.where(mask, s, _NEG_INF)

    m_old = m_ref[...]                                      # (H, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if quantized:
        p = p * vs
    mix = jnp.concatenate([
        jax.lax.dot_general(p[h:h + 1], v[:, h, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                         # (H, Dv)
    acc_ref[...] = acc_ref[...] * alpha + mix
    m_ref[...] = m_new

    @pl.when(si == last)
    def _():
        if partials:
            # unnormalized accumulator + flash stats for seq-parallel merge
            o_ref[0] = acc_ref[...]
            mo_ref[0] = m_ref[...]
            lo_ref[0] = l_ref[...]
        else:
            o_ref[0] = acc_ref[...] / l_ref[...]


@functools.partial(jax.jit, static_argnames=("softmax_scale", "interpret",
                                             "partials"))
def mha_decode_attn(q, k_cache, v_cache, kv_len,
                    softmax_scale: float, k_scale=None, v_scale=None,
                    interpret: bool = False, partials: bool = False):
    """Decompressed-MHA decode attention (attn, infer.cpp:728-762).

    q (B,H,Dh) f32, k_cache (B,S,H,Dh), v_cache (B,S,H,Dv), kv_len (B,)
    -> (B,H,Dv) f32. Grid walks (batch, kv tile); each tile carries all
    heads (full trailing dims keep Mosaic's block rules satisfied). For
    int8 caches pass per-(head, slot) scales k_scale/v_scale (B,H,S) f32
    (head-major: the (1,H,ts) block has sublane H, lane ts).
    """
    B, H, Dh = q.shape
    S = k_cache.shape[1]
    Dv = v_cache.shape[-1]
    quantized = k_scale is not None
    ts = _pick_tile(S, H * (Dh + Dv) * k_cache.dtype.itemsize)
    if quantized:
        ts = max(ts, min(S, 128))  # scale blocks: ts is the lane dim
    # heads are independent: split them across a grid axis whenever the
    # (possibly clamped) tile would blow the VMEM budget once converted to
    # f32 in-kernel (large-H decompressed caches with --kv-dtype int8)
    hc = _pick_head_chunk(
        H, lambda c: ts * c * (Dh + Dv) * 4 <= 6 * 1024 * 1024)
    grid = (B, H // hc, pl.cdiv(S, ts))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))

    in_specs = [
        pl.BlockSpec((1, hc, Dh), lambda b, h, s, kl: (b, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, hc, Dh), lambda b, h, s, kl: (b, s, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, hc, Dv), lambda b, h, s, kl: (b, s, h, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [kv_len, q.astype(jnp.float32), k_cache, v_cache]
    if quantized:
        in_specs += [pl.BlockSpec((1, hc, ts), lambda b, h, s, kl: (b, h, s),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]

    out_specs = pl.BlockSpec((1, hc, Dv), lambda b, h, s, kl: (b, h, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, H, Dv), jnp.float32)
    if partials:
        stat_spec = pl.BlockSpec((1, hc, 1), lambda b, h, s, kl: (b, h, 0),
                                 memory_space=pltpu.VMEM)
        stat_shape = jax.ShapeDtypeStruct((B, H, 1), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)

    out = pl.pallas_call(
        functools.partial(_mha_body, ts=ts, s_len=S,
                          scale=float(softmax_scale), quantized=quantized,
                          partials=partials),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hc, 1), jnp.float32),
                pltpu.VMEM((hc, 1), jnp.float32),
                pltpu.VMEM((hc, Dv), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if partials:
        acc, m, l = out
        return acc, m[..., 0], l[..., 0]
    return out


# ---------------------------------------------------------------------------
# flash PREFILL kernels (chunked causal attention, scores never in HBM)
# ---------------------------------------------------------------------------
#
# The jnp prefill formulations materialize (B, H, T, S) scores — ~134 MB per
# layer at T=512, S=4096, H=16 — so long windows become memory-bound. These
# kernels tile S with online softmax like the decode kernels, one query tile
# per program; positions are affine (q_pos = q_pos0 + t, slot position =
# cache_pos0 + s), so causal masks are built from two prefetched scalars.


def _mha_prefill_body(scal_ref, q_ref, k_ref, v_ref, *rest,
                      ts: int, tq: int, s_len: int, t_len: int,
                      scale: float, quantized: bool, partials: bool):
    if quantized:
        ks_ref, vs_ref, *outs = rest
    else:
        outs = list(rest)
    if partials:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs
    else:
        o_ref, m_ref, l_ref, acc_ref = outs
    ti, si = pl.program_id(2), pl.program_id(3)
    last = pl.num_programs(3) - 1

    @pl.when(si == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0].astype(jnp.float32)                       # (ts, hc, Dh)
    v = v_ref[0].astype(jnp.float32)
    if quantized:
        vs = vs_ref[0]                                     # (hc, ts)
    if s_len % ts:
        # padded tail rows may hold NaN garbage; 0 * NaN = NaN in the
        # value matmul — zero them out (decode bodies do the same)
        rpos = si * ts + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(rpos < s_len, v, 0.0)
        if quantized:
            cpos = si * ts + jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
            vs = jnp.where(cpos < s_len, vs, 0.0)
    q = q_ref[0]                                           # (tq, hc, Dh)
    hc = q.shape[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 0) + ti * tq
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1) + si * ts
    mask = ((scal_ref[1] + cols <= scal_ref[0] + rows)
            & (cols < s_len) & (rows < t_len))

    for h in range(hc):
        s = jax.lax.dot_general(
            q[:, h, :], k[:, h, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if quantized:
            s = s * ks_ref[0, h:h + 1]
        s = s * scale
        s = jnp.where(mask, s, _NEG_INF)
        m_old = m_ref[h]                                   # (tq, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs[h:h + 1]
        acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
            p, v[:, h, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[h] = m_new

    @pl.when(si == last)
    def _():
        for h in range(hc):
            if partials:
                o_ref[0, :, h, :] = acc_ref[h]
                # m/l are laid out (B, H, T): a (1, hc, tq) block keeps
                # Mosaic's last-two-dims rule (hc may be < H)
                mo_ref[0, h, :] = m_ref[h][:, 0]
                lo_ref[0, h, :] = l_ref[h][:, 0]
            else:
                # fully-masked query rows (tail padding) have l == 0
                o_ref[0, :, h, :] = acc_ref[h] / jnp.maximum(l_ref[h], 1e-30)


@functools.partial(jax.jit, static_argnames=(
    "softmax_scale", "partials", "interpret"))
def mha_prefill_attn(q, k_cache, v_cache, q_pos0, cache_pos0,
                     softmax_scale: float, k_scale=None, v_scale=None,
                     partials: bool = False, interpret: bool = False):
    """Chunked causal MHA attention (hybrid-MLA prefill / pure MHA models).

    q (B,T,H,Dh) f32, k_cache (B,S,H,Dh), v_cache (B,S,H,Dv); query t has
    absolute position q_pos0 + t and cache slot s holds position
    cache_pos0 + s (cache_pos0 = sidx*s_local under seq sharding). For
    int8 caches pass k_scale/v_scale (B,H,S) f32 head-major. Returns
    (B,T,H,Dv), or with ``partials`` the (acc, m (B,T,H), l) triple for
    the seq-parallel flash merge.
    """
    B, T, H, Dh = q.shape
    S = k_cache.shape[1]
    Dv = v_cache.shape[-1]
    quantized = k_scale is not None
    tq = min(T, 128)
    # Scoped-VMEM model (16MB hard stack limit): grid-blocked refs are
    # double-buffered — q-in (f32) + k/v-in (cache dtype) + out (f32)
    # count twice, the f32 acc scratch once, and the per-head (tq, ts)
    # f32 score/p temporaries keep ~2 live copies per head of the
    # unrolled loop (measured: they dominate at large ts).
    kv_isz = k_cache.dtype.itemsize
    hc, ts = _pick_hc_ts(
        H, S, min(S, 1024),
        lambda c, t: c * (tq * 4 * (2 * Dh + 3 * Dv)
                          + 2 * t * (Dh + Dv) * kv_isz
                          + 2 * tq * t * 4))
    if quantized:
        ts = max(ts, min(S, 128))
    grid = (B, H // hc, pl.cdiv(T, tq), pl.cdiv(S, ts))

    scal = jnp.stack([jnp.asarray(q_pos0, jnp.int32),
                      jnp.asarray(cache_pos0, jnp.int32)])
    in_specs = [
        pl.BlockSpec((1, tq, hc, Dh), lambda b, h, t, s, sc: (b, t, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, hc, Dh), lambda b, h, t, s, sc: (b, s, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, hc, Dv), lambda b, h, t, s, sc: (b, s, h, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scal, q.astype(jnp.float32), k_cache, v_cache]
    if quantized:
        in_specs += [pl.BlockSpec((1, hc, ts),
                                  lambda b, h, t, s, sc: (b, h, s),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]

    ospec = pl.BlockSpec((1, tq, hc, Dv), lambda b, h, t, s, sc: (b, t, h, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, T, H, Dv), jnp.float32)
    if partials:
        mspec = pl.BlockSpec((1, hc, tq), lambda b, h, t, s, sc: (b, h, t),
                             memory_space=pltpu.VMEM)
        out_specs = (ospec, mspec, mspec)
        out_shape = (oshape, jax.ShapeDtypeStruct((B, H, T), jnp.float32),
                     jax.ShapeDtypeStruct((B, H, T), jnp.float32))
    else:
        out_specs = ospec
        out_shape = oshape

    out = pl.pallas_call(
        functools.partial(_mha_prefill_body, ts=ts, tq=tq, s_len=S, t_len=T,
                          scale=float(softmax_scale), quantized=quantized,
                          partials=partials),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hc, tq, 1), jnp.float32),
                pltpu.VMEM((hc, tq, 1), jnp.float32),
                pltpu.VMEM((hc, tq, Dv), jnp.float32),
            ],
        ),
        out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PREFILL_VMEM_LIMIT),
    )(*args)
    if partials:
        acc, m, l = out
        return acc, jnp.swapaxes(m, 1, 2), jnp.swapaxes(l, 1, 2)
    return out


def _mla_prefill_body(scal_ref, qc_ref, qr_ref, ckv_ref, kr_ref, *rest,
                      ts: int, tq: int, s_len: int, t_len: int,
                      scale: float, quantized: bool, partials: bool):
    if quantized:
        ckvs_ref, krs_ref, *outs = rest
    else:
        outs = list(rest)
    if partials:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs
    else:
        o_ref, m_ref, l_ref, acc_ref = outs
    ti, si = pl.program_id(2), pl.program_id(3)
    last = pl.num_programs(3) - 1

    @pl.when(si == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ckv = ckv_ref[0].astype(jnp.float32)                   # (ts, R)
    kr = kr_ref[0].astype(jnp.float32)                     # (ts, P)
    if quantized:
        ckvs = ckvs_ref[0]                                 # (1, ts)
    if s_len % ts:
        # zero NaN-padded tail rows: the value matmul mixes ckv directly
        rpos = si * ts + jax.lax.broadcasted_iota(jnp.int32, ckv.shape, 0)
        ckv = jnp.where(rpos < s_len, ckv, 0.0)
        if quantized:
            cpos = si * ts + jax.lax.broadcasted_iota(
                jnp.int32, ckvs.shape, 1)
            ckvs = jnp.where(cpos < s_len, ckvs, 0.0)
    qc = qc_ref[0]                                         # (tq, hc, R)
    qr = qr_ref[0]                                         # (tq, hc, P)
    hc = qc.shape[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 0) + ti * tq
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1) + si * ts
    mask = ((scal_ref[1] + cols <= scal_ref[0] + rows)
            & (cols < s_len) & (rows < t_len))

    for h in range(hc):
        sc_ = jax.lax.dot_general(qc[:, h, :], ckv, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sr_ = jax.lax.dot_general(qr[:, h, :], kr, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if quantized:
            # scores were computed on int8 rows: fold per-row scales in
            s = sc_ * ckvs + sr_ * krs_ref[0]
        else:
            s = sc_ + sr_
        s = s * scale
        s = jnp.where(mask, s, _NEG_INF)
        m_old = m_ref[h]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * ckvs
        acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
            p, ckv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[h] = m_new

    @pl.when(si == last)
    def _():
        for h in range(hc):
            if partials:
                o_ref[0, :, h, :] = acc_ref[h]
                mo_ref[0, h, :] = m_ref[h][:, 0]
                lo_ref[0, h, :] = l_ref[h][:, 0]
            else:
                o_ref[0, :, h, :] = acc_ref[h] / jnp.maximum(l_ref[h], 1e-30)


@functools.partial(jax.jit, static_argnames=(
    "softmax_scale", "partials", "interpret"))
def mla_prefill_attn(q_c, q_rope, ckv_cache, krope_cache, q_pos0, cache_pos0,
                     softmax_scale: float, ckv_scale=None, krope_scale=None,
                     partials: bool = False, interpret: bool = False):
    """Chunked causal absorbed-MLA attention (MQA-shaped latent cache).

    q_c (B,T,H,R), q_rope (B,T,H,P), ckv_cache (B,S,R), krope_cache
    (B,S,P); int8 caches pass per-row scales (B,S). Returns attended
    latents (B,T,H,R), or the (acc, m, l) partials triple.
    """
    B, T, H, R = q_c.shape
    S = ckv_cache.shape[1]
    P = q_rope.shape[-1]
    quantized = ckv_scale is not None
    tq = min(T, 128)
    # Scoped-VMEM model (16MB hard stack limit): double-buffered q_c/q_r
    # in-tiles (f32) and out tile (f32) plus the single f32 acc scratch
    # give c*tq*4*(5R+2P); the (head-independent) ckv/kr tiles
    # double-buffer at cache dtype; the per-head (tq, ts) f32 score/p
    # temporaries keep ~2 live copies per head of the unrolled loop
    # (measured on-chip: they dominate at large ts).
    kv_isz = ckv_cache.dtype.itemsize
    hc, ts = _pick_hc_ts(
        H, S, min(S, 1024),
        lambda c, t: c * tq * 4 * (5 * R + 2 * P)
        + 2 * t * (R + P) * kv_isz + 2 * c * tq * t * 4)
    if quantized:
        ts = max(ts, min(S, 128))
    grid = (B, H // hc, pl.cdiv(T, tq), pl.cdiv(S, ts))

    scal = jnp.stack([jnp.asarray(q_pos0, jnp.int32),
                      jnp.asarray(cache_pos0, jnp.int32)])
    in_specs = [
        pl.BlockSpec((1, tq, hc, R), lambda b, h, t, s, sc: (b, t, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, hc, P), lambda b, h, t, s, sc: (b, t, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, R), lambda b, h, t, s, sc: (b, s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, P), lambda b, h, t, s, sc: (b, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scal, q_c.astype(jnp.float32), q_rope.astype(jnp.float32),
            ckv_cache, krope_cache]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, ts),
                                  lambda b, h, t, s, sc: (b, 0, s),
                                  memory_space=pltpu.VMEM)] * 2
        args += [ckv_scale.astype(jnp.float32)[:, None, :],
                 krope_scale.astype(jnp.float32)[:, None, :]]

    ospec = pl.BlockSpec((1, tq, hc, R), lambda b, h, t, s, sc: (b, t, h, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, T, H, R), jnp.float32)
    if partials:
        mspec = pl.BlockSpec((1, hc, tq), lambda b, h, t, s, sc: (b, h, t),
                             memory_space=pltpu.VMEM)
        out_specs = (ospec, mspec, mspec)
        out_shape = (oshape, jax.ShapeDtypeStruct((B, H, T), jnp.float32),
                     jax.ShapeDtypeStruct((B, H, T), jnp.float32))
    else:
        out_specs = ospec
        out_shape = oshape

    out = pl.pallas_call(
        functools.partial(_mla_prefill_body, ts=ts, tq=tq, s_len=S, t_len=T,
                          scale=float(softmax_scale), quantized=quantized,
                          partials=partials),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hc, tq, 1), jnp.float32),
                pltpu.VMEM((hc, tq, 1), jnp.float32),
                pltpu.VMEM((hc, tq, R), jnp.float32),
            ],
        ),
        out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PREFILL_VMEM_LIMIT),
    )(*args)
    if partials:
        acc, m, l = out
        return acc, jnp.swapaxes(m, 1, 2), jnp.swapaxes(l, 1, 2)
    return out
