"""DeepSeek forward pass: one pure function, two modes.

The reference's per-token ``Model::forward`` (infer.cpp:1265-1317) becomes a
jitted ``forward(params, cache, tokens, pos0)`` with a static mode:

- **decode** (T == 1): ring/sink position math, cache write at ``kv_pos``,
  sink re-rotation, masked decode attention. One fused XLA program per step,
  cache donated — zero allocations per token.
- **prefill** (T >= 1): the reference has no prefill (README.md:94 — strictly
  one token per forward); on TPU, chunked causal prefill over the MXU is the
  natural hydrate path and a capability superset. Valid while pos0 + T <=
  kv_window (the engine falls back to decode steps past the window).

MoE uses two formulations: decode gathers the k active experts' (quantized)
weights per token; prefill runs dense-over-experts einsums with a routing
weight matrix — reading every expert once per chunk amortizes expert HBM
traffic and keeps the MXU on large matmuls.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deepseek_tpu.config import KV_SINKS, ModelConfig
from deepseek_tpu.models.kvcache import (
    KVCache, dequant_rows, quantize_rows, ring_positions,
)
from deepseek_tpu.models.params import LayerParams, ModelParams, embed_lookup
from deepseek_tpu.ops import (
    apply_rope, decode_attn_mha, decode_attn_mla, glu_act, moe_gate, rmsnorm,
)
from deepseek_tpu.ops.attention import prefill_attn_mha, prefill_attn_mla
from deepseek_tpu.ops.matmul import (
    gather_experts, kernel_impl, qmatmul, reshape_rows,
)
from deepseek_tpu.quant.qtensor import PlainTensor
from deepseek_tpu.utils.debug import dbg


def _rotation_only(yarn):
    """YaRN params with mscale neutralized — sink re-rotation must be a pure
    rotation (the cached keys already carry the magnitude scale once)."""
    if yarn is None:
        return None
    import dataclasses as _dc
    return _dc.replace(yarn, mscale=yarn.mscale_all_dim)


def _cache_write(full, rows, layer: int, cache_start, prefill: bool,
                 mask=None):
    """Scatter new rows straight into the full (L,B,S,...) cache array —
    in-place dynamic updates on the donated carry, no slice round-trips.
    rows: (B,T,...) matching full[:, :, start:start+T]. ``mask`` (B,) bool
    guards per-sequence decode writes (seq-parallel shards only write slots
    they own; cache_start is then the pre-clamped LOCAL slot).

    Verify mode (prefill with PER-ROW ``cache_start`` (B,) — the batched
    speculative verify chunk): each batch row's T slots start at its own
    offset, so the write is a per-row scatter instead of one slice."""
    if full is None:
        return None
    if prefill:
        if jnp.ndim(cache_start) == 1:
            B, T = rows.shape[:2]
            bidx = jnp.arange(B)[:, None]
            sidx = cache_start[:, None] + jnp.arange(T, dtype=jnp.int32)
            return full.at[layer, bidx, sidx].set(rows.astype(full.dtype))
        start = (layer, 0, cache_start) + (0,) * (rows.ndim - 2)
        return jax.lax.dynamic_update_slice(
            full, rows[None].astype(full.dtype), start)
    B = rows.shape[0]
    bidx = jnp.arange(B)
    new = rows[:, 0].astype(full.dtype)
    if mask is not None:
        old = full[layer, bidx, cache_start]
        new = jnp.where(mask.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
    return full.at[layer, bidx, cache_start].set(new)


def _cache_write_sp_prefill(full, rows, layer: int, pos0, sidx, s_local: int):
    """Prefill write into a seq-sharded cache: each shard commits only the
    rows of the chunk [pos0, pos0+T) that fall inside its window slice.

    Fast paths: a chunk entirely OUTSIDE this shard's slice (the common
    case on sp-1 of sp shards) is a no-op; a chunk entirely inside (every
    other chunk except the ones straddling a shard edge) is a plain DUS
    writing exactly T slots. Only straddling chunks take the masked
    whole-slice update — a clamped DUS would corrupt edge slots, so the
    O(s_local) write amplification is paid only at shard edges.
    """
    if full is None:
        return None
    T = rows.shape[1]
    lo = sidx * s_local
    interior = (pos0 >= lo) & (pos0 + T <= lo + s_local)
    disjoint = (pos0 + T <= lo) | (pos0 >= lo + s_local)

    def dus(f):
        start = (layer, 0, jnp.clip(pos0 - lo, 0, s_local - T)) \
            + (0,) * (rows.ndim - 2)
        return jax.lax.dynamic_update_slice(
            f, rows[None].astype(f.dtype), start)

    def masked(f):
        s = jnp.arange(s_local)
        g = lo + s                                       # global slot pos
        ridx = jnp.clip(g - pos0, 0, T - 1)
        cand = jnp.take(rows, ridx, axis=1).astype(f.dtype)  # (B, s_local, …)
        valid = (g >= pos0) & (g < pos0 + T)
        msk = valid.reshape((1, s_local) + (1,) * (cand.ndim - 2))
        return f.at[layer].set(jnp.where(msk, cand, f[layer]))

    def edge(f):
        return jax.lax.cond(interior, dus, masked, f)

    if T > s_local:
        return jax.lax.cond(disjoint, lambda f: f, masked, full)
    return jax.lax.cond(disjoint, lambda f: f, edge, full)


def _sink_update(buf, rows_f32, layer: int, global_start, prefill: bool):
    """Mirror writes landing in sink slots into the float master buffer
    (int8 caches only — see KVCache.sink_*). ``global_start`` is the GLOBAL
    slot index (scalar for prefill, (B,) for decode), so the buffer stays
    replicated across seq shards."""
    if buf is None:
        return None
    K = buf.shape[2]
    B = rows_f32.shape[0]
    rows_f32 = rows_f32.astype(jnp.float32)
    if prefill:
        T = rows_f32.shape[1]
        s = jnp.arange(K)
        if jnp.ndim(global_start) == 1:
            # verify mode: per-row chunk starts (B,)
            gs = global_start[:, None]                       # (B, 1)
            ridx = jnp.clip(s[None, :] - gs, 0, T - 1)       # (B, K)
            ridx = ridx.reshape(ridx.shape + (1,) * (rows_f32.ndim - 2))
            cand = jnp.take_along_axis(rows_f32, ridx, axis=1)
            valid = (s[None, :] >= gs) & (s[None, :] < gs + T)
            msk = valid.reshape(valid.shape + (1,) * (cand.ndim - 2))
            return buf.at[layer].set(jnp.where(msk, cand, buf[layer]))
        ridx = jnp.clip(s - global_start, 0, T - 1)
        cand = jnp.take(rows_f32, ridx, axis=1)              # (B, K, ...)
        valid = (s >= global_start) & (s < global_start + T)
        msk = valid.reshape((1, K) + (1,) * (cand.ndim - 2))
        return buf.at[layer].set(jnp.where(msk, cand, buf[layer]))
    slot = jnp.broadcast_to(jnp.asarray(global_start), (B,))
    valid = slot < K
    lclamp = jnp.clip(slot, 0, K - 1)
    bidx = jnp.arange(B)
    new = rows_f32[:, 0]
    msk = valid.reshape((B,) + (1,) * (new.ndim - 1))
    return buf.at[layer, bidx, lclamp].set(
        jnp.where(msk, new, buf[layer, bidx, lclamp]))



def _seq_ctx(cfg: ModelConfig, ctx, cache_start, prefill: bool, layer: int):
    """Seq-sharding plumbing shared by the MLA and MHA attention branches.

    Returns ``(wr, global_start, on_sink_shard, sidx, s_local)``:
    ``wr(full, rows)`` writes chunk/decode rows into the window-sharded
    cache (prefill chunks commit each shard's intersection; decode writes
    translate to LOCAL slots with only the owning shard committing);
    ``on_sink_shard`` guards the sink re-rotation to seq shard 0;
    ``sidx``/``s_local`` are None at sp == 1.
    """
    global_start = cache_start
    sidx = s_local = None
    on_sink_shard = True
    w_mask = None
    if ctx.sp > 1:
        sidx, s_local = ctx.seq_shard(cfg.kv_window)
        on_sink_shard = sidx == 0
        if not prefill:
            lpos = cache_start - sidx * s_local              # (B,)
            w_mask = (lpos >= 0) & (lpos < s_local)
            cache_start = jnp.clip(lpos, 0, s_local - 1)
    if prefill and ctx.sp > 1:
        def wr(full, rows):
            return _cache_write_sp_prefill(full, rows, layer, global_start,
                                           sidx, s_local)
    else:
        def wr(full, rows):
            return _cache_write(full, rows, layer, cache_start, prefill,
                                w_mask)
    return wr, global_start, on_sink_shard, sidx, s_local


def _use_flash_prefill(B: int, T: int, S: int, H: int) -> bool:
    """Flash prefill kernels win when the (B, H, T, S) score tensor would
    be HBM-resident at painful scale; below that the fused jnp einsum path
    is faster (measured: T=256, S=4096, H=16 prefill dropped 29.6k -> 21.8k
    tok/s under the kernel). Threshold = 256 MB of f32 scores."""
    return B * T * S * H * 4 > 256 * 1024 * 1024

def _attention(lp: LayerParams, cfg: ModelConfig, xb: jnp.ndarray,
               cache: KVCache, layer: int, pos_vec: jnp.ndarray,
               cache_start, kv_len, kv_sink, prefill: bool, impl, ctx
               ) -> Tuple[jnp.ndarray, KVCache]:
    """Runs either attention path; returns (attn_out (B,T,dim), cache).

    Under shard_map (ctx.tp > 1) all head-major projections are local TP
    shards: H here is the local head count and the row-parallel wo output is
    psum'd over the tensor axis."""
    B, T, _ = xb.shape
    H = ctx.local_heads(cfg.n_heads)
    R, P = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    nope, Dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    is_v3 = cfg.has_moegate_bias
    theta = cfg.rope_theta
    yarn = cfg.yarn_params()          # None unless cfg.use_yarn
    sm_scale = cfg.attn_softmax_scale()
    # verify mode: prefill semantics with PER-ROW chunk positions — pos_vec
    # arrives (B, T) and cache_start (B,) (batched speculative verify)
    verify = prefill and pos_vec.ndim == 2
    if prefill and not verify:
        pos_bt = jnp.broadcast_to(pos_vec[None, :], (B, T))      # shared positions
    else:
        pos_bt = pos_vec                           # (B, T) / (B, 1) per-seq
    posb = pos_bt[:, :, None]  # broadcasts over (B, T, H)

    def mm(qt, x):
        return qmatmul(qt, x, impl=impl)

    if lp.wkvq is not None:
        # fused [wkv_a; wq_a] (loader.fuse_projections): one sweep
        kvq = mm(lp.wkvq, xb)
        kv_a = kvq[..., :R + P]                        # (B, T, R + P)
        q_a_raw = kvq[..., R + P:]
    else:
        kv_a = mm(lp.wkv_a, xb)                        # (B, T, R + P)
        q_a_raw = None
    k_rope = apply_rope(
        kv_a[..., R:].astype(jnp.float32), pos_bt, theta, is_v3, yarn)
    ckv = rmsnorm(kv_a[..., :R], lp.kv_a_norm, cfg.norm_eps)

    if cfg.use_mla:
        # absorbed path (BlockMLA, infer.cpp:1052-1141)
        q_a = rmsnorm(q_a_raw if q_a_raw is not None else mm(lp.wq_a, xb),
                      lp.q_a_norm, cfg.norm_eps)
        # hybrid MLA: prefill attends in decompressed head space when the
        # checkpoint kept wq_b/wkv_b — identical math in exact arithmetic
        # (the absorption is a linear factorization), fewer score/mix
        # FLOPs at large chunk x window. Decode always uses the absorbed
        # path (minimal cache reads per step). Policy (deliberate, round
        # 5): ALL non-verify prefill decompresses whenever the factor
        # weights exist — hydration numerics must not depend on chunk
        # length. Under quantization the two formulations differ
        # (quantizing the absorbed product wc = wk_nope_b^T @ wq_nope_b
        # carries different error than quantizing the factors), so a
        # chunk-size-dependent MAC-count gate here made short-chunk
        # hydration drift vs long-chunk hydration (caught by
        # test_nibble_runtime_matches_packed_engine's ppl bar). Verify
        # chunks (T = spec_k+1) are the one exemption: they share the
        # decode path's absorbed weights/numerics so speculative greedy
        # output is identical to plain decode on-chip (bf16 argmax ties
        # broke differently across the two formulations — measured).
        decompress = (prefill and not verify
                      and lp.wkv_b is not None and lp.wq_b is not None)
        if not decompress:
            if lp.wcr is not None:
                # fused [wq_rope_b; wc]: one sweep over both projections
                qcr = mm(lp.wcr, q_a)
                q_rope = qcr[..., :H * P].reshape(B, T, H, P)
                q_c = qcr[..., H * P:].reshape(B, T, H, R).astype(jnp.float32)
            else:
                q_rope = mm(lp.wq_rope_b, q_a).reshape(B, T, H, P)
                q_c = mm(lp.wc, q_a).reshape(B, T, H, R).astype(jnp.float32)
            q_rope = apply_rope(q_rope.astype(jnp.float32), posb, theta,
                                is_v3, yarn)
            if ctx.cp:
                # CP prefill: projections/rope ran on this shard's rows
                # only; attention wants the whole chunk's queries
                q_c = ctx.cp_gather_rows(q_c)
                q_rope = ctx.cp_gather_rows(q_rope)

        # cache writes scatter straight into the full (L,B,S,·) arrays;
        # under seq parallelism the latent cache is sharded along the
        # window (see _seq_ctx)
        wr, global_start, on_sink_shard, sidx, s_local = _seq_ctx(
            cfg, ctx, cache_start, prefill, layer)
        q8 = cache.ckv_s is not None  # int8 cache: rows + per-row f32 scale
        if q8:
            ckv_w, ckv_sc = quantize_rows(ckv.astype(jnp.float32))
            kr_w, kr_sc = quantize_rows(k_rope)
        else:
            ckv_w, kr_w, ckv_sc, kr_sc = ckv, k_rope, None, None
        k_rope_rows = k_rope
        if ctx.cp:
            # CP prefill: each shard computed T/sp rows; the window-sharded
            # cache slices are independent of the ROW sharding, so writes
            # (and the sink master) need the whole chunk — gather rows at
            # the cache dtype (post-quantization: int8 when q8)
            ckv_w = ctx.cp_gather_rows(ckv_w.astype(cache.ckv.dtype))
            kr_w = ctx.cp_gather_rows(kr_w.astype(cache.krope.dtype))
            ckv_sc = ctx.cp_gather_rows(ckv_sc)
            kr_sc = ctx.cp_gather_rows(kr_sc)
            if cache.sink_krope is not None:
                k_rope_rows = ctx.cp_gather_rows(k_rope)
        ckv_full = wr(cache.ckv, ckv_w)
        krope_full = wr(cache.krope, kr_w)
        ckv_s_full = wr(cache.ckv_s, ckv_sc)
        krope_s_full = wr(cache.krope_s, kr_sc)
        sink_krope_full = _sink_update(cache.sink_krope, k_rope_rows, layer,
                                       global_start, prefill)

        def sc(full):
            return full[layer] if full is not None else None

        if decompress:
            ckv_l = dequant_rows(ckv_full[layer], sc(ckv_s_full))
            krope_l = dequant_rows(krope_full[layer], sc(krope_s_full))
            S = ckv_l.shape[1]
            # under seq sharding S is the LOCAL slice; slots carry their
            # global positions and shards flash-merge partial attention
            cache_pos = jnp.arange(S, dtype=jnp.int32)
            if ctx.sp > 1:
                cache_pos = cache_pos + sidx * s_local
            nope = cfg.qk_nope_head_dim
            q = mm(lp.wq_b, q_a).reshape(B, T, H, cfg.head_dim)
            q = q.astype(jnp.float32)
            q_pe = apply_rope(q[..., nope:], posb, theta, is_v3, yarn)
            q = jnp.concatenate([q[..., :nope], q_pe], axis=-1)
            if ctx.cp:
                q = ctx.cp_gather_rows(q)       # whole chunk's queries
            Tq = q.shape[1]                     # == T*sp under CP
            q_pos = global_start + jnp.arange(Tq, dtype=jnp.int32) \
                if not verify else pos_vec      # (B, T) per-row in verify
            merge = ctx.cp_merge_scatter if ctx.cp else ctx.seq_merge
            kv_dec = mm(lp.wkv_b, ckv_l.astype(xb.dtype)).reshape(
                B, S, H, nope + Dv)
            k_l = jnp.concatenate(
                [kv_dec[..., :nope].astype(jnp.float32),
                 jnp.broadcast_to(krope_l[:, :, None, :].astype(jnp.float32),
                                  (B, S, H, P))], axis=-1)
            base = cache_pos[0]
            # flash prefill takes a SCALAR chunk start; verify chunks are
            # tiny (T = spec_k+1) so the jnp path is the right one anyway
            if impl is not None and not verify \
                    and _use_flash_prefill(B, Tq, S, H):
                # flash prefill kernel: scores tiled in VMEM, never (T,S)
                # in HBM (long-window memory bound)
                from deepseek_tpu.ops.pallas.attention import mha_prefill_attn
                res = mha_prefill_attn(
                    q, k_l.astype(xb.dtype), kv_dec[..., nope:],
                    global_start, base, float(sm_scale),
                    partials=ctx.sp > 1, interpret=impl["interpret"])
                v_out = merge(*res) if ctx.sp > 1 else res
            elif ctx.sp > 1:
                from deepseek_tpu.ops.attention import prefill_attn_mha_partial
                acc, m_, l_ = prefill_attn_mha_partial(
                    q, k_l, kv_dec[..., nope:], q_pos, cache_pos,
                    softmax_scale=sm_scale)
                v_out = merge(acc, m_, l_)
            else:
                v_out = prefill_attn_mha(
                    q, k_l, kv_dec[..., nope:], pos_vec, cache_pos,
                    softmax_scale=sm_scale)                         # (B,T,H,Dv)
            attn = ctx.psum_t(mm(lp.wo, v_out.reshape(B, T, H * Dv)
                                 .astype(xb.dtype)))
            cache = KVCache(k=None, v=None, ckv=ckv_full, krope=krope_full,
                            ckv_s=ckv_s_full, krope_s=krope_s_full,
                            sink_krope=sink_krope_full)
            return attn, cache
        if prefill:
            base = (sidx * s_local) if ctx.sp > 1 else 0
            S_loc = cache.ckv.shape[2]
            Tq = q_c.shape[1]                   # == T*sp under CP (gathered)
            q_pos = global_start + jnp.arange(Tq, dtype=jnp.int32) \
                if not verify else pos_vec
            merge = ctx.cp_merge_scatter if ctx.cp else ctx.seq_merge
            if impl is not None and not verify \
                    and _use_flash_prefill(B, Tq, S_loc, H):
                # flash prefill over the (possibly int8) latent cache:
                # scores tiled in VMEM, scales folded in-kernel — no
                # dequantized cache or (T,S) scores in HBM
                from deepseek_tpu.ops.pallas.attention import mla_prefill_attn
                res = mla_prefill_attn(
                    q_c, q_rope, ckv_full[layer], krope_full[layer],
                    global_start, base, float(sm_scale),
                    ckv_scale=sc(ckv_s_full), krope_scale=sc(krope_s_full),
                    partials=ctx.sp > 1, interpret=impl["interpret"])
                lat = merge(*res) if ctx.sp > 1 else res
            else:
                ckv_l = dequant_rows(ckv_full[layer], sc(ckv_s_full))
                krope_l = dequant_rows(krope_full[layer], sc(krope_s_full))
                S = ckv_l.shape[1]
                cache_pos = jnp.arange(S, dtype=jnp.int32)
                if ctx.sp > 1:
                    from deepseek_tpu.ops.attention import \
                        prefill_attn_mla_partial
                    acc, m_, l_ = prefill_attn_mla_partial(
                        q_c, q_rope, ckv_l, krope_l, q_pos,
                        cache_pos + base, cfg.head_dim,
                        softmax_scale=sm_scale)
                    lat = merge(acc, m_, l_)    # (B,T,H,R) local rows if CP
                else:
                    lat = prefill_attn_mla(
                        q_c, q_rope, ckv_l, krope_l, pos_vec,
                        cache_pos, cfg.head_dim,
                        softmax_scale=sm_scale)                     # (B,T,H,R)
        else:
            # sink re-rotation by +1 (StreamingLLM; infer.cpp:1103-1110);
            # the sink slots live on seq shard 0. For int8 caches the
            # rotation runs on the float master copy and the slots are
            # quantized FRESH each step — no compounding round-trip error.
            cdt = krope_full.dtype
            if q8:
                sink = sink_krope_full[layer]
            else:
                sink = krope_full[layer, :, :KV_SINKS].astype(jnp.float32)
            rot = apply_rope(sink, 1, theta, is_v3, _rotation_only(yarn))
            keep = ((kv_sink > 0) & on_sink_shard)[:, None, None]
            if q8:
                keep_f = (kv_sink > 0)[:, None, None]  # replicated master
                sink_krope_full = sink_krope_full.at[layer].set(
                    jnp.where(keep_f, rot, sink))
                rot_q, rot_sc = quantize_rows(rot)
                krope_full = krope_full.at[layer, :, :KV_SINKS].set(
                    jnp.where(keep, rot_q,
                              krope_full[layer, :, :KV_SINKS]))
                krope_s_full = krope_s_full.at[layer, :, :KV_SINKS].set(
                    jnp.where(keep[..., 0], rot_sc,
                              krope_s_full[layer, :, :KV_SINKS]))
            else:
                krope_full = krope_full.at[layer, :, :KV_SINKS].set(
                    jnp.where(keep, rot.astype(cdt),
                              krope_full[layer, :, :KV_SINKS]))
            if ctx.sp > 1:
                kv_len_eff = jnp.clip(kv_len - sidx * s_local, 0, s_local)
            else:
                kv_len_eff = kv_len
            if impl is not None:
                from deepseek_tpu.ops.pallas.attention import mla_decode_attn
                res = mla_decode_attn(
                    q_c[:, 0], q_rope[:, 0], ckv_full[layer],
                    krope_full[layer], kv_len_eff, float(sm_scale),
                    ckv_scale=sc(ckv_s_full), krope_scale=sc(krope_s_full),
                    interpret=impl["interpret"], partials=ctx.sp > 1)
                if ctx.sp > 1:
                    lat = ctx.seq_merge(*res)[:, None]
                else:
                    lat = res[:, None]
            elif ctx.sp > 1:
                from deepseek_tpu.ops.attention import decode_attn_mla_partial
                ckv_l = dequant_rows(ckv_full[layer], sc(ckv_s_full))
                krope_l = dequant_rows(krope_full[layer], sc(krope_s_full))
                acc, m, l = decode_attn_mla_partial(
                    q_c[:, 0], q_rope[:, 0], ckv_l, krope_l, kv_len_eff,
                    cfg.head_dim, softmax_scale=sm_scale)
                lat = ctx.seq_merge(acc, m, l)[:, None]
            else:
                ckv_l = dequant_rows(ckv_full[layer], sc(ckv_s_full))
                krope_l = dequant_rows(krope_full[layer], sc(krope_s_full))
                lat = decode_attn_mla(
                    q_c[:, 0], q_rope[:, 0], ckv_l, krope_l, kv_len,
                    cfg.head_dim, softmax_scale=sm_scale)[:, None]  # (B,1,H,R)

        # per-head up-projection of attended latents (wv_b, infer.cpp:1134-1137)
        from deepseek_tpu.ops.matmul import LayerSlicedQT, per_tensor_fp8
        if (impl is not None and not prefill
                and not isinstance(lp.wv_b, PlainTensor)
                and not per_tensor_fp8(lp.wv_b)):
            # expert-gather kernel with idx = head index: each head's packed
            # block is read exactly once, nothing dequantizes to HBM
            from deepseek_tpu.ops.pallas.qmm import qmm_experts
            if isinstance(lp.wv_b, LayerSlicedQT):
                # scanned stack: (Lg, H*Dv, R) -> (Lg*H, Dv, R) per-head
                # table (free reshape); head ids offset by li*H
                wv3 = jax.tree.map(
                    lambda a: a.reshape(
                        (a.shape[0] * H, a.shape[1] // H) + a.shape[2:]),
                    lp.wv_b.qt)
                hidx = jnp.arange(H, dtype=jnp.int32)[None] \
                    + jnp.asarray(lp.wv_b.li, jnp.int32) * H
                hidx = jnp.broadcast_to(hidx, (B, H))
            else:
                wv3 = reshape_rows(lp.wv_b, H)
                hidx = jnp.broadcast_to(
                    jnp.arange(H, dtype=jnp.int32)[None], (B, H))
            v = qmm_experts(wv3, hidx, lat[:, 0], interpret=impl["interpret"])
            v = v[:, None]                                   # (B,1,H,Dv)
        else:
            wv_b = lp.wv_b.dequant(jnp.float32).reshape(H, Dv, R)
            v = jnp.einsum("bthr,hvr->bthv", lat, wv_b,
                           preferred_element_type=jnp.float32)
        attn = ctx.psum_t(mm(lp.wo, v.reshape(B, T, H * Dv).astype(xb.dtype)))
        cache = KVCache(k=None, v=None, ckv=ckv_full, krope=krope_full,
                        ckv_s=ckv_s_full, krope_s=krope_s_full,
                        sink_krope=sink_krope_full)
        return attn, cache

    # decompressed path (BlockMHA, infer.cpp:935-1049)
    if cfg.q_lora_rank > 0:
        q_a = rmsnorm(q_a_raw if q_a_raw is not None else mm(lp.wq_a, xb),
                      lp.q_a_norm, cfg.norm_eps)
        q = mm(lp.wq_b, q_a)
    else:
        q = mm(lp.wq, xb)
    q = q.reshape(B, T, H, cfg.head_dim).astype(jnp.float32)
    q_pe = apply_rope(q[..., nope:], posb, theta, is_v3, yarn)
    q = jnp.concatenate([q[..., :nope], q_pe], axis=-1)

    kv_b = mm(lp.wkv_b, ckv).reshape(B, T, H, nope + Dv)
    k = jnp.concatenate(
        [kv_b[..., :nope].astype(jnp.float32),
         jnp.broadcast_to(k_rope[:, :, None, :], (B, T, H, P))], axis=-1)
    vv = kv_b[..., nope:]

    # seq-parallel MHA mirrors the MLA machinery: the (L,B,S,H,·) caches
    # shard S along 'seq' (see _seq_ctx); sinks live on shard 0
    wr, global_start, on_sink_shard, sidx, s_local = _seq_ctx(
        cfg, ctx, cache_start, prefill, layer)

    q8 = cache.k_s is not None  # int8 cache: per-(slot, head) f32 scales
    if q8:
        k_w, k_sc = quantize_rows(k)                  # (B,T,H,Dh) -> (B,T,H)
        v_w, v_sc = quantize_rows(vv.astype(jnp.float32))
    else:
        k_w, v_w, k_sc, v_sc = k, vv, None, None
    k_rows = k
    if ctx.cp:
        # CP prefill (see the MLA branch): cache writes and attention
        # need the whole chunk; this shard computed only T/sp rows
        k_w = ctx.cp_gather_rows(k_w.astype(cache.k.dtype))
        v_w = ctx.cp_gather_rows(v_w.astype(cache.v.dtype))
        k_sc = ctx.cp_gather_rows(k_sc)
        v_sc = ctx.cp_gather_rows(v_sc)
        q = ctx.cp_gather_rows(q)
        if cache.sink_k is not None:
            k_rows = ctx.cp_gather_rows(k)
    k_full = wr(cache.k, k_w)
    v_full = wr(cache.v, v_w)
    k_s_full = wr(cache.k_s, k_sc)
    v_s_full = wr(cache.v_s, v_sc)
    sink_k_full = _sink_update(cache.sink_k, k_rows, layer, global_start,
                               prefill)

    def sc(full):
        return full[layer] if full is not None else None

    if prefill:
        base = (sidx * s_local) if ctx.sp > 1 else 0
        Tq = q.shape[1]                         # == T*sp under CP (gathered)
        q_pos = global_start + jnp.arange(Tq, dtype=jnp.int32) \
            if not verify else pos_vec
        merge = ctx.cp_merge_scatter if ctx.cp else ctx.seq_merge
        if impl is not None and not verify and _use_flash_prefill(
                B, Tq, cache.k.shape[2], H):
            from deepseek_tpu.ops.pallas.attention import mha_prefill_attn
            hs = (lambda a: jnp.swapaxes(a, 1, 2) if a is not None else None)
            res = mha_prefill_attn(
                q, k_full[layer], v_full[layer], global_start, base,
                float(sm_scale), k_scale=hs(sc(k_s_full)),
                v_scale=hs(sc(v_s_full)), partials=ctx.sp > 1,
                interpret=impl["interpret"])
            out = merge(*res) if ctx.sp > 1 else res
        else:
            k_l = dequant_rows(k_full[layer], sc(k_s_full))
            v_l = dequant_rows(v_full[layer], sc(v_s_full))
            S = k_l.shape[1]
            cache_pos = jnp.arange(S, dtype=jnp.int32) + base
            if ctx.sp > 1:
                from deepseek_tpu.ops.attention import \
                    prefill_attn_mha_partial
                acc, m_, l_ = prefill_attn_mha_partial(
                    q, k_l, v_l, q_pos, cache_pos,
                    softmax_scale=sm_scale)
                out = merge(acc, m_, l_)
            else:
                out = prefill_attn_mha(q, k_l, v_l, pos_vec, cache_pos,
                                       softmax_scale=sm_scale)      # (B,T,H,Dv)
    else:
        # sink re-rotation touches only the rope chunk; for int8 caches the
        # rotation runs on the float master rows and the slots requantize
        # fresh each step (no compounding round-trip error)
        cdt = k_full.dtype
        if q8:
            sink = sink_k_full[layer]                 # (B, KV_SINKS, H, Dh)
        else:
            sink = k_full[layer, :, :KV_SINKS].astype(jnp.float32)
        rot_pe = apply_rope(sink[..., nope:], 1, theta, is_v3,
                            _rotation_only(yarn))
        rot = jnp.concatenate([sink[..., :nope], rot_pe], axis=-1)
        keep = ((kv_sink > 0) & on_sink_shard)[:, None, None, None]
        if q8:
            keep_f = (kv_sink > 0)[:, None, None, None]  # replicated master
            sink_k_full = sink_k_full.at[layer].set(
                jnp.where(keep_f, rot, sink))
            rot_q, rot_sc = quantize_rows(rot)
            k_full = k_full.at[layer, :, :KV_SINKS].set(
                jnp.where(keep, rot_q, k_full[layer, :, :KV_SINKS]))
            k_s_full = k_s_full.at[layer, :, :KV_SINKS].set(
                jnp.where(keep[..., 0], rot_sc,
                          k_s_full[layer, :, :KV_SINKS]))
        else:
            k_full = k_full.at[layer, :, :KV_SINKS, :, nope:].set(
                jnp.where(keep, rot_pe.astype(cdt),
                          k_full[layer, :, :KV_SINKS, :, nope:]))
        if ctx.sp > 1:
            kv_len_eff = jnp.clip(kv_len - sidx * s_local, 0, s_local)
        else:
            kv_len_eff = kv_len
        if impl is not None:
            from deepseek_tpu.ops.pallas.attention import mha_decode_attn
            hs = (lambda a: jnp.swapaxes(a, 1, 2) if a is not None else None)
            res = mha_decode_attn(
                q[:, 0], k_full[layer], v_full[layer], kv_len_eff,
                float(sm_scale), k_scale=hs(sc(k_s_full)),
                v_scale=hs(sc(v_s_full)),
                interpret=impl["interpret"], partials=ctx.sp > 1)
            if ctx.sp > 1:
                out = ctx.seq_merge(*res)[:, None]
            else:
                out = res[:, None]
        elif ctx.sp > 1:
            from deepseek_tpu.ops.attention import decode_attn_mha_partial
            k_l = dequant_rows(k_full[layer], sc(k_s_full))
            v_l = dequant_rows(v_full[layer], sc(v_s_full))
            acc, m, l = decode_attn_mha_partial(
                q[:, 0], k_l, v_l, kv_len_eff, softmax_scale=sm_scale)
            out = ctx.seq_merge(acc, m, l)[:, None]
        else:
            k_l = dequant_rows(k_full[layer], sc(k_s_full))
            v_l = dequant_rows(v_full[layer], sc(v_s_full))
            out = decode_attn_mha(
                q[:, 0], k_l, v_l, kv_len, softmax_scale=sm_scale)[:, None]

    attn = ctx.psum_t(mm(lp.wo, out.reshape(B, T, H * Dv).astype(xb.dtype)))
    cache = KVCache(k=k_full, v=v_full, ckv=None, krope=None,
                    k_s=k_s_full, v_s=v_s_full, sink_k=sink_k_full)
    return attn, cache


# Prefill chunks with at most this many token-expert pairs run the
# decode-style pair dispatch instead of the grouped/dense chunk
# formulations. The grouped path's cost floor is ~E single-expert 128-row
# tiles of MXU work per chunk — irrelevant once tokens fill the tiles
# (T >= ~128) but ~10x a decode step for a 5-token speculative verify
# chunk (measured 1.9 ms/layer at 16L nibble); the pair path computes
# exactly N pair rows. Crossover: pair cost ~2.5 us/pair of fixed program
# cost vs the grouped floor — ~128 pairs on v5e.
_PAIR_PREFILL_MAX_PAIRS = 128


def _dense_glu(w1, w2, w3, xb: jnp.ndarray, cfg: ModelConfig, impl, ctx,
               w13=None) -> jnp.ndarray:
    """Column-parallel w1/w3, row-parallel w2: psum restores the full sum.
    With a fused [w1;w3] (loader.fuse_projections) one sweep feeds both."""
    if w13 is not None:
        h2 = qmatmul(w13, xb, impl=impl)
        m = h2.shape[-1] // 2
        h = glu_act(h2[..., :m], h2[..., m:], cfg.act)
    else:
        h = glu_act(qmatmul(w1, xb, impl=impl), qmatmul(w3, xb, impl=impl),
                    cfg.act)
    return ctx.psum_t(qmatmul(w2, h, impl=impl))


def _ffn(lp: LayerParams, cfg: ModelConfig, xb: jnp.ndarray, layer: int,
         prefill: bool, impl, ctx, active=None, active_bucket=None):
    """Returns (out (B,T,dim), ovf | None) — ovf is the EP prefill capacity
    overflow count (ops.matmul.ep_prefill_capacity), None off that path.

    ``active`` (B,) bool (decode only): rows of empty/finished
    continuous-batching slots route with weight 0 and sort last in the
    pair dispatch. ``active_bucket`` (STATIC int) additionally truncates
    the kernel path's pair list to bucket*k entries — the per-pair-program
    fixed cost dominates batched decode, so this is what actually makes a
    partially-idle batch cheaper (the scheduler compiles one loop per
    power-of-2 occupancy bucket)."""
    ovf = None
    if not cfg.is_moe_layer(layer):
        return _dense_glu(lp.w1, lp.w2, lp.w3, xb, cfg, impl, ctx,
                          w13=lp.w13), ovf

    router_logits = jnp.einsum(
        "btd,ed->bte", xb.astype(jnp.float32), lp.moegate,
        preferred_element_type=jnp.float32)
    weights, idx = moe_gate(router_logits, lp.moegate_bias, cfg)  # (B,T,k)

    dtype = xb.dtype
    # shared-expert fold (loader.fuse_projections): the shared experts sit
    # at the tail of the tables as always-on slots with weight 1.0 — one
    # expert path covers routed + shared, no separate dense GEMMs
    folded = lp.w13s is not None
    if folded:
        Bq, Tq, _ = idx.shape
        ns = cfg.n_shared_experts
        n_exp = cfg.n_routed_experts + ns
        sid = jnp.arange(cfg.n_routed_experts, n_exp, dtype=idx.dtype)
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(sid, (Bq, Tq, ns))], axis=-1)
        weights = jnp.concatenate(
            [weights, jnp.ones((Bq, Tq, ns), weights.dtype)], axis=-1)
        t_w1, t_w2, t_w3, t_w13 = None, lp.w2s, None, lp.w13s
    else:
        n_exp = cfg.n_routed_experts
        t_w1, t_w2, t_w3, t_w13 = lp.w1, lp.w2, lp.w3, lp.w13

    from deepseek_tpu.ops.matmul import LayerSlicedQT, per_tensor_fp8
    # per-tensor fp8 (scalar scales) has no fused expert kernel — the
    # dequant is one XLA multiply, so those tables run the gather/dense
    # formulations (qmm_experts/qmm_grouped assert on the (0,0) grid)
    w1_probe0 = t_w13 if t_w13 is not None else t_w1
    impl_ffn = None if (w1_probe0 is not None
                        and per_tensor_fp8(w1_probe0)) else impl

    # SMALL prefill chunks route through the decode-style pair dispatch
    # below instead of the grouped/dense chunk formulations: the grouped
    # path pays a fixed floor of ~E single-expert 128-row tiles of MXU
    # work per chunk (it amortizes beautifully at T >= 128 where tokens
    # fill the tiles, but a 5-token speculative VERIFY chunk measured
    # ~1.9 ms/layer — 10x a decode step); the pair path computes exactly
    # the N = B*T*k pair rows and reads only the distinct experts hit.
    _B0, _T0, _k0 = idx.shape
    small_prefill = (prefill and impl_ffn is not None
                     and _B0 * _T0 * _k0 <= _PAIR_PREFILL_MAX_PAIRS)

    if (prefill and not small_prefill) or impl_ffn is None:
        # only the pair-dispatch kernel path below can index a scanned
        # layer stack in place (expert_table); every other branch consumes
        # the materialized slice (XLA fallback / grouped prefill — an
        # extra slice copy per chunk there, amortized over the chunk)
        def _mat(t):
            return t.materialize() if isinstance(t, LayerSlicedQT) else t
        t_w1, t_w2, t_w3, t_w13 = map(_mat, (t_w1, t_w2, t_w3, t_w13))

    if active is not None and (prefill or impl_ffn is None):
        # Non-kernel paths: collapse inactive rows (empty/finished serving
        # slots, shared-expert slots included) onto expert 0 with weight 0.
        # The kernel decode path instead hands ``active`` to
        # ctx.dispatch_pairs, which sorts dead pairs last and supports the
        # static ``active_bucket`` truncation.
        a = active.reshape(-1, 1, 1)
        idx = jnp.where(a, idx, 0)
        weights = jnp.where(a, weights, 0.0)

    from deepseek_tpu.ops.matmul import grouped_expert_ffn, grouped_ffn_supported
    w1_probe = t_w13 if t_w13 is not None else t_w1
    if (prefill and impl is not None and not small_prefill
            and grouped_ffn_supported(cfg, w1_probe)):
        # ragged grouped matmul (megablocks gmm): FLOPs scale with the k
        # routed experts per token, not all E — and with ~cf*k/EP under
        # expert parallelism (owned-pair compaction) — see grouped_expert_ffn
        out, ovf = grouped_expert_ffn(t_w1, t_w2, t_w3, xb, weights, idx,
                                      cfg.act, ctx,
                                      interpret=impl["interpret"],
                                      w13=t_w13)
    elif prefill and not small_prefill:
        # dense-over-experts fallback: every expert read once per chunk;
        # routing weights scatter-combined through a (B,T,E) matrix
        wmat = jax.nn.one_hot(idx, n_exp, dtype=jnp.float32) \
            * weights[..., None]
        wmat = ctx.local_expert_slice(wmat.sum(axis=-2), n_exp)   # (B,T,E_l)
        if t_w13 is not None:
            d13 = t_w13.dequant(dtype)                            # (E_l,2m,dim)
            m = d13.shape[-2] // 2
            d1, d3 = d13[..., :m, :], d13[..., m:, :]
        else:
            d1 = t_w1.dequant(dtype)                              # (E_l,m,dim)
            d3 = t_w3.dequant(dtype)
        h = glu_act(
            jnp.einsum("btn,emn->btem", xb, d1, preferred_element_type=jnp.float32).astype(dtype),
            jnp.einsum("btn,emn->btem", xb, d3, preferred_element_type=jnp.float32).astype(dtype),
            cfg.act)
        d2 = t_w2.dequant(dtype)                                  # (E_l,dim,m)
        per_e = jnp.einsum("btem,edm->bted", h, d2, preferred_element_type=jnp.float32)
        out = ctx.psum_e(jnp.einsum("bted,bte->btd", per_e, wmat)).astype(dtype)
    elif impl_ffn is not None:
        # decode hot path (and small prefill chunks): scalar-prefetch
        # expert kernel — only the distinct selected experts' packed bytes
        # leave HBM (the XLA gather reads all E). The pair list is
        # expert-sorted (EP ownership folded in) so repeated experts'
        # weight tiles are fetched ONCE: per-shard traffic scales with
        # distinct owned experts, ~k/EP under expert parallelism.
        from deepseek_tpu.ops.matmul import expert_table
        from deepseek_tpu.ops.pallas.qmm import qmm_experts
        B, T, k = idx.shape
        assert T == 1 or prefill
        Bt = B * T
        n_keep = None
        if active_bucket is not None:
            assert T == 1
            n_keep = min(int(active_bucket) * k, B * k)
        lidx, wts, tok = ctx.dispatch_pairs(
            idx.reshape(Bt, k), weights.reshape(Bt, k), n_exp,
            active=None if active is None else active.reshape(B),
            n_keep=n_keep)                                         # (M,) each
        x2 = xb.reshape(Bt, -1)                                    # (Bt, dim)
        xk = x2[tok][None]                                         # (1, N, dim)
        lidx2 = lidx[None]                                         # (1, N)
        # pair-major grid when the sorted pair list cannot contain expert
        # repeats: a SINGLE token's top-k + shared slots are all distinct
        # and there is no EP dead-pair aliasing, so the weight-DMA elision
        # the pair-minor grid exists for has nothing to elide — the
        # pair-major order instead loads x once per pair and streams each
        # expert's tiles sequentially (see qmm_experts docstring)
        pm = Bt == 1 and ctx.ep == 1
        # expert_table: a scanned layer stack merges (layer, expert) into
        # one gather axis — idx offset li*E, no weight copies
        if t_w13 is not None:
            from deepseek_tpu.ops.pallas.qmm import (
                expert_ffn_fusable, qmm_expert_ffn,
            )
            tw13, lx13 = expert_table(t_w13, lidx2)
            tw2, lx2 = expert_table(t_w2, lidx2)
            fused = pm and expert_ffn_fusable(tw13, tw2)
            if fused:
                # single-token decode: ONE fused kernel runs the whole
                # expert chain (w13 -> GLU -> w2 -> weighted combine) with
                # h resident in VMEM — no h round trip, no segment-sum,
                # one launch instead of three (infer.cpp:853-878 runs the
                # whole expert in one loop pass)
                y = qmm_expert_ffn(tw13, tw2, lx13[0], x2, wts, cfg.act,
                                   interpret=impl["interpret"])
                out = ctx.psum_e(y.reshape(B, T, -1)).astype(dtype)
            # rowperm w13 (nibble): h leaves the kernel already in
            # `_perm_x` order per half — tell the w2 kernel to skip its
            # activation permute
            rp = bool(getattr(tw13, "rowperm", 0))
            if not fused:
                h2 = qmm_experts(tw13, lx13, xk,
                                 interpret=impl["interpret"],
                                 pair_major=pm).astype(dtype)
                m = h2.shape[-1] // 2
                h = glu_act(h2[..., :m], h2[..., m:], cfg.act)     # (1, N, m)
        else:
            fused = False
            rp = False
            tw1, lx1 = expert_table(t_w1, lidx2)
            tw3, lx3 = expert_table(t_w3, lidx2)
            h = glu_act(
                qmm_experts(tw1, lx1, xk, interpret=impl["interpret"],
                            pair_major=pm).astype(dtype),
                qmm_experts(tw3, lx3, xk, interpret=impl["interpret"],
                            pair_major=pm).astype(dtype),
                cfg.act)                                           # (1, N, m)
            tw2, lx2 = expert_table(t_w2, lidx2)
        if not fused:
            per = qmm_experts(tw2, lx2, h, interpret=impl["interpret"],
                              pair_major=pm, x_prepermuted=rp)[0]
            out = jax.ops.segment_sum(per * wts[:, None], tok,
                                      num_segments=Bt)
            out = ctx.psum_e(out.reshape(B, T, -1)).astype(dtype)
    else:
        # decode: gather only the k active experts' quantized weights
        idx, weights = ctx.expert_slots(idx, weights, n_exp)
        if t_w13 is not None:
            d13 = gather_experts(t_w13, idx).dequant(dtype)       # (B,T,k,2m,dim)
            m = d13.shape[-2] // 2
            w1k, w3k = d13[..., :m, :], d13[..., m:, :]
        else:
            w1k = gather_experts(t_w1, idx).dequant(dtype)        # (B,T,k,m,dim)
            w3k = gather_experts(t_w3, idx).dequant(dtype)
        h = glu_act(
            jnp.einsum("btn,btkmn->btkm", xb, w1k, preferred_element_type=jnp.float32).astype(dtype),
            jnp.einsum("btn,btkmn->btkm", xb, w3k, preferred_element_type=jnp.float32).astype(dtype),
            cfg.act)
        w2k = gather_experts(t_w2, idx).dequant(dtype)            # (B,T,k,dim,m)
        per_k = jnp.einsum("btkm,btkdm->btkd", h, w2k, preferred_element_type=jnp.float32)
        out = ctx.psum_e((per_k * weights[..., None]).sum(axis=2)).astype(dtype)

    if not folded and cfg.n_shared_experts > 0 and (
            lp.shared_w1 is not None or lp.shared_w13 is not None):
        out = out + _dense_glu(lp.shared_w1, lp.shared_w2, lp.shared_w3, xb,
                               cfg, impl, ctx, w13=lp.shared_w13)
    return out, ovf


def run_layer_stack(layers, cache, x, pos_vec, cache_start, kv_len, kv_sink,
                    cfg: ModelConfig, prefill: bool, impl, ctx,
                    layer_base: int = 0, active=None, active_bucket=None):
    """Run a contiguous range of transformer layers over activations ``x``.

    ``layers`` index into ``cache`` locally (a pipeline stage's cache holds
    only its own layers); ``layer_base`` is the global index of layers[0]
    (MoE/dense selection and debug labels are global). Returns
    (x, cache, ovf_total) — see _ffn for the EP overflow count.
    """
    from deepseek_tpu.models.params import StackedLayers
    from deepseek_tpu.utils.debug import capture_active

    _RAW = frozenset({"attn_norm", "ffn_norm", "kv_a_norm", "q_a_norm",
                      "moegate", "moegate_bias"})

    def _layer_view(lp_stacked, gi):
        """Per-iteration view of a stacked LayerParams: raw arrays (norms,
        gate — KB-scale) slice at the traced group index; QTensor weights
        wrap as LayerSlicedQT so the kernels index the stack in place."""
        import dataclasses as _dc

        from deepseek_tpu.ops.matmul import LayerSlicedQT
        kw = {}
        for f in _dc.fields(type(lp_stacked)):
            v = getattr(lp_stacked, f.name)
            if v is None:
                kw[f.name] = None
            elif f.name in _RAW:
                kw[f.name] = v[gi]
            else:
                kw[f.name] = LayerSlicedQT(v, gi)
        return type(lp_stacked)(**kw)

    def one_layer(lp, x, cache, local, layer_static, label):
        """One transformer layer. ``local`` may be a TRACED index (scan) —
        every cache access is [local]-indexed so it lowers to dynamic
        slices; ``layer_static`` must be a static int for the MoE/dense
        branch (is_moe_layer) and is the representative global index for
        a scanned group (homogeneity guaranteed by stack_layer_groups)."""
        xb = rmsnorm(x, lp.attn_norm, cfg.norm_eps)
        dbg(f"l{label}.attn_norm", xb)
        attn, cache = _attention(
            lp, cfg, xb, cache, local, pos_vec, cache_start, kv_len, kv_sink,
            prefill, impl, ctx)
        dbg(f"l{label}.attn", attn)
        x = x + attn
        xb = rmsnorm(x, lp.ffn_norm, cfg.norm_eps)
        dbg(f"l{label}.ffn_norm", xb)
        ffn, ovf = _ffn(lp, cfg, xb, layer_static, prefill, impl, ctx,
                        active=active, active_bucket=active_bucket)
        dbg(f"l{label}.ffn", ffn)
        return x + ffn, cache, ovf

    ovf_total = jnp.int32(0)
    local = 0
    for entry in layers:
        layer = layer_base + local
        if isinstance(entry, StackedLayers) and capture_active():
            # debug capture needs one static label per layer: expand the
            # stack into per-layer slices (slow path, debug only)
            entry = [jax.tree.map(lambda a, k=k: a[k], entry.lp)
                     for k in range(entry.n)]
        if isinstance(entry, StackedLayers):
            # one lax.scan over the stacked group: compiled program size
            # stays depth-independent (unrolled deep stacks cross the TPU
            # program-size cliff — see StackedLayers docstring). The
            # stacked WEIGHTS stay loop-invariant closures wrapped as
            # LayerSlicedQT views — scanning them as xs would materialize
            # a full per-layer HBM copy each iteration to feed the opaque
            # Pallas kernels (measured 85 -> 19 tok/s); the kernel paths
            # instead index the stack via scalar prefetch, copy-free.
            def body(carry, li, layer=layer, local0=local, entry=entry):
                x, cache, ovf_t = carry
                lp_i = _layer_view(entry.lp, li - local0)
                x, cache, ovf = one_layer(lp_i, x, cache, li, layer,
                                          f"stack{layer}")
                if ovf is not None:
                    ovf_t = ovf_t + ovf
                return (x, cache, ovf_t), None
            lidx = jnp.arange(local, local + entry.n, dtype=jnp.int32)
            (x, cache, ovf_total), _ = jax.lax.scan(
                body, (x, cache, ovf_total), lidx)
            local += entry.n
        elif isinstance(entry, list):      # debug expansion of a stack
            for lp in entry:
                x, cache, ovf = one_layer(lp, x, cache, local,
                                          layer_base + local,
                                          layer_base + local)
                if ovf is not None:
                    ovf_total = ovf_total + ovf
                local += 1
        else:
            x, cache, ovf = one_layer(entry, x, cache, local, layer,
                                      layer)
            if ovf is not None:
                ovf_total = ovf_total + ovf
            local += 1
    return x, cache, ovf_total


def decode_positions(cfg: ModelConfig, B: int, pos0):
    """Per-sequence decode ring/sink position math, shared by
    ``_forward_impl`` and the pipeline stages (parallel.pipeline) so the
    two execution paths cannot diverge on ring semantics.

    Returns (pos_vec (B,1), cache_start (B,), kv_len (B,), kv_sink)."""
    pos_b = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (B,))
    kv_sink, kv_pos, kv_len = ring_positions(cfg, pos_b)        # all (B,)
    return pos_b[:, None], kv_pos, kv_len, kv_sink


def final_logits(final_norm, lm_head, x, cfg: ModelConfig, impl,
                 logits_mode: str, gather=None, cp_fixup=None):
    """Final-norm + lm_head tail shared by ``_forward_impl`` and the last
    pipeline stage. ``gather`` injects the TP vocab all-gather; ``cp_fixup``
    the context-parallel row reassembly (both identity when absent)."""
    if logits_mode == "last":
        x = x[:, -1:]     # under CP: each shard's LOCAL last row (cheap)
    x = rmsnorm(x, final_norm, cfg.norm_eps)
    logits = qmatmul(lm_head, x.astype(jnp.float32), impl=impl)
    if gather is not None:
        logits = gather(logits)
    if cp_fixup is not None:
        logits = cp_fixup(logits)
    if logits_mode == "last":
        logits = logits[:, 0]
    return logits


def _forward_impl(params: ModelParams, cache: KVCache, tokens: jnp.ndarray,
                  pos0, cfg: ModelConfig, prefill: bool, logits_mode: str,
                  ctx=None, with_hidden: bool = False,
                  with_ovf: bool = False, active=None, active_bucket=None
                  ) -> Tuple[Optional[jnp.ndarray], KVCache]:
    if ctx is None:
        from deepseek_tpu.parallel.spmd import NULL_CTX as ctx
    B, T = tokens.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    # Under shard_map (ctx) operands are local shards, so the Pallas kernels
    # run unchanged per shard; under GSPMD jit they require unsharded
    # operands (pallas_call is opaque to the partitioner). Prefill uses the
    # same fused-dequant kernels (batch-tiled) so quantized weights never
    # materialize; MoE routing picks its prefill formulation in _ffn.
    impl = kernel_impl(cfg, prefill=prefill)

    pos0 = jnp.asarray(pos0, jnp.int32)
    if prefill and pos0.ndim == 1:
        # VERIFY MODE: prefill semantics with per-sequence chunk positions —
        # each batch row writes+attends its own T slots starting at pos0[b]
        # (the batched speculative-verify primitive; see
        # speculative.make_batched_ngram_spec_rounds). Strictly inside the
        # ring window (no sink rotation, slot index == position) — the
        # caller guards pos0 + T <= kv_window per row.
        assert not ctx.cp and ctx.sp == 1, \
            "verify mode does not compose with seq/context parallelism"
        pos_vec = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)   # (B, T)
        cache_start, kv_len, kv_sink = pos0, None, None
    elif prefill:
        assert pos0.ndim == 0, "prefill requires a shared scalar position"
        # context-parallel prefill: when the chunk divides the seq axis,
        # shard its ROWS over 'seq' — the embedding gather, projections,
        # FFN and lm_head then run on T/sp rows per shard instead of being
        # replicated sp times. _attention gathers Q/KV rows and
        # reduce-scatters merged partials (SpmdCtx.cp_gather_rows /
        # cp_merge_scatter).
        if ctx.sp > 1 and T % ctx.sp == 0 and not ctx.cp:
            import dataclasses as _dc
            ctx = _dc.replace(ctx, cp=True)
        if ctx.cp:
            sidx_cp, t_loc = ctx.cp_rows(T)
            tokens = jax.lax.dynamic_slice_in_dim(tokens, sidx_cp * t_loc,
                                                  t_loc, axis=1)
            pos_vec = pos0 + sidx_cp * t_loc \
                + jnp.arange(t_loc, dtype=jnp.int32)
        else:
            pos_vec = pos0 + jnp.arange(T, dtype=jnp.int32)
        cache_start, kv_len, kv_sink = pos0, None, None
    else:
        assert T == 1, "decode mode processes one token per call"
        # per-sequence positions: scalar pos0 broadcasts to the batch
        pos_vec, cache_start, kv_len, kv_sink = decode_positions(cfg, B, pos0)

    x = embed_lookup(params.embed, tokens, jnp.float32).astype(dtype)
    dbg("embed", x)
    x, cache, ovf_total = run_layer_stack(
        params.layers, cache, x, pos_vec, cache_start, kv_len, kv_sink,
        cfg, prefill, impl, ctx,
        active=None if prefill else active,
        active_bucket=None if prefill else active_bucket)

    if with_ovf:
        if ctx.cp:
            # CP shards each counted only their own rows' overflows
            ovf_total = jax.lax.psum(ovf_total, ctx.seq_axis)
        ovf_total = ctx.psum_d(ovf_total)   # global count across DP shards

    def ret(logits, cache):
        out = (logits,)
        if with_hidden:
            out += (hidden,)
        if with_ovf:
            out += (ovf_total,)
        return out + (cache,)

    hidden = x  # (B, T, dim) pre-final-norm — what the MTP module consumes
    if logits_mode == "none":
        return ret(None, cache)
    cp_fixup = None
    if ctx.cp:
        def cp_fixup(logits):
            if logits_mode == "last":
                # the global last row lives on the last seq shard: a masked
                # psum selects it (logits must leave the body replicated)
                sel = (sidx_cp == ctx.sp - 1).astype(logits.dtype)
                return jax.lax.psum(logits * sel, ctx.seq_axis)
            # "all": lm_head ran on local rows (split sp ways); reassemble
            return ctx.cp_gather_rows(logits)
    logits = final_logits(params.final_norm, params.lm_head, x, cfg, impl,
                          logits_mode, gather=ctx.gather_logits,
                          cp_fixup=cp_fixup)
    dbg("logits", logits)
    return ret(logits, cache)


def _spmd_parts(cfg: ModelConfig, mesh, params, cache):
    """(ctx, in/out pspecs) for wrapping a forward body in shard_map."""
    from jax.sharding import PartitionSpec as P
    from deepseek_tpu.models.loader import unfuse_projections
    from deepseek_tpu.parallel.sharding import cache_pspecs, param_pspecs
    from deepseek_tpu.parallel.spmd import make_ctx
    assert params is not None and cache is not None, \
        "mesh execution needs example params/cache pytrees to derive specs"
    ctx = make_ctx(cfg, mesh)
    # specs describe the UNFUSED layout shard_params produces
    pspec = param_pspecs(unfuse_projections(params, cfg), cfg, mesh)
    cspec = cache_pspecs(cache, cfg, mesh)
    return ctx, pspec, cspec, P


def _params_span_devices(params) -> bool:
    """True when any param leaf is laid out across >1 device (GSPMD run)."""
    try:
        for leaf in jax.tree.leaves(params):
            sh = getattr(leaf, "sharding", None)
            if sh is not None and getattr(sh, "num_devices", 1) > 1:
                return True
    except Exception as e:
        # the probe guards a correctness-relevant gate: never fail silently
        import logging
        logging.getLogger("deepseek_tpu").warning(
            "could not inspect param shardings (%r); assuming single-device "
            "layout — if these params ARE sharded under plain jit, Pallas "
            "kernels may force per-chip weight replication", e)
        return False
    return False


_warned_gspmd = False

# mesh axis names the sharding rules / SpmdCtx collectives are written for
_MESH_AXES = frozenset({"data", "expert", "tensor", "seq"})


def _named_mesh(params):
    """The common concrete Mesh behind the params' NamedShardings, or None
    when leaves are unsharded, use another sharding type, or disagree."""
    from jax.sharding import Mesh, NamedSharding
    meshes = set()
    for leaf in jax.tree.leaves(params):
        sh = getattr(leaf, "sharding", None)
        if sh is None:
            continue
        if not isinstance(sh, NamedSharding):
            return None
        meshes.add(sh.mesh)
    if len(meshes) != 1:
        return None
    (mesh,) = meshes
    if not isinstance(mesh, Mesh):       # AbstractMesh has no devices
        return None
    if not set(mesh.axis_names) <= _MESH_AXES:
        return None
    return mesh


def _gspmd_kernel_gate(cfg: ModelConfig, build, build_mesh=None):
    """Wrap a jitted-forward builder so multi-device GSPMD calls keep the
    Pallas kernels by auto-upgrading to the shard_map body.

    pallas_call is opaque to the GSPMD partitioner: under plain jit with
    NamedSharding params, XLA would all-gather/replicate the sharded weight
    operands per chip before a Pallas kernel — defeating TP/EP memory
    savings (and an OOM risk at full model scale). When the params' own
    NamedShardings expose a usable mesh (standard axis names, divisible
    config — ``make_ctx`` validates), the first call rebuilds the function
    through ``build_mesh`` as one shard_map-in-jit island over that mesh:
    the user-facing GSPMD route (``shard_params`` + plain ``jit``) then runs
    the exact explicit-collective body ``make_forward(mesh=...)`` builds,
    fused kernels included (VERDICT r1 #9). Only when no mesh can be
    recovered (foreign sharding types, non-divisible shapes, exotic axis
    names) does it fall back to XLA-dequant kernels with a warning.
    """
    import dataclasses as _dc
    state = {}

    def _fused_layout(params) -> bool:
        """The shard_map pspecs describe the UNFUSED projection layout
        (what shard_params produces); fused params (loader.fuse_projections)
        would hit a pytree-structure mismatch at first call — detect and
        fall back instead of crashing."""
        try:
            # scan EVERY layer: layer 0 can be dense with nothing fusible
            # (q_lora_rank=0 and a non-128-divisible hidden_dim) while MoE
            # layers fused w13/shared_w13 — layers[0] alone would let such
            # params slip through to a pytree-structure crash
            from deepseek_tpu.models.params import StackedLayers
            entries = [e.lp if isinstance(e, StackedLayers) else e
                       for e in params.layers]
            return any(
                getattr(lp, f, None) is not None
                for lp in entries
                for f in ("wkvq", "wcr", "w13", "w13s", "shared_w13"))
        except Exception:
            return False

    def _upgrade_or_fallback(params, rest):
        import logging
        log = logging.getLogger("deepseek_tpu")
        mesh = _named_mesh(params)
        if _fused_layout(params):
            mesh, fused_reason = None, \
                ("params are in the fused projection layout "
                 "(unfuse_projections before sharding to keep kernels)")
        else:
            fused_reason = None
        if build_mesh is not None and mesh is not None and rest:
            try:
                from deepseek_tpu.parallel.spmd import TRACE_COUNTS, make_ctx
                make_ctx(cfg, mesh)          # divisibility validation
                fn = build_mesh(mesh, params, rest[0])
                TRACE_COUNTS["gspmd_upgrade"] += 1   # test/dryrun evidence
                log.info(
                    "GSPMD params on mesh %s under plain jit: auto-upgraded "
                    "to the shard_map body (Pallas kernels stay active per "
                    "shard)", dict(mesh.shape))
                return fn
            except ValueError as e:
                reason = str(e)
        elif fused_reason is not None:
            reason = fused_reason
        elif mesh is None:
            reason = ("params' shardings expose no usable Mesh "
                      "(non-NamedSharding, mixed meshes, or non-standard "
                      "axis names)")
        else:
            reason = "this builder has no mesh form"
        global _warned_gspmd
        if not _warned_gspmd:
            _warned_gspmd = True
            log.warning(
                "multi-device params under plain jit (GSPMD) could not "
                "auto-upgrade to shard_map (%s): Pallas fused-dequant "
                "kernels disabled (opaque to the partitioner — XLA would "
                "replicate the sharded weights per chip). Use "
                "make_forward(mesh=...) to keep kernels on multi-chip.",
                reason)
        return build(_dc.replace(cfg, kernel_impl="xla"))

    def _sharding_key(params):
        """Hashable signature of the params' sharding layout. The
        upgraded/fallback decision depends on it, so the cache must be
        keyed on it: re-calling the same builder with differently-sharded
        (or unsharded) params must re-decide, not reuse a stale fn
        (VERDICT r2 #9). Single-device leaves collapse to None so
        unsharded trees share one entry regardless of device identity."""
        try:
            return tuple(
                (id(getattr(sh, "mesh", None)),
                 str(getattr(sh, "spec", sh)))
                if (sh := getattr(leaf, "sharding", None)) is not None
                and getattr(sh, "num_devices", 1) > 1 else None
                for leaf in jax.tree.leaves(params))
        except Exception:
            return None

    def wrapper(params, *rest, **kw):
        key = _sharding_key(params)
        if key not in state:
            if _params_span_devices(params) and kernel_impl(cfg) is not None:
                state[key] = _upgrade_or_fallback(params, rest)
            else:
                state[key] = build(cfg)
        return state[key](params, *rest, **kw)

    return wrapper


class EPCapacityOverflow(RuntimeError):
    """EP prefill routing skew exceeded the static capacity: the chunk's
    MoE output is missing contributions. Retry the chunk with
    ep_capacity_factor=0 (exact) or a larger factor.

    ``.cache`` / ``.logits`` carry the call's outputs: the input cache was
    DONATED (deleted on call), so the returned cache — pre-chunk rows
    valid, this chunk's rows incomplete — is the only live buffer; a retry
    of the SAME chunk through an exact-path forward overwrites the bad
    rows in place."""

    def __init__(self, msg: str, cache=None, logits=None):
        super().__init__(msg)
        self.cache = cache
        self.logits = logits


def make_forward(cfg: ModelConfig, *, prefill: bool = False,
                 logits_mode: str = "last", jit: bool = True,
                 mesh=None, params=None, cache=None,
                 with_hidden: bool = False, on_overflow: str = "raise"):
    """Build (and jit) a forward function for a fixed mode.

    Returns ``fn(params, cache, tokens (B,T) int32, pos0) -> (logits, cache)``
    with the cache donated, so decode is allocation-free steady-state.

    With ``mesh`` (plus example ``params``/``cache`` pytrees for spec
    derivation), the body runs under shard_map with explicit collectives —
    every operand inside is a local shard, so the Pallas kernels stay active
    on the multi-chip path. Logits come back replicated over the model axes
    and sharded over ``data`` on batch. Without ``mesh``, params that span
    devices (GSPMD jit) disable the Pallas kernels (see _gspmd_kernel_gate).
    """
    assert logits_mode in ("all", "last", "none")

    def build(cfg):
        fn = functools.partial(
            _forward_impl, cfg=cfg, prefill=prefill, logits_mode=logits_mode,
            with_hidden=with_hidden)
        return jax.jit(fn, donate_argnums=(1,)) if jit else fn

    if mesh is None:
        if not jit:
            return build(cfg)
        build_mesh = None
        if not with_hidden:       # the mesh body has no with_hidden form
            def build_mesh(m, ex_params, ex_cache):
                return make_forward(
                    cfg, prefill=prefill, logits_mode=logits_mode, jit=True,
                    mesh=m, params=ex_params, cache=ex_cache,
                    on_overflow=on_overflow)
        return _gspmd_kernel_gate(cfg, build, build_mesh)

    assert not with_hidden, "with_hidden is a single-host engine hook"
    ctx, pspec, cspec, P = _spmd_parts(cfg, mesh, params, cache)
    # EP prefill capacity compaction is INEXACT past the capacity. The
    # forward computes a global overflow count; by default
    # (on_overflow="raise") the wrapper checks it after each chunk — a tiny
    # scalar fetch piggybacking the dispatch — and raises
    # EPCapacityOverflow so callers retry with ep_capacity_factor=0.
    # on_overflow="return" exposes the raw (logits, ovf, cache) triple.
    assert on_overflow in ("raise", "return")
    with_ovf = (prefill and ctx.ep > 1 and cfg.ep_capacity_factor > 0)
    body = functools.partial(
        _forward_impl, cfg=cfg, prefill=prefill, logits_mode=logits_mode,
        with_hidden=with_hidden, with_ovf=with_ovf, ctx=ctx)
    out_specs = (P("data"),) + ((P(),) if with_ovf else ()) + (cspec,)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, cspec, P("data"), P()),
        out_specs=out_specs,
        check_vma=False)
    if jit:
        fn = jax.jit(fn, donate_argnums=(1,))
    if with_ovf and on_overflow == "raise":
        inner = fn

        def checked(params, cache, tokens, pos0):
            # NOTE: int(ovf) synchronizes on chunk completion — back-to-back
            # chunk dispatches no longer pipeline (a ~RTT per chunk on
            # remote-attached chips). Pipelines that care should use
            # on_overflow="return" and resolve the (tiny) ovf scalars
            # asynchronously / once per hydrate.
            logits, ovf, cache = inner(params, cache, tokens, pos0)
            if int(ovf) > 0:
                raise EPCapacityOverflow(
                    f"{int(ovf)} token-expert pairs overflowed the EP "
                    f"prefill capacity (ep_capacity_factor="
                    f"{cfg.ep_capacity_factor}); retry the chunk with "
                    f"ep_capacity_factor=0 (exact) or raise the factor "
                    f"(the valid returned cache is on the exception's "
                    f".cache — the donated input buffer is gone)",
                    cache=cache, logits=logits)
            return logits, cache
        return checked
    return fn


def make_decode_loop(cfg: ModelConfig, n_steps: int, *, jit: bool = True,
                     mesh=None, params=None, cache=None,
                     active_bucket: Optional[int] = None,
                     with_logprobs: bool = False,
                     with_hidden: bool = False):
    """Fused multi-token decode: one dispatch runs ``n_steps`` forward+sample
    iterations as a lax.scan with the feedback token staying on device.

    This is the TPU serving shape — per-dispatch host overhead (pytree
    flattening, runtime round-trips) is amortized over the whole block.

    Returns ``fn(params, cache, tok (B,1) int32, pos0, key, temperature,
    top_p, active=None, top_k=0, min_p=0.0) -> (tokens (B, n_steps) int32,
    logits_last (B,V), cache)`` where ``tok`` is the already-sampled token
    to feed first;
    ``tokens`` are the n_steps tokens sampled on device (tokens[:, 0] is
    the successor of tok). ``active`` (B,) bool marks live batch rows
    (continuous batching); inactive rows skip MoE expert fan-out
    (see _ffn) — None means all live.

    ``with_logprobs`` inserts the sampled tokens' log-softmax values as a
    third result: ``(tokens, logits_last, logprobs (B, n_steps) f32,
    cache)`` — (B,) per step, so the serving API's per-token logprobs
    cost nothing next to the forward. Only the LAST step's full logits
    leave the scan either way (the (n_steps, B, V) stack a naive scan
    would materialize is ~130 MB at V3 vocab/B=8).
    """
    from deepseek_tpu.ops.sampling import sample_token

    ctx = None
    if mesh is not None:
        assert not with_hidden, "with_hidden decode loop is single-host"
        ctx, pspec, cspec, P = _spmd_parts(cfg, mesh, params, cache)

    def make_loop(cfg):
        fwd = functools.partial(
            _forward_impl, cfg=cfg, prefill=False, logits_mode="last",
            ctx=ctx, active_bucket=active_bucket, with_hidden=with_hidden)

        def loop(params, cache, tok, pos0, key, temperature, top_p,
                 active=None, top_k=0, min_p=0.0):
            pos0 = jnp.asarray(pos0, jnp.int32)
            if ctx is not None and ctx.dp > 1:
                # the key arrives replicated; fold in the data-shard index
                # so DP shards draw independent sampling noise
                key = jax.random.fold_in(key, jax.lax.axis_index("data"))

            B = tok.shape[0]
            logits0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
            hid0 = jnp.zeros((B, 1, cfg.dim), jnp.float32)

            def body(carry, i):
                cache, tok, key, _, _ = carry
                if with_hidden:
                    logits, hid, cache = fwd(params, cache, tok, pos0 + i,
                                             active=active)
                    hid = hid.astype(jnp.float32)
                else:
                    logits, cache = fwd(params, cache, tok, pos0 + i,
                                        active=active)
                    hid = hid0
                key, sub = jax.random.split(key)
                nxt = sample_token(logits, sub, temperature, top_p,
                                   top_k=top_k, min_p=min_p)
                if with_logprobs:
                    lsm = jax.nn.log_softmax(logits, axis=-1)
                    lp = jnp.take_along_axis(
                        lsm, nxt[:, None], axis=1)[:, 0].astype(jnp.float32)
                else:
                    lp = jnp.zeros((), jnp.float32)
                # the last step's logits (and hidden, for the MTP drafter)
                # ride the CARRY: emitting them as a scan output would
                # materialize an (n_steps, B, V) stack
                return (cache, nxt[:, None], key,
                        logits.astype(jnp.float32), hid), (nxt, lp)

            (cache, _, _, logits_last, hid_last), (tokens, lps) = \
                jax.lax.scan(body, (cache, tok, key, logits0, hid0),
                             jnp.arange(n_steps, dtype=jnp.int32))
            out = (jnp.swapaxes(tokens, 0, 1), logits_last)
            if with_logprobs:
                out += (jnp.swapaxes(lps, 0, 1),)
            if with_hidden:
                out += (hid_last,)
            return out + (cache,)

        return loop

    if mesh is None:
        def build(cfg):
            loop = make_loop(cfg)
            return jax.jit(loop, donate_argnums=(1,)) if jit else loop

        def build_mesh(m, ex_params, ex_cache):
            return make_decode_loop(cfg, n_steps, jit=True, mesh=m,
                                    params=ex_params, cache=ex_cache,
                                    active_bucket=active_bucket,
                                    with_logprobs=with_logprobs,
                                    with_hidden=with_hidden)
        return (_gspmd_kernel_gate(cfg, build, build_mesh) if jit
                else build(cfg))

    # whole rollout under one shard_map: the sampled-token feedback and all
    # collectives stay inside a single scan body per step. pos0/temperature/
    # top_p are broadcast to per-sequence (B,) vectors OUTSIDE the shard_map
    # and batch-sharded with the tokens, so per-slot sampling params (the
    # continuous-batching scheduler) work under dp > 1.
    inner = jax.shard_map(
        make_loop(cfg), mesh=mesh,
        in_specs=(pspec, cspec, P("data"), P("data"), P(), P("data"),
                  P("data"), P("data"), P("data"), P("data")),
        out_specs=((P("data"), P("data"), P("data"), cspec)
                   if with_logprobs else (P("data"), P("data"), cspec)),
        check_vma=False)

    def loop(params, cache, tok, pos0, key, temperature, top_p, active=None,
             top_k=0, min_p=0.0):
        B = tok.shape[0]
        bvec = lambda v, dt: jnp.broadcast_to(
            jnp.asarray(v, dt).reshape(-1), (B,))
        if active is None:
            active = jnp.ones((B,), jnp.bool_)
        return inner(params, cache, tok, bvec(pos0, jnp.int32), key,
                     bvec(temperature, jnp.float32), bvec(top_p, jnp.float32),
                     bvec(active, jnp.bool_), bvec(top_k, jnp.float32),
                     bvec(min_p, jnp.float32))

    if jit:
        loop = jax.jit(loop, donate_argnums=(1,))
    return loop
