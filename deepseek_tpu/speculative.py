"""Fused on-device speculative decoding.

The host-orchestrated speculation loop costs one dispatch round trip per
draft token plus two per verify round — 50-70 ms each on a remote-attached
chip (CLAUDE.md), which swamps the algorithmic win. These builders fuse
``rounds`` complete speculation rounds (draft-k via lax.scan, one chunked
target verify, the arXiv 2211.17192 acceptance rule, cache bookkeeping)
into ONE jitted dispatch, so a round costs ~1/(k+2) of a host-loop round.

Losslessness: acceptance uses the same nucleus distributions the samplers
draw from (ops.sampling.nucleus_dist), so outputs follow the target model's
distribution exactly; greedy (temperature=0) outputs are token-identical to
plain decode. Rejected draft cache rows need no rollback — a ring slot is
rewritten whenever its position is actually fed, and kv_len masking never
exposes a slot before that (the same argument covers rounds the host
discards after an early EOS: the device may have advanced further, but
every slot past the host's position is rewritten before it is attended).

Both builders run strictly inside the prefill window (no sink rotation
interaction); the engine guards ``pos + rounds*(k+1) <= window`` and falls
back to its stepwise path beyond.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models.deepseek import _forward_impl
from deepseek_tpu.ops.sampling import nucleus_dist, sample_token


def _accept(ps, qs, drafts, spec_k, key):
    """In-graph speculative acceptance. ps (k+1, V) target nucleus dists,
    qs (k, V) draft dists, drafts (k,). Returns (n_acc, next_token)."""
    pd = jnp.take_along_axis(ps[:spec_k], drafts[:, None], axis=1)[:, 0]
    qd = jnp.take_along_axis(qs, drafts[:, None], axis=1)[:, 0]
    ku, kr, kb = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (spec_k,))
    acc = u < jnp.minimum(1.0, pd / jnp.maximum(qd, 1e-12))
    n_acc = jnp.cumprod(acc.astype(jnp.int32)).sum()
    # residual distribution at the first rejected position
    i = jnp.minimum(n_acc, spec_k - 1)
    res = jnp.maximum(ps[i] - qs[i], 0.0)
    rs = res.sum()
    res = jnp.where(rs > 0, res / jnp.maximum(rs, 1e-30), ps[i])
    repl = jax.random.categorical(kr, jnp.log(jnp.maximum(res, 1e-30)))
    bonus = jax.random.categorical(kb, jnp.log(jnp.maximum(ps[spec_k], 1e-30)))
    nxt = jnp.where(n_acc == spec_k, bonus, repl).astype(jnp.int32)
    return n_acc, nxt


def make_spec_rounds(cfg_t: ModelConfig, cfg_d: ModelConfig,
                     spec_k: int, rounds: int, jit: bool = True,
                     greedy: bool = False):
    """Draft-model speculation (engine.generate_speculative's hot loop).

    Returns ``fn(pt, pd, ct, cd, tok (1,1), pos0, key, temperature, top_p)
    -> (drafts (R, k), n_acc (R,), next (R,), ct, cd)`` with both caches
    donated. Per round r the host emits drafts[r, :n_acc[r]] then next[r]
    and advances pos by n_acc[r] + 1.

    ``greedy`` (temperature == 0, known at build time) skips every nucleus
    distribution: drafts are argmax, acceptance is argmax equality, and
    next = argmax(target row n_acc) — several (V,)-wide passes cheaper per
    round.
    """
    fwd_t = functools.partial(_forward_impl, cfg=cfg_t, prefill=True,
                              logits_mode="all")
    fwd_d = functools.partial(_forward_impl, cfg=cfg_d, prefill=False,
                              logits_mode="last")

    def fn(pt, pd, ct, cd, tok, pos0, key, temperature, top_p):
        pos0 = jnp.asarray(pos0, jnp.int32)

        def one_round(carry, _):
            ct, cd, tok, pos, key = carry

            def dstep(c, i):
                cd, t, k2 = c
                lg, cd = fwd_d(pd, cd, t, pos + i)           # (1, V)
                if greedy:
                    d = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                    return (cd, d[:, None], k2), (d[0], jnp.float32(0))
                q = nucleus_dist(lg, temperature, top_p)
                k2, sub = jax.random.split(k2)
                d = sample_token(lg, sub, temperature, top_p)  # (1,)
                return (cd, d[:, None], k2), (d[0], q[0])

            (cd, _, key), (drafts, qs) = jax.lax.scan(
                dstep, (cd, tok, key), jnp.arange(spec_k, dtype=jnp.int32))

            chunk = jnp.concatenate([tok[0], drafts])[None]  # (1, k+1)
            lg_all, ct = fwd_t(pt, ct, chunk, pos)

            key, ka = jax.random.split(key)
            if greedy:
                tgt = jnp.argmax(lg_all[0], axis=-1).astype(jnp.int32)
                acc = tgt[:spec_k] == drafts
                n_acc = jnp.cumprod(acc.astype(jnp.int32)).sum()
                nxt = tgt[n_acc]     # replacement, or bonus when n_acc == k
            else:
                ps = nucleus_dist(lg_all[0], temperature, top_p)  # (k+1, V)
                n_acc, nxt = _accept(ps, qs, drafts, spec_k, ka)

            # keep the draft cache aligned for the full-accept case (the
            # bonus token is fed at pos+k+1 next); on partial accept this
            # writes a junk row that is rewritten before exposure
            _, cd = fwd_d(pd, cd, drafts[-1][None, None], pos + spec_k)

            pos = pos + n_acc + 1
            return (ct, cd, nxt[None, None], pos, key), (drafts, n_acc, nxt)

        (ct, cd, _, _, _), (drafts_r, nacc_r, next_r) = jax.lax.scan(
            one_round, (ct, cd, tok, pos0, key), length=rounds)
        return drafts_r, nacc_r, next_r, ct, cd

    if jit:
        fn = jax.jit(fn, donate_argnums=(2, 3))
    return fn


def _ngram_lookup(hist_row, hlen, H: int, ngram_max: int, ngram_min: int):
    """Longest-n most-recent match. hist_row (H,) int32; returns
    (start_of_continuation, matched) — start indexes the token that
    followed the matched n-gram."""
    start = jnp.int32(0)
    matched = jnp.bool_(False)
    # largest n wins: later (smaller-n) candidates only fill in when
    # nothing longer matched
    for n in range(ngram_max, ngram_min - 1, -1):
        pat = jax.lax.dynamic_slice(hist_row, (hlen - n,), (n,))
        # windows[i] = hist_row[i:i+n] compared elementwise (static
        # shifts; i ranges over 0..H-n)
        eq = jnp.ones((H - n + 1,), jnp.bool_)
        for j in range(n):
            eq = eq & (jax.lax.dynamic_slice_in_dim(
                hist_row, j, H - n + 1) == pat[j])
        idx = jnp.arange(H - n + 1, dtype=jnp.int32)
        # need >= 1 following token, and i == hlen-n is the suffix
        # itself; both excluded by i <= hlen-n-1
        ok = eq & (idx <= hlen - n - 1) & (hlen >= n + 1)
        best = jnp.max(jnp.where(ok, idx, -1))
        hit = best >= 0
        use = hit & ~matched
        start = jnp.where(use, best + n, start)
        matched = matched | hit
    return start, matched


def _accept_pointmass(ps, drafts, spec_k: int, key):
    """Batched acceptance for POINT-MASS drafts (prompt-lookup): the
    arXiv 2211.17192 rule with q = one-hot(draft) reduces to accept with
    probability p(draft); the residual is p with the draft token zeroed.
    ps (B, k+1, V) target nucleus dists, drafts (B, k).
    Returns (n_acc (B,), next_token (B,)).

    temperature == 0 rows need no special case: nucleus_dist gives a
    one-hot p, so acceptance degenerates to argmax equality and both
    residual and bonus draws are the argmax — greedy outputs are
    token-identical to plain decode."""
    B, _, V = ps.shape
    pd = jnp.take_along_axis(ps[:, :spec_k], drafts[:, :, None],
                             axis=2)[:, :, 0]                      # (B, k)
    ku, kr, kb = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (B, spec_k))
    acc = u < jnp.minimum(1.0, pd)
    n_acc = jnp.cumprod(acc.astype(jnp.int32), axis=1).sum(axis=1)  # (B,)
    # residual distribution at the first rejected position
    i = jnp.minimum(n_acc, spec_k - 1)
    p_i = jnp.take_along_axis(ps, i[:, None, None], axis=1)[:, 0]   # (B, V)
    d_i = jnp.take_along_axis(drafts, i[:, None], axis=1)           # (B, 1)
    res = jnp.where(jnp.arange(V, dtype=jnp.int32)[None, :] == d_i,
                    0.0, p_i)
    rs = res.sum(axis=-1, keepdims=True)
    res = jnp.where(rs > 0, res / jnp.maximum(rs, 1e-30), p_i)
    repl = jax.random.categorical(kr, jnp.log(jnp.maximum(res, 1e-30)),
                                  axis=-1)
    bonus = jax.random.categorical(
        kb, jnp.log(jnp.maximum(ps[:, spec_k], 1e-30)), axis=-1)
    nxt = jnp.where(n_acc == spec_k, bonus, repl).astype(jnp.int32)
    return n_acc, nxt


def make_batched_ngram_spec_rounds(cfg: ModelConfig, spec_k: int,
                                   rounds: int, hist_len: int,
                                   ngram_max: int = 3, ngram_min: int = 1,
                                   jit: bool = True,
                                   with_logprobs: bool = False,
                                   mesh=None, params=None, cache=None):
    """Prompt-lookup speculation for the CONTINUOUS-BATCHING scheduler:
    every live slot drafts from its own history and all slots verify in
    ONE fused dispatch per round via the per-row-position verify mode
    (`_forward_impl` with pos0 (B,) — each row's chunk writes+attends at
    its own offset).

    Per-slot sampling params ride along exactly like the plain decode
    loop's; acceptance is the lossless point-mass rule (_accept_pointmass)
    per row, so a greedy slot and a sampled slot coexist in one dispatch.

    Invariant: ``hist[b, :pos0[b]+1]`` is slot b's full token sequence
    (prompt + emitted) INCLUDING ``tok[b]`` at index pos0[b] — hlen is
    derived as pos+1 rather than carried. ``active`` freezes a row: its
    pos/tok/history stay put and its outputs are junk (the caller frees
    the slot); its cache writes land in dead rows, like warmup decode.

    The caller guards, over ACTIVE rows only:
      max(pos0) + rounds*(spec_k+1) <= kv_window   (strictly in-window)
    and hist_len >= that bound (the scheduler uses hist_len == window).

    Returns ``fn(params, ct, hist (B,H) i32, tok (B,1), pos0 (B,), key,
    temperature (B,), top_p (B,), active (B,), top_k (B,), min_p (B,))
    -> (drafts (R,B,k), n_acc (R,B), next (R,B), matched (R,B)[, lps
    (R,B,k+1)], ct, hist)`` with the target cache and hist donated. Per
    round r the host emits drafts[r,b,:n_acc[r,b]] then next[r,b] and
    advances pos[b] by n_acc[r,b]+1 (active rows).

    ``with_logprobs`` adds ``lps``: raw log-softmax of each emitted token
    from the verify chunk's logits (no temperature — the serving API's
    logprobs convention): lps[r,b,i] scores the i-th token round r emits
    (drafts for i < n_acc, the bonus/residual token at i == n_acc). The
    speculative path therefore composes with ``logprobs=True`` requests
    (VERDICT r4 #5b).

    ``mesh``: run every fused round under shard_map over the device mesh —
    the batch (hist/tok/pos/sampling params) DP-shards over 'data' and
    params/cache follow the standard sharding rules; the per-row lookup,
    verify chunk and acceptance are all row-local so nothing else changes
    (VERDICT r4 #5a). Verify mode excludes seq/context parallelism
    (models/deepseek._forward_impl), so the mesh must have seq == 1.
    """
    ctx = None
    if mesh is not None:
        from deepseek_tpu.models.deepseek import _spmd_parts
        ctx, pspec, cspec, P = _spmd_parts(cfg, mesh, params, cache)
        assert ctx.sp == 1, "spec serving mesh must not shard 'seq'"
    fwd_t = functools.partial(_forward_impl, cfg=cfg, prefill=True,
                              logits_mode="all", ctx=ctx)
    H = hist_len
    lookup = jax.vmap(
        lambda h, n: _ngram_lookup(h, n, H, ngram_max, ngram_min))

    def fn(params, ct, hist, tok, pos0, key, temperature, top_p,
           active, top_k, min_p):
        pos0 = jnp.asarray(pos0, jnp.int32)
        if ctx is not None and ctx.dp > 1:
            # replicated key in, independent acceptance noise per DP shard
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        B = tok.shape[0]
        off = jnp.arange(spec_k, dtype=jnp.int32)[None, :]

        def one_round(carry, _):
            ct, hist, tok, pos, key = carry
            hlen = pos + 1
            start, matched = lookup(hist, hlen)
            start = jnp.where(matched, start, hlen - 1)
            drafts = jax.vmap(
                lambda h, s: jax.lax.dynamic_slice(h, (s,), (spec_k,))
            )(hist, start)                                       # (B, k)
            last = jnp.take_along_axis(hist, (hlen - 1)[:, None], axis=1)
            drafts = jnp.where(start[:, None] + off < hlen[:, None],
                               drafts, last)

            chunk = jnp.concatenate([tok, drafts], axis=1)       # (B, k+1)
            lg_all, ct = fwd_t(params, ct, chunk, pos)           # verify mode

            key, ka = jax.random.split(key)
            ps = nucleus_dist(lg_all, temperature[:, None], top_p[:, None],
                              top_k[:, None], min_p[:, None])    # (B,k+1,V)
            n_acc, nxt = _accept_pointmass(ps, drafts, spec_k, ka)

            # append drafts[:n_acc] then nxt to each row's history; slots
            # past n_acc hold draft junk rewritten before hlen covers it
            emitted = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)
            emitted = jnp.where(
                jnp.arange(spec_k + 1, dtype=jnp.int32)[None, :]
                == n_acc[:, None], nxt[:, None], emitted)
            if with_logprobs:
                # raw log-softmax of the emitted tokens, gathered from the
                # verify chunk's own logits rows — zero extra forwards
                lsm = jax.nn.log_softmax(
                    lg_all.astype(jnp.float32), axis=-1)         # (B,k+1,V)
                lp = jnp.take_along_axis(
                    lsm, emitted[:, :, None], axis=2)[:, :, 0]   # (B, k+1)
            else:
                lp = jnp.zeros((), jnp.float32)
            hist = jax.vmap(
                lambda h, e, o: jax.lax.dynamic_update_slice(h, e, (o,))
            )(hist, emitted, hlen)
            adv = jnp.where(active, n_acc + 1, 0)
            tok = jnp.where(active[:, None], nxt[:, None], tok)
            return (ct, hist, tok, pos + adv, key), \
                (drafts, n_acc, nxt, matched, lp)

        (ct, hist, _, _, _), (drafts_r, nacc_r, next_r, match_r, lps_r) = \
            jax.lax.scan(one_round, (ct, hist, tok, pos0, key),
                         length=rounds)
        if with_logprobs:
            return drafts_r, nacc_r, next_r, match_r, lps_r, ct, hist
        return drafts_r, nacc_r, next_r, match_r, ct, hist

    if mesh is None:
        if jit:
            fn = jax.jit(fn, donate_argnums=(1, 2))
        return fn

    outs = ((P(None, "data"), P(None, "data"), P(None, "data"),
             P(None, "data"))
            + ((P(None, "data"),) if with_logprobs else ())  # lps
            + (cspec, P("data")))
    inner = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspec, cspec, P("data"), P("data"), P("data"), P(),
                  P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=outs, check_vma=False)
    if jit:
        inner = jax.jit(inner, donate_argnums=(1, 2))
    return inner


def make_ngram_spec_rounds(cfg: ModelConfig, spec_k: int, rounds: int,
                           hist_len: int, ngram_max: int = 3,
                           ngram_min: int = 1, jit: bool = True,
                           greedy: bool = False):
    """Prompt-lookup (n-gram) speculation: ZERO-cost drafting from the
    sequence's own history (engine.generate_ngram's hot loop).

    The drafter is a longest-suffix n-gram match: find the most recent
    earlier occurrence of the last n tokens (n = ngram_max down to
    ngram_min) in the prompt+generated history and propose the ``spec_k``
    tokens that followed it. No draft model, no extra weights streamed —
    a round costs ONE (k+1)-token target verify chunk. On workloads whose
    output echoes its context (summarization, RAG, code edit) acceptance
    is high and decode approaches verify-chunk speed; on novel text the
    host falls back to plain decode (engine adaptivity).

    Losslessness: the draft "distribution" is a point mass at the looked-
    up token, so the arXiv 2211.17192 rule reduces to accept-with-prob
    p(d); greedy outputs are token-identical to plain decode either way.

    Returns ``fn(params, ct, hist (1, hist_len) int32, hlen (), tok (1,1),
    pos0, key, temperature, top_p) -> (drafts (R, k), n_acc (R,),
    next (R,), matched (R,), ct, hist, hlen)``. ``hist`` holds the full
    token sequence so far (prompt + emitted) INCLUDING ``tok`` at index
    hlen-1; accepted tokens are appended in-graph. The engine must keep
    ``hlen + R*(k+1) <= hist_len`` per call (it already bounds rounds to
    the prefill window, and hist_len == window).
    """
    fwd_t = functools.partial(_forward_impl, cfg=cfg, prefill=True,
                              logits_mode="all")
    H = hist_len

    def lookup(hist_row, hlen):
        return _ngram_lookup(hist_row, hlen, H, ngram_max, ngram_min)

    def fn(params, ct, hist, hlen, tok, pos0, key, temperature, top_p):
        pos0 = jnp.asarray(pos0, jnp.int32)
        hlen = jnp.asarray(hlen, jnp.int32)

        def one_round(carry, _):
            ct, hist, hlen, tok, pos, key = carry
            start, matched = lookup(hist[0], hlen)
            # no match: propose k copies of the current token (verified
            # like any draft — usually rejected, still lossless; the host
            # stops calling after consecutive all-miss dispatches)
            start = jnp.where(matched, start, hlen - 1)
            drafts = jax.lax.dynamic_slice(hist[0], (start,), (spec_k,))
            # clamp proposals that run past the known history to the last
            # known token (dynamic_slice already clamps start+k <= H; this
            # masks reads past hlen)
            off = jnp.arange(spec_k, dtype=jnp.int32)
            drafts = jnp.where(start + off < hlen, drafts, hist[0, hlen - 1])

            chunk = jnp.concatenate([tok[0], drafts])[None]   # (1, k+1)
            lg_all, ct = fwd_t(params, ct, chunk, pos)

            key, ka = jax.random.split(key)
            if greedy:
                tgt = jnp.argmax(lg_all[0], axis=-1).astype(jnp.int32)
                acc = tgt[:spec_k] == drafts
                n_acc = jnp.cumprod(acc.astype(jnp.int32)).sum()
                nxt = tgt[n_acc]
            else:
                ps = nucleus_dist(lg_all[0], temperature, top_p)  # (k+1, V)
                qs = jax.nn.one_hot(drafts, cfg.vocab_size,
                                    dtype=jnp.float32)            # (k, V)
                n_acc, nxt = _accept(ps, qs, drafts, spec_k, ka)

            # append the emitted tokens: drafts[:n_acc] then nxt. All k+1
            # slots are written; slots past n_acc hold draft junk that the
            # next round's write overwrites before hlen ever covers it
            # (matching masks on idx <= hlen-n-1 never read past hlen)
            emitted = jnp.concatenate([drafts, drafts[-1:]])
            emitted = emitted.at[n_acc].set(nxt)
            hist = jax.lax.dynamic_update_slice(hist, emitted[None],
                                                (jnp.int32(0), hlen))
            hlen = hlen + n_acc + 1
            pos = pos + n_acc + 1
            return (ct, hist, hlen, nxt[None, None], pos, key), \
                (drafts, n_acc, nxt, matched)

        (ct, hist, hlen, _, _, _), (drafts_r, nacc_r, next_r, match_r) = \
            jax.lax.scan(one_round, (ct, hist, hlen, tok, pos0, key),
                         length=rounds)
        return drafts_r, nacc_r, next_r, match_r, ct, hist, hlen

    if jit:
        fn = jax.jit(fn, donate_argnums=(1, 2))
    return fn


def make_mtp_spec_rounds(cfg: ModelConfig, spec_k: int, rounds: int,
                         jit: bool = True, greedy: bool = False):
    """Self-speculation with the checkpoint's MTP layer
    (engine.generate_mtp's hot loop).

    Returns ``fn(params, ct, mtp_cache, tok (1,1), h_cur (1,1,dim), pos0,
    key, temperature, top_p) -> (drafts (R,k), n_acc (R,), next (R,),
    h_next (1,1,dim), ct, mtp_cache)``. MTP cache slot j holds the pair
    (token_{j+1}, hidden_j); after each verify the cache is re-hydrated
    from TRUE hidden states so drafting quality does not drift
    (engine.generate_mtp invariant).
    """
    from deepseek_tpu.models.mtp import _mtp_impl

    fwd_t = functools.partial(_forward_impl, cfg=cfg, prefill=True,
                              logits_mode="all", with_hidden=True)
    mtp_step = functools.partial(_mtp_impl, cfg=cfg, prefill=False)
    mtp_pre = functools.partial(_mtp_impl, cfg=cfg, prefill=True)

    def fn(params, ct, cm, tok, h_cur, pos0, key, temperature, top_p):
        pos0 = jnp.asarray(pos0, jnp.int32)

        def one_round(carry, _):
            ct, cm, tok, h_cur, pos, key = carry

            def dstep(c, j):
                cm, t, hh, k2 = c
                lg, hh, cm = mtp_step(params, cm, t, hh, pos - 1 + j)
                if greedy:
                    d = jnp.argmax(lg[:, 0], axis=-1).astype(jnp.int32)
                    return (cm, d[:, None], hh.astype(jnp.float32), k2), \
                        (d[0], jnp.float32(0))
                q = nucleus_dist(lg[:, 0], temperature, top_p)
                k2, sub = jax.random.split(k2)
                d = sample_token(lg[:, 0], sub, temperature, top_p)
                # f32 hidden keeps the scan carry dtype stable
                return (cm, d[:, None], hh.astype(jnp.float32), k2), \
                    (d[0], q[0])

            (cm, _, _, key), (drafts, qs) = jax.lax.scan(
                dstep, (cm, tok, h_cur, key),
                jnp.arange(spec_k, dtype=jnp.int32))

            chunk = jnp.concatenate([tok[0], drafts])[None]   # (1, k+1)
            lg_all, h_all, ct = fwd_t(params, ct, chunk, pos)

            key, ka = jax.random.split(key)
            if greedy:
                tgt = jnp.argmax(lg_all[0], axis=-1).astype(jnp.int32)
                acc = tgt[:spec_k] == drafts
                n_acc = jnp.cumprod(acc.astype(jnp.int32)).sum()
                nxt = tgt[n_acc]
            else:
                ps = nucleus_dist(lg_all[0], temperature, top_p)  # (k+1, V)
                n_acc, nxt = _accept(ps, qs, drafts, spec_k, ka)

            # re-hydrate MTP pairs (chunk[j+1], h_all[j]) at pos..pos+k from
            # the TRUE hiddens; garbage past n_acc is rewritten next round
            pair_toks = jnp.concatenate([drafts, nxt[None]])[None]  # (1,k+1)
            _, _, cm = mtp_pre(params, cm, pair_toks,
                               h_all.astype(jnp.float32), pos)

            # f32 keeps the scan carry dtype stable across compute dtypes
            h_next = jax.lax.dynamic_slice_in_dim(
                h_all, n_acc, 1, axis=1).astype(jnp.float32)
            pos = pos + n_acc + 1
            return (ct, cm, nxt[None, None], h_next, pos, key), \
                (drafts, n_acc, nxt)

        (ct, cm, _, h_cur, _, _), (drafts_r, nacc_r, next_r) = jax.lax.scan(
            one_round, (ct, cm, tok, h_cur, pos0, key), length=rounds)
        return drafts_r, nacc_r, next_r, h_cur, ct, cm

    if jit:
        fn = jax.jit(fn, donate_argnums=(1, 2))
    return fn


def make_batched_mtp_spec_rounds(cfg: ModelConfig, spec_k: int, rounds: int,
                                 jit: bool = True,
                                 with_logprobs: bool = False):
    """MTP self-speculation for the CONTINUOUS-BATCHING scheduler
    (VERDICT r4 #5c): every live slot drafts with the checkpoint's MTP
    layer from its own hidden state and all slots verify in one fused
    dispatch per round — the batched sibling of make_mtp_spec_rounds,
    built on the same per-row verify mode as the batched n-gram rounds.

    Per-slot sampling params ride along; acceptance is the exact
    arXiv 2211.17192 rule per row (vmapped _accept with the drafter's
    full q distributions), so greedy and sampled slots coexist. After
    each verify the MTP cache re-hydrates from TRUE hidden states at
    per-row positions (_mtp_impl verify mode) — draft quality never
    drifts. ``active`` freezes a row exactly like the n-gram variant.

    Returns ``fn(params, ct, cm, tok (B,1), h_cur (B,1,dim) f32,
    pos0 (B,), key, temperature (B,), top_p (B,), active (B,),
    top_k (B,), min_p (B,)) -> (drafts (R,B,k), n_acc (R,B), next (R,B)
    [, lps (R,B,k+1)], h_cur (B,1,dim), ct, cm)`` with the target cache
    and MTP cache donated. ``lps`` follows the batched-ngram logprobs
    convention. Single-chip (the MTP drafter runs with NULL_CTX —
    models/mtp.py docstring); the scheduler rejects spec="mtp" + mesh.
    """
    from deepseek_tpu.models.mtp import _mtp_impl

    fwd_t = functools.partial(_forward_impl, cfg=cfg, prefill=True,
                              logits_mode="all", with_hidden=True)
    mtp_step = functools.partial(_mtp_impl, cfg=cfg, prefill=False)
    mtp_pre = functools.partial(_mtp_impl, cfg=cfg, prefill=True)

    def fn(params, ct, cm, tok, h_cur, pos0, key, temperature, top_p,
           active, top_k, min_p):
        pos0 = jnp.asarray(pos0, jnp.int32)
        B = tok.shape[0]

        def one_round(carry, _):
            ct, cm, tok, h_cur, pos, key = carry

            def dstep(c, j):
                cm, t, hh, k2 = c
                lg, hh2, cm = mtp_step(params, cm, t, hh, pos - 1 + j)
                lg0 = lg[:, 0]
                q = nucleus_dist(lg0, temperature, top_p, top_k, min_p)
                k2, sub = jax.random.split(k2)
                d = sample_token(lg0, sub, temperature, top_p,
                                 top_k=top_k, min_p=min_p)
                return (cm, d[:, None], hh2.astype(jnp.float32), k2), (d, q)

            (cm, _, _, key), (drafts_k, qs_k) = jax.lax.scan(
                dstep, (cm, tok, h_cur, key),
                jnp.arange(spec_k, dtype=jnp.int32))
            drafts = drafts_k.T.astype(jnp.int32)          # (B, k)
            qs = jnp.swapaxes(qs_k, 0, 1)                  # (B, k, V)

            chunk = jnp.concatenate([tok, drafts], axis=1)  # (B, k+1)
            lg_all, h_all, ct = fwd_t(params, ct, chunk, pos)  # verify mode
            key, ka = jax.random.split(key)
            ps = nucleus_dist(lg_all, temperature[:, None], top_p[:, None],
                              top_k[:, None], min_p[:, None])  # (B,k+1,V)
            n_acc, nxt = jax.vmap(_accept, in_axes=(0, 0, 0, None, 0))(
                ps, qs, drafts, spec_k, jax.random.split(ka, B))

            # re-hydrate MTP pairs (chunk[j+1], h_all[j]) at each row's own
            # positions from the TRUE hiddens (garbage past n_acc is
            # rewritten next round, exactly as in the single-seq loop)
            pair_toks = jnp.concatenate([drafts, nxt[:, None]], axis=1)
            _, _, cm = mtp_pre(params, cm, pair_toks,
                               h_all.astype(jnp.float32), pos)

            if with_logprobs:
                lsm = jax.nn.log_softmax(lg_all.astype(jnp.float32), -1)
                emitted = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)
                emitted = jnp.where(
                    jnp.arange(spec_k + 1, dtype=jnp.int32)[None, :]
                    == n_acc[:, None], nxt[:, None], emitted)
                lp = jnp.take_along_axis(
                    lsm, emitted[:, :, None], axis=2)[:, :, 0]
            else:
                lp = jnp.zeros((), jnp.float32)

            h_next = jnp.take_along_axis(
                h_all.astype(jnp.float32), n_acc[:, None, None], axis=1)
            adv = jnp.where(active, n_acc + 1, 0)
            tok = jnp.where(active[:, None], nxt[:, None].astype(jnp.int32),
                            tok)
            h_cur = jnp.where(active[:, None, None], h_next, h_cur)
            return (ct, cm, tok, h_cur, pos + adv, key), \
                (drafts, n_acc, nxt, lp)

        (ct, cm, _, h_cur, _, _), (dr, na, nx, lps) = jax.lax.scan(
            one_round, (ct, cm, tok, h_cur, pos0, key), length=rounds)
        if with_logprobs:
            return dr, na, nx, lps, h_cur, ct, cm
        return dr, na, nx, h_cur, ct, cm

    if jit:
        fn = jax.jit(fn, donate_argnums=(1, 2))
    return fn
