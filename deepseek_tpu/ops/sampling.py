"""On-device token sampling (temperature + nucleus top-p + top-k + min-p).

Device-side counterpart of deepseek_tpu.sampler.Sampler: the nucleus is the
smallest set of highest-probability tokens whose mass reaches top_p. A full
argsort over the vocab costs ~milliseconds per step on TPU at DeepSeek vocab
sizes, so the nucleus is found WITHOUT sorting: binary-search the largest
probability threshold tau whose keep-set {p >= tau} still has mass >= top_p
(24 f32 halvings — exact up to float epsilon; value-ties at the boundary are
all kept, which only affects equiprobable tokens). Sampling is then a single
jax.random.categorical over the masked logits, so the whole decode loop —
forward, sample, feedback — stays on chip across a lax.scan rollout.

top-k reuses the same sort-free machinery (binary-search the largest tau
whose keep-set still has >= k members — tau is then the k-th largest
probability, boundary ties all kept); min-p is a single threshold against
``min_p * max(p)``. Filters compose in the conventional order: top-k and
min-p cut the raw distribution, which renormalizes, and the nucleus is
taken over the remainder — serving parameters beyond the reference's
temperature/top-p surface (sampler.cpp has neither), off by default
(``top_k <= 0``, ``min_p <= 0``) at zero cost to the plain path.

temperature == 0 selects argmax via jnp.where.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _nucleus_mask(probs: jnp.ndarray, top_p) -> jnp.ndarray:
    """(B, V) probs -> bool keep mask of the smallest mass >= top_p prefix.
    top_p: scalar or (B, 1)."""
    pmax = jnp.max(probs, axis=-1, keepdims=True)               # (B, 1)
    top_p = jnp.asarray(top_p, jnp.float32)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0),
                       axis=-1, keepdims=True)
        ok = mass >= top_p           # threshold can be raised further
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, 24, body, (jnp.zeros_like(pmax), pmax))
    # lo is the largest feasible threshold found; always keep the argmax
    return (probs >= lo) | (probs >= pmax)


def _topk_mask(probs: jnp.ndarray, k) -> jnp.ndarray:
    """(B, V) probs -> bool keep mask of the k highest probabilities
    (boundary value-ties all kept). k: scalar or (B, 1) float; rows with
    k < 1 keep everything. Sort-free: binary-search the largest threshold
    tau with |{p >= tau}| >= k — tau converges to the k-th largest value."""
    pmax = jnp.max(probs, axis=-1, keepdims=True)               # (B, 1)
    k = jnp.asarray(k, jnp.float32)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((probs >= mid).astype(jnp.float32),
                      axis=-1, keepdims=True)
        ok = cnt >= k                 # threshold can be raised further
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, 24, body, (jnp.zeros_like(pmax), pmax))
    return (k < 1.0) | (probs >= lo) | (probs >= pmax)


def _keep_mask(probs: jnp.ndarray, top_p, top_k, min_p) -> jnp.ndarray:
    """Composed keep-set over (B, V) probs: top-k ∧ min-p filter the raw
    distribution; the nucleus (top-p) is taken over the renormalized
    remainder. top_p/top_k/min_p: (B, 1). The top-k/min-p stage is skipped
    wholesale (lax.cond) when no row requests it, so the default path
    costs exactly the old nucleus search."""

    def filtered(_):
        keep = _topk_mask(probs, top_k)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        keep = keep & ((min_p <= 0.0) | (probs >= min_p * pmax))
        q = jnp.where(keep, probs, 0.0)
        q = q / jnp.maximum(q.sum(axis=-1, keepdims=True), 1e-30)
        return keep & _nucleus_mask(q, top_p)

    def plain(_):
        return _nucleus_mask(probs, top_p)

    on = jnp.any(top_k >= 1.0) | jnp.any(min_p > 0.0)
    return jax.lax.cond(on, filtered, plain, None)


def nucleus_dist(logits: jnp.ndarray, temperature, top_p,
                 top_k=0, min_p=0.0) -> jnp.ndarray:
    """(..., V) logits -> (..., V) nucleus probabilities, the distribution
    ``sample_token`` draws from: temperature==0 gives the one-hot argmax,
    otherwise softmax over the nucleus keep-set (renormalized). Used by the
    fused speculative-decoding acceptance rule (arXiv 2211.17192 needs the
    full p and q rows in-graph)."""
    logits = logits.astype(jnp.float32)
    lead = logits.shape[:-1]
    V = logits.shape[-1]
    flat = logits.reshape(-1, V)
    B = flat.shape[0]
    temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), lead)
    tflat = temp.reshape(-1)
    topf = jnp.broadcast_to(
        jnp.asarray(top_p, jnp.float32), lead).reshape(-1)
    onehot = jax.nn.one_hot(jnp.argmax(flat, axis=-1), V, dtype=jnp.float32)
    t = jnp.maximum(tflat, 1e-6)
    probs = jax.nn.softmax(flat / t[:, None], axis=-1)
    topkf = jnp.broadcast_to(
        jnp.asarray(top_k, jnp.float32), lead).reshape(-1)
    minpf = jnp.broadcast_to(
        jnp.asarray(min_p, jnp.float32), lead).reshape(-1)
    keep = _keep_mask(probs, topf[:, None], topkf[:, None], minpf[:, None])
    p = jnp.where(keep, probs, 0.0)
    p = p / jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    p = jnp.where((tflat == 0.0)[:, None], onehot, p)
    return p.reshape(*lead, V)


def sample_token(logits: jnp.ndarray, key, temperature, top_p,
                 top_k=0, min_p=0.0) -> jnp.ndarray:
    """logits (B, V) f32 -> (B,) int32.

    temperature/top_p/top_k/min_p may be traced, scalar or per-sequence
    (B,) — the continuous-batching scheduler samples every slot with its
    own request's parameters in one fused call. top_k < 1 and min_p <= 0
    disable those filters (the default-off path costs nothing extra)."""
    logits = logits.astype(jnp.float32)
    B = logits.shape[0]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (B,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (B,))
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.float32), (B,))
    min_p = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (B,))

    def sample_branch(_):
        t = jnp.maximum(temp, 1e-6)
        scaled = logits / t[:, None]
        probs = jax.nn.softmax(scaled, axis=-1)
        keep = _keep_mask(probs, top_p[:, None], top_k[:, None],
                          min_p[:, None])
        masked = jnp.where(keep, scaled, _NEG_INF)
        sampled = jax.random.categorical(key, masked, axis=-1)
        return jnp.where(temp == 0.0, greedy, sampled.astype(jnp.int32))

    # all-greedy batches (completion -t 0, the decode bench) skip the
    # softmax + 24-iteration nucleus search — a handful of vocab-wide
    # passes per step
    return jax.lax.cond(jnp.all(temp == 0.0), lambda _: greedy,
                        sample_branch, None)
