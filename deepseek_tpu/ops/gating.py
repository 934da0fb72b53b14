"""MoE router: scoring + top-k expert selection.

Capability parity with the reference's moe_gate (infer.cpp:493-599) with two
documented semantic corrections (SURVEY.md §6 "build the correct semantics"):

- The V3 e-score-correction bias influences *selection only*; routing weights
  come from the unbiased scores (the reference keeps the bias in the weights).
- GROUP_LIMITED_GREEDY selects the top ``topk_group`` *groups* (by group max),
  then the top-k experts within them — the HF semantics — rather than the
  reference's per-group item pre-selection.
- NOAUX_TC is implemented (group score = sum of top-2 biased scores per
  group); the reference leaves it as an assert-false TODO (infer.cpp:589).

Everything is expressed as static-shape top_k + masking so it jits cleanly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ModelConfig, ScoringFunc, TopKMethod

_NEG_INF = -1e30


def moe_gate(
    logits: jnp.ndarray,                 # (..., n_routed_experts)
    bias: Optional[jnp.ndarray],         # (n_routed_experts,) or None
    cfg: ModelConfig,
):
    """Returns (weights (..., k) f32, indices (..., k) int32)."""
    x = logits.astype(jnp.float32)
    if cfg.scoring_func == ScoringFunc.SOFTMAX:
        scores = jax.nn.softmax(x, axis=-1)
    else:
        scores = jax.nn.sigmoid(x)

    sel = scores + bias.astype(jnp.float32) if bias is not None else scores

    k = cfg.n_active_routed
    e = scores.shape[-1]

    if cfg.topk_method == TopKMethod.GREEDY:
        _, idx = jax.lax.top_k(sel, k)
    else:
        n_group = cfg.n_group
        group_size = e // n_group
        grouped = sel.reshape(*sel.shape[:-1], n_group, group_size)
        if cfg.topk_method == TopKMethod.NOAUX_TC:
            # group score = sum of the top-2 biased scores within the group
            top2, _ = jax.lax.top_k(grouped, 2)
            group_scores = top2.sum(axis=-1)
        else:  # GROUP_LIMITED_GREEDY: group score = group max
            group_scores = grouped.max(axis=-1)
        _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)
        # one-hot mask over the selected groups, expanded to expert positions
        group_mask = jax.nn.one_hot(gidx, n_group, dtype=jnp.float32).sum(axis=-2)
        masked = jnp.where(
            jnp.repeat(group_mask, group_size, axis=-1) > 0, sel, _NEG_INF)
        _, idx = jax.lax.top_k(masked, k)

    weights = jnp.take_along_axis(scores, idx, axis=-1)
    if cfg.norm_topk_prob:
        weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-20)
    weights = weights * cfg.routed_scaling_factor
    return weights, idx.astype(jnp.int32)
