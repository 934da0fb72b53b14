"""DeepSeek-V3-proportioned config preset + fused-layout synth.

The real-silicon V3 slice benches (scripts/bench_v3.py, bench.py
``v3slice``) run on ``deepseek_v3_proportions`` + ``random_fused_params``;
these tests pin the same machinery at CPU scale: the exact V3 routing
shape (E-many experts in 8 groups, k=8 noaux_tc + sigmoid + e-score bias),
the directly-synthesized fused layout (wkvq/wcr/w13s/w2s), and
prefill/decode agreement between the XLA and kernel paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.config import ScoringFunc, TopKMethod
from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.models.testing import (
    deepseek_v3_proportions, random_fused_params,
)


def tiny_v3(**overrides):
    base = dict(
        n_layers=2, first_k_dense_replace=1, dim=512, hidden_dim=1024,
        n_heads=4, vocab_size=2048, n_routed_experts=16, n_active_routed=4,
        moe_intermediate_size=256, q_lora_rank=256, kv_lora_rank=256,
        topk_group=2, max_seq_len=256,
        rs_original_max_position_embeddings=256)
    base.update(overrides)
    return deepseek_v3_proportions(**base)


def test_v3_proportions_defaults_are_exact():
    cfg = deepseek_v3_proportions()
    assert (cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.n_heads) == \
        (7168, 18432, 61, 128)
    assert (cfg.n_routed_experts, cfg.n_active_routed, cfg.n_group,
            cfg.topk_group, cfg.n_shared_experts) == (256, 8, 8, 4, 1)
    assert cfg.topk_method == TopKMethod.NOAUX_TC
    assert cfg.scoring_func == ScoringFunc.SIGMOID
    assert cfg.has_moegate_bias and cfg.use_mla
    assert (cfg.kv_lora_rank, cfg.q_lora_rank) == (512, 1536)
    assert (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim) == \
        (128, 64, 128)
    assert cfg.routed_scaling_factor == 2.5 and cfg.norm_topk_prob
    assert cfg.vocab_size == 129280 and cfg.first_k_dense_replace == 3


@pytest.mark.parametrize("quant", ["q3_k_nibble", "f8e5m2"])
def test_fused_synth_decode_and_prefill(quant):
    cfg = tiny_v3(kernel_impl="xla")
    params = random_fused_params(cfg, quant)
    # fused layout: no unfused duplicates
    lp = params.layers[1]
    assert lp.wkvq is not None and lp.wcr is not None
    assert lp.w13s is not None and lp.w2s is not None
    assert lp.w13s.shape[0] == cfg.n_routed_experts + cfg.n_shared_experts
    assert lp.wkv_a is None and lp.w1 is None and lp.moegate_bias is not None

    cache = init_cache(cfg, batch=1)
    pre = make_forward(cfg, prefill=True, logits_mode="last")
    lg, cache = pre(params, cache, jnp.zeros((1, 8), jnp.int32), jnp.int32(0))
    assert np.isfinite(np.asarray(lg)).all()
    loop = make_decode_loop(cfg, 4)
    toks, lg, cache = loop(params, cache, jnp.zeros((1, 1), jnp.int32),
                           jnp.int32(8), jax.random.PRNGKey(0),
                           jnp.float32(0.0), jnp.float32(1.0))
    assert np.isfinite(np.asarray(lg)).all()
    assert toks.shape == (1, 4)


def test_fused_synth_kernel_vs_xla_agree():
    """The directly-synthesized planes must mean the same thing to the
    Pallas kernels (interpret mode) and the XLA dequant path."""
    cfg = tiny_v3()
    params = random_fused_params(cfg, "q3_k_nibble")
    outs = []
    for impl in ("pallas", "xla"):
        c = dataclasses.replace(cfg, kernel_impl=impl)
        cache = init_cache(c, batch=1)
        lg, cache = make_forward(c, prefill=False, logits_mode="last")(
            params, cache, jnp.zeros((1, 1), jnp.int32), jnp.int32(0))
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_small_prefill_pair_dispatch_under_ep_mesh():
    """The pair-dispatch prefill under an EP x TP mesh: dispatch_pairs'
    ownership folding + psum_e must reproduce the replicated logits for a
    small chunk (the EP capacity machinery never engages below the pair
    threshold, so this path has no overflow mode to recover from)."""
    from deepseek_tpu.parallel import make_mesh, shard_cache, shard_params
    cfg = tiny_v3(kernel_impl="pallas")
    params = random_fused_params(cfg, "q3_k_nibble")
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0,
                              cfg.vocab_size, jnp.int32)

    ref_cache = init_cache(cfg, batch=1)
    lg_ref, _ = make_forward(cfg, prefill=True, logits_mode="last")(
        params, ref_cache, toks, jnp.int32(0))

    mesh = make_mesh(expert=2, tensor=2)
    sp = shard_params(params, cfg, mesh)
    cache = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    pre = make_forward(cfg, prefill=True, logits_mode="last",
                       mesh=mesh, params=params, cache=cache)
    lg, cache = pre(sp, cache, toks, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_ref),
                               rtol=2e-2, atol=2e-2)


def test_small_prefill_pair_dispatch_matches_chunk_paths():
    """Prefill chunks with <= _PAIR_PREFILL_MAX_PAIRS token-expert pairs
    route through the decode-style pair dispatch on the kernel path (the
    grouped path's ~E-tile MXU floor is ~10x a decode step for a 5-token
    speculative verify chunk). Its logits must match the XLA chunk path
    on BOTH sides of the threshold, for every row of the chunk."""
    from deepseek_tpu.models.deepseek import _PAIR_PREFILL_MAX_PAIRS
    cfg = tiny_v3()
    params = random_fused_params(cfg, "q3_k_nibble")
    k_eff = cfg.n_active_routed + cfg.n_shared_experts   # folded slots
    t_small = max(1, _PAIR_PREFILL_MAX_PAIRS // k_eff)   # pair path
    t_big = _PAIR_PREFILL_MAX_PAIRS // k_eff + 2         # grouped path
    assert t_big * k_eff > _PAIR_PREFILL_MAX_PAIRS
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, t_big), 0,
                              cfg.vocab_size, jnp.int32)
    for T in (5, t_small, t_big):
        outs = []
        for impl in ("pallas", "xla"):
            c = dataclasses.replace(cfg, kernel_impl=impl)
            cache = init_cache(c, batch=1)
            lg, cache = make_forward(c, prefill=True, logits_mode="all")(
                params, cache, toks[:, :T], jnp.int32(0))
            outs.append(np.asarray(lg))
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-2, atol=2e-2,
                                   err_msg=f"T={T}")
