import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_tpu.config import ScoringFunc, TopKMethod
from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.models.loader import load_params, params_active_bytes
from deepseek_tpu.utils.codec import CheckpointData, TensorView, np_to_dtype_str

from tests.np_ref import NumpyRef
from tests.util_tinymodel import (
    tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
)


def make_ckptdata(cfg, wd) -> CheckpointData:
    tensors = {}
    for name, arr in tiny_checkpoint_tensors(cfg, wd).items():
        arr = np.asarray(arr)
        tensors[name] = TensorView(name, np_to_dtype_str(arr.dtype), arr.shape, arr)
    return CheckpointData(metadata=tiny_metadata(cfg), tensors=tensors)


def build(cfg, seed=0):
    wd = tiny_weights(cfg, seed=seed)
    params = load_params(make_ckptdata(cfg, wd), cfg)
    return wd, params


def run_decode(cfg, params, tokens, rtol=2e-3, atol=2e-3, wd=None):
    """Decode `tokens` step by step; compare every step's logits to NumpyRef."""
    ref = NumpyRef(cfg, wd)
    step = make_forward(cfg, prefill=False, logits_mode="last")
    cache = init_cache(cfg, batch=1)
    for pos, tok in enumerate(tokens):
        want = ref.forward(tok, pos)
        got, cache = step(params, cache, jnp.asarray([[tok]], jnp.int32), pos)
        np.testing.assert_allclose(
            np.asarray(got)[0], want, rtol=rtol, atol=atol,
            err_msg=f"pos={pos}")
    return cache


def test_decode_mha_no_qlora_matches_numpy():
    cfg = tiny_config(use_mla=False, q_lora=0)
    wd, params = build(cfg)
    run_decode(cfg, params, [1, 5, 9, 13, 3, 60], wd=wd)


def test_decode_mha_qlora_matches_numpy():
    cfg = tiny_config(use_mla=False, q_lora=12)
    wd, params = build(cfg, seed=1)
    run_decode(cfg, params, [2, 7, 11, 4], wd=wd)


def test_decode_mla_matches_numpy():
    cfg = tiny_config(use_mla=True, q_lora=12)
    wd, params = build(cfg, seed=2)
    run_decode(cfg, params, [3, 8, 1, 44, 12], wd=wd)


def test_ring_sink_wraparound_matches_numpy():
    """Decode past the window (16): ring overwrite + sink re-rotation."""
    cfg = tiny_config(use_mla=False, q_lora=0)
    rng = np.random.default_rng(3)
    tokens = rng.integers(3, 60, size=24).tolist()
    wd, params = build(cfg, seed=3)
    run_decode(cfg, params, tokens, rtol=4e-3, atol=4e-3, wd=wd)


def test_ring_sink_wraparound_mla():
    cfg = tiny_config(use_mla=True)
    rng = np.random.default_rng(4)
    tokens = rng.integers(3, 60, size=22).tolist()
    wd, params = build(cfg, seed=4)
    run_decode(cfg, params, tokens, rtol=4e-3, atol=4e-3, wd=wd)


def test_v3_style_gating_matches_numpy():
    cfg = tiny_config(
        use_mla=True, has_moegate_bias=True,
        scoring_func=ScoringFunc.SIGMOID, topk_method=TopKMethod.NOAUX_TC,
        norm_topk_prob=True, routed_scaling_factor=2.0,
        arch="DeepseekV3ForCausalLM")
    wd, params = build(cfg, seed=5)
    run_decode(cfg, params, [9, 2, 31, 17], wd=wd)


def test_group_limited_gating_matches_numpy():
    cfg = tiny_config(topk_method=TopKMethod.GROUP_LIMITED_GREEDY,
                      n_group=2, topk_group=1)
    wd, params = build(cfg, seed=6)
    run_decode(cfg, params, [5, 6, 7, 8], wd=wd)


@pytest.mark.parametrize("use_mla", [False, True])
def test_prefill_matches_stepwise_decode(use_mla):
    cfg = tiny_config(use_mla=use_mla)
    wd, params = build(cfg, seed=7)
    tokens = [1, 9, 22, 40, 3, 15]
    T = len(tokens)

    # stepwise decode, collecting per-position logits
    step = make_forward(cfg, prefill=False, logits_mode="last")
    cache_d = init_cache(cfg, batch=1)
    logits_d = []
    for pos, tok in enumerate(tokens):
        lg, cache_d = step(params, cache_d, jnp.asarray([[tok]], jnp.int32), pos)
        logits_d.append(np.asarray(lg)[0])

    # one prefill call
    pre = make_forward(cfg, prefill=True, logits_mode="all")
    cache_p = init_cache(cfg, batch=1)
    lg_all, cache_p = pre(params, cache_p, jnp.asarray([tokens], jnp.int32), 0)
    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(lg_all)[0, t], logits_d[t], rtol=2e-3, atol=2e-3,
            err_msg=f"t={t}")

    # caches must agree, and decoding *after* prefill must match too
    for name in ("k", "v", "ckv", "krope"):
        a, b = getattr(cache_d, name), getattr(cache_p, name)
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)
    nxt = 33
    lg1, _ = step(params, cache_d, jnp.asarray([[nxt]], jnp.int32), T)
    lg2, _ = step(params, cache_p, jnp.asarray([[nxt]], jnp.int32), T)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), rtol=1e-3, atol=1e-3)


def test_hydrate_mode_returns_no_logits():
    cfg = tiny_config()
    _, params = build(cfg, seed=8)
    fwd = make_forward(cfg, prefill=True, logits_mode="none")
    cache = init_cache(cfg, batch=1)
    out, cache = fwd(params, cache, jnp.asarray([[1, 2, 3]], jnp.int32), 0)
    assert out is None


def test_loader_from_disk(tmp_path):
    from deepseek_tpu.utils import codec
    cfg = tiny_config(use_mla=True)
    wd = tiny_weights(cfg, seed=9)
    codec.save_checkpoint(
        str(tmp_path), [tiny_checkpoint_tensors(cfg, wd)], tiny_metadata(cfg))
    data = codec.load_checkpoint(str(tmp_path))
    from deepseek_tpu.config import ModelConfig
    cfg2 = ModelConfig.from_metadata(data.metadata)
    assert cfg2.dim == cfg.dim and cfg2.use_mla
    params = load_params(data, cfg2)
    run_decode(cfg2, params, [4, 18, 2], wd=wd)


def test_batched_decode():
    """Two sequences decode independently in one batched call."""
    cfg = tiny_config(use_mla=True)
    wd, params = build(cfg, seed=10)
    step = make_forward(cfg, prefill=False, logits_mode="last")
    cache2 = init_cache(cfg, batch=2)
    seqs = [[5, 9, 13], [40, 2, 7]]
    for pos in range(3):
        toks = jnp.asarray([[seqs[0][pos]], [seqs[1][pos]]], jnp.int32)
        lg2, cache2 = step(params, cache2, toks, pos)
    # compare against per-sequence runs
    for b, seq in enumerate(seqs):
        cache1 = init_cache(cfg, batch=1)
        for pos, tok in enumerate(seq):
            lg1, cache1 = step(params, cache1, jnp.asarray([[tok]], jnp.int32), pos)
        np.testing.assert_allclose(
            np.asarray(lg2)[b], np.asarray(lg1)[0], rtol=1e-3, atol=1e-3)


def test_active_bytes_model():
    cfg = tiny_config()
    _, params = build(cfg, seed=11)
    b = params_active_bytes(params, cfg, pos=4)
    assert b > 0
    # MoE layers must count only active experts: compare against a config
    # claiming all experts active
    import dataclasses
    cfg_all = dataclasses.replace(cfg, n_active_routed=cfg.n_routed_experts)
    assert params_active_bytes(params, cfg_all, pos=4) > b


def test_random_params_hybrid_factorization_consistent():
    """random_params must derive the absorbed MLA weights from the random
    decompressed ones (converter math): prefill (decompressed path) ==
    stepwise decode (absorbed path) on a random checkpoint. A previously
    independent wc/wq_b broke speculative acceptance on bench models."""
    import jax.numpy as jnp
    from deepseek_tpu.models import init_cache, make_forward
    from deepseek_tpu.models.testing import random_params
    from tests.util_tinymodel import tiny_config

    cfg = tiny_config(use_mla=True, vocab_size=64)
    params = random_params(cfg, seed=3, dtype=jnp.float32)
    assert params.layers[0].wq_b is not None     # hybrid weights present
    tokens = [1, 9, 22, 40, 3]

    pre = make_forward(cfg, prefill=True, logits_mode="all")
    lg_all, _ = pre(params, init_cache(cfg, batch=1),
                    jnp.asarray([tokens], jnp.int32), 0)

    step = make_forward(cfg, prefill=False, logits_mode="last")
    cache = init_cache(cfg, batch=1)
    for pos, t in enumerate(tokens):
        lg, cache = step(params, cache, jnp.asarray([[t]], jnp.int32), pos)
        np.testing.assert_allclose(
            np.asarray(lg[0]), np.asarray(lg_all[0, pos]),
            rtol=2e-3, atol=2e-3)
