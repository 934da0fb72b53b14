"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.parallel import make_mesh, shard_cache, shard_params
from deepseek_tpu.parallel.mesh import default_mesh_shape

from tests.test_model import build
from tests.util_tinymodel import tiny_config


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _run(cfg, params, cache, tokens, prefill_first=True):
    """Hydrate 3 tokens via prefill then decode 3 more; return all logits."""
    pre = make_forward(cfg, prefill=True, logits_mode="all")
    step = make_forward(cfg, prefill=False, logits_mode="last")
    B = cache.batch
    toks = jnp.asarray([tokens[:3]] * B, jnp.int32)
    lg_all, cache = pre(params, cache, toks, 0)
    outs = [np.asarray(lg_all)]
    pos = 3
    for t in tokens[3:]:
        lg, cache = step(params, cache, jnp.asarray([[t]] * B, jnp.int32), pos)
        outs.append(np.asarray(lg))
        pos += 1
    return outs


@pytest.mark.parametrize("use_mla", [False, True])
def test_sharded_matches_single_device(use_mla):
    cfg = tiny_config(use_mla=use_mla, vocab_size=64)
    wd, params = build(cfg, seed=20)
    tokens = [1, 9, 22, 40, 3, 15]

    # single-device baseline
    base = _run(cfg, params, init_cache(cfg, batch=2), tokens)

    # (data=2, expert=2, tensor=2) mesh
    mesh = make_mesh(data=2, expert=2, tensor=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=2), cfg, mesh)
    got = _run(cfg, sp, sc, tokens)

    for b, g in zip(base, got):
        np.testing.assert_allclose(g, b, rtol=2e-3, atol=2e-3)


def test_sharded_ring_wraparound():
    """Ring+sink decode past the window under a sharded mesh."""
    cfg = tiny_config(use_mla=True, rs_original_max_position_embeddings=8)
    wd, params = build(cfg, seed=21)
    mesh = make_mesh(data=1, expert=2, tensor=2)
    sp = shard_params(params, cfg, mesh)

    step = make_forward(cfg, prefill=False, logits_mode="last")
    tokens = np.random.default_rng(0).integers(3, 60, size=14).tolist()

    c1 = init_cache(cfg, batch=1)
    c2 = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    for pos, t in enumerate(tokens):
        tk = jnp.asarray([[t]], jnp.int32)
        l1, c1 = step(params, c1, tk, pos)
        l2, c2 = step(sp, c2, tk, pos)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3, atol=2e-3)


def test_param_sharding_actually_distributes():
    cfg = tiny_config(use_mla=True)
    _, params = build(cfg, seed=22)
    mesh = make_mesh(data=1, expert=4, tensor=2)
    sp = shard_params(params, cfg, mesh)
    # routed experts (E=4) sharded 4-way on the expert axis
    lp = sp.layers[1]
    shard_shape = lp.w1.data.sharding.shard_shape(lp.w1.data.shape)
    assert shard_shape[0] == 1  # 4 experts / 4-way
    # wc column-parallel over 2-way tensor axis
    wc_shard = lp.wc.data.sharding.shard_shape(lp.wc.data.shape)
    assert wc_shard[0] == lp.wc.data.shape[0] // 2


@pytest.mark.parametrize("use_mla", [False, True])
@pytest.mark.parametrize("shape", [(2, 2, 2), (1, 4, 2), (4, 1, 2)])
def test_shard_map_matches_single_device(use_mla, shape):
    """Explicit-collective shard_map path == single-device logits."""
    d, e, t = shape
    cfg = tiny_config(use_mla=use_mla, vocab_size=64)
    wd, params = build(cfg, seed=30)
    B = max(2, d)
    tokens = [1, 9, 22, 40, 3, 15]

    base = _run(cfg, params, init_cache(cfg, batch=B), tokens)

    mesh = make_mesh(data=d, expert=e, tensor=t)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=B), cfg, mesh)

    pre = make_forward(cfg, prefill=True, logits_mode="all",
                       mesh=mesh, params=params, cache=sc)
    step = make_forward(cfg, prefill=False, logits_mode="last",
                        mesh=mesh, params=params, cache=sc)
    toks = jnp.asarray([tokens[:3]] * B, jnp.int32)
    lg, sc = pre(sp, sc, toks, 0)
    outs = [np.asarray(lg)]
    pos = 3
    for tk in tokens[3:]:
        lg, sc = step(sp, sc, jnp.asarray([[tk]] * B, jnp.int32), pos)
        outs.append(np.asarray(lg))
        pos += 1
    for b, g in zip(base, outs):
        np.testing.assert_allclose(g, b, rtol=2e-3, atol=2e-3)


def test_shard_map_decode_loop_matches():
    """Fused decode rollout under shard_map == unsharded rollout (greedy)."""
    from deepseek_tpu.models.deepseek import make_decode_loop

    cfg = tiny_config(use_mla=True, vocab_size=64)
    wd, params = build(cfg, seed=31)
    B = 2
    key = jax.random.PRNGKey(7)
    args = (jnp.float32(0.0), jnp.float32(1.0))

    loop1 = make_decode_loop(cfg, 5)
    c1 = init_cache(cfg, batch=B)
    tok = jnp.asarray([[3]] * B, jnp.int32)
    t1, lg1, _ = loop1(params, c1, tok, jnp.int32(0), key, *args)

    mesh = make_mesh(data=2, expert=2, tensor=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=B), cfg, mesh)
    loop2 = make_decode_loop(cfg, 5, mesh=mesh, params=params, cache=sc)
    t2, lg2, _ = loop2(sp, sc, tok, jnp.int32(0), key, *args)

    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_shard_map_grouped_gmm_prefill():
    """Grouped-gmm prefill MoE (interpret) under shard_map EP masking must
    match the single-device XLA dense path."""
    import dataclasses

    cfg = tiny_config(use_mla=True, vocab_size=64, dim=128,
                      moe_intermediate_size=128, hidden_dim=128)
    cfg_pl = dataclasses.replace(cfg, kernel_impl="pallas")
    wd, params = build(cfg, seed=5)
    B = 2
    toks = jnp.asarray([[1, 9, 22, 40]] * B, jnp.int32)
    want, _ = make_forward(cfg, prefill=True, logits_mode="all")(
        params, init_cache(cfg, batch=B), toks, 0)

    mesh = make_mesh(data=1, expert=2, tensor=2)
    sp = shard_params(params, cfg_pl, mesh)
    sc = shard_cache(init_cache(cfg_pl, batch=B), cfg_pl, mesh)
    pre = make_forward(cfg_pl, prefill=True, logits_mode="all",
                       mesh=mesh, params=params, cache=sc)
    got, _ = pre(sp, sc, toks, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_seq_parallel_decode_matches(kv_dtype):
    """Sequence-sharded MLA KV cache (seq axis): guarded slot writes,
    shard-0 sink re-rotation, and the flash merge must reproduce the
    unsharded decode logits through ring wraparound."""
    import dataclasses

    cfg = tiny_config(use_mla=True, rs_original_max_position_embeddings=8)
    cfg = dataclasses.replace(cfg, kv_cache_dtype=kv_dtype)
    wd, params = build(cfg, seed=33)
    tokens = np.random.default_rng(2).integers(3, 60, size=14).tolist()

    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=1)
    lg1 = None
    for pos, t in enumerate(tokens):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]], jnp.int32), pos)

    mesh = make_mesh(data=1, expert=2, tensor=2, seq=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    step2 = make_forward(cfg, prefill=False, logits_mode="last",
                         mesh=mesh, params=params, cache=sc)
    lg2 = None
    for pos, t in enumerate(tokens):
        lg2, sc = step2(sp, sc, jnp.asarray([[t]], jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_default_mesh_shape():
    cfg = tiny_config()
    d, e, t = default_mesh_shape(8, cfg)
    assert d * e * t == 8
    assert cfg.n_routed_experts % e == 0
    assert cfg.n_heads % t == 0
    assert default_mesh_shape(1, cfg) == (1, 1, 1)
