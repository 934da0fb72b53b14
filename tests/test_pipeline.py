"""Pipeline parallelism: stage-sharded execution == single-device logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.parallel.pipeline import Pipeline, stage_bounds

from tests.test_model import build
from tests.util_tinymodel import tiny_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >= 2 virtual devices")


def test_stage_bounds():
    assert stage_bounds(3, 2) == [(0, 2), (2, 3)]
    assert stage_bounds(8, 4) == [(0, 2), (2, 4), (4, 6), (6, 8)]
    assert stage_bounds(5, 1) == [(0, 5)]


@pytest.mark.parametrize("use_mla", [False, True])
def test_pipeline_matches_single_device(use_mla):
    """Prefill + ring-wrapping decode through a 2-stage pipeline must match
    the single-device forward (dense layer 0 on stage 0, MoE on stage 1 —
    heterogeneous stages)."""
    cfg = tiny_config(use_mla=use_mla, vocab_size=64,
                      rs_original_max_position_embeddings=8)
    wd, params = build(cfg, seed=44)
    B = 2
    tokens = [1, 9, 22, 40, 3, 15, 27, 8, 33, 5]  # wraps the 8-slot ring

    pre1 = make_forward(cfg, prefill=True, logits_mode="last")
    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=B)
    toks = jnp.asarray([tokens[:4]] * B, jnp.int32)
    lg1, c1 = pre1(params, c1, toks, 0)
    for pos, t in enumerate(tokens[4:], start=4):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]] * B, jnp.int32), pos)

    pp = Pipeline(cfg, params, n_stages=2, batch=B)
    # weights genuinely live on different devices
    d0 = pp.stages[0].params.layers[0].attn_norm.devices()
    d1 = pp.stages[1].params.layers[0].attn_norm.devices()
    assert d0 != d1
    lg2 = pp.prefill(toks, 0)
    for pos, t in enumerate(tokens[4:], start=4):
        lg2 = pp.decode_step(jnp.asarray([[t]] * B, jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_microbatched_decode():
    """Microbatched decode (overlapped stage dispatches) gives the same
    logits as the straight-through step."""
    cfg = tiny_config(use_mla=True, vocab_size=64)
    wd, params = build(cfg, seed=45)
    B = 4
    tok = jnp.asarray([[3], [5], [7], [9]], jnp.int32)

    step = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=B)
    lg1, c1 = step(params, c1, tok, 0)
    lg1b, c1 = step(params, c1, tok, 1)

    pp = Pipeline(cfg, params, n_stages=2, batch=B)
    lg2 = pp.decode_microbatched(tok, 0, n_micro=2)
    lg2b = pp.decode_microbatched(tok, 1, n_micro=2)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lg2b), np.asarray(lg1b),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_pipeline_pp_x_tp_matches_single_device():
    """PP x TP composition: 2 stages x a 2-device tensor mesh each — stage
    weights shard over heads/FFN-hidden, collectives stay inside the
    stage, prefill + decode logits match the single-device forward."""
    cfg = tiny_config(use_mla=True, vocab_size=64)
    wd, params = build(cfg, seed=47)
    B = 2
    tokens = [1, 9, 22, 40, 3]

    pre1 = make_forward(cfg, prefill=True, logits_mode="last")
    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=B)
    toks = jnp.asarray([tokens[:4]] * B, jnp.int32)
    lg1, c1 = pre1(params, c1, toks, 0)
    lg1, c1 = step1(params, c1, jnp.asarray([[tokens[4]]] * B, jnp.int32), 4)

    pp = Pipeline(cfg, params, n_stages=2, batch=B,
                  mesh_shape={"tensor": 2})
    assert pp.stages[0].mesh is not None
    # a head-major projection is genuinely sharded over the stage mesh
    wvb = pp.stages[0].params.layers[0].wv_b
    leaf = jax.tree.leaves(wvb)[0]
    assert leaf.sharding.num_devices == 2
    lg2 = pp.prefill(toks, 0)
    lg2 = pp.decode_step(jnp.asarray([[tokens[4]]] * B, jnp.int32), 4)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_microbatch_whole_batch_transitions():
    """Persistent microbatch caches: split once, no per-call slicing, and
    a whole-batch decode_step after microbatched decode re-merges and
    stays correct."""
    cfg = tiny_config(use_mla=True, vocab_size=64)
    wd, params = build(cfg, seed=48)
    B = 4
    tok = jnp.asarray([[3], [5], [7], [9]], jnp.int32)

    step = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=B)
    lg1a, c1 = step(params, c1, tok, 0)
    lg1b, c1 = step(params, c1, tok, 1)
    lg1c, c1 = step(params, c1, tok, 2)

    pp = Pipeline(cfg, params, n_stages=2, batch=B)
    lg2a = pp.decode_microbatched(tok, 0, n_micro=2)
    assert pp.stages[0].cache is None            # split state persists
    assert len(pp.stages[0].mb_caches) == 2
    lg2b = pp.decode_microbatched(tok, 1, n_micro=2)
    lg2c = pp.decode_step(tok, 2)                # re-merge + whole batch
    assert pp.stages[0].mb_caches is None
    for got, want in ((lg2a, lg1a), (lg2b, lg1b), (lg2c, lg1c)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_pipeline_three_stages_int8_cache():
    import dataclasses
    cfg = tiny_config(use_mla=True, vocab_size=64)
    cfg = dataclasses.replace(cfg, kv_cache_dtype="int8")
    wd, params = build(cfg, seed=46)
    tokens = [2, 11, 30]

    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=1)
    lg1 = None
    for pos, t in enumerate(tokens):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]], jnp.int32), pos)

    pp = Pipeline(cfg, params, n_stages=3, batch=1)
    lg2 = None
    for pos, t in enumerate(tokens):
        lg2 = pp.decode_step(jnp.asarray([[t]], jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)
