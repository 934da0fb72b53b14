"""Scanned layer stacks (StackedLayers + lax.scan) vs the unrolled loop.

Deep models pay a TPU program-size cliff when every layer is unrolled
(PERFORMANCE.md: Q2_K marginal layer cost 0.32 ms up to L=24, 1.7 ms past
it); stack_layer_groups rolls homogeneous layers into one lax.scan. These
tests pin exact equivalence of the two layouts on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.models.loader import (
    fuse_projections, params_active_bytes, stack_layer_groups,
)
from deepseek_tpu.models.params import StackedLayers
from deepseek_tpu.models.testing import random_params
from tests.util_tinymodel import tiny_config


def _cfg(layers=5, **kw) -> ModelConfig:
    # layer 0 dense + homogeneous MoE tail (first_k_dense_replace=1)
    return tiny_config(use_mla=True, n_layers=layers, **kw)


def _decode_logits(cfg, params, steps=4):
    step = make_forward(cfg, prefill=False, logits_mode="last")
    cache = init_cache(cfg, batch=2)
    toks = [3, 17, 9, 4][:steps]
    out = []
    for pos, t in enumerate(toks):
        lg, cache = step(params, cache, jnp.asarray([[t]] * 2, jnp.int32),
                         pos)
        out.append(np.asarray(lg))
    return np.stack(out), cache


def test_stack_layer_groups_structure():
    cfg = _cfg(layers=6)
    params = random_params(cfg, seed=5)
    stacked = stack_layer_groups(params, cfg, min_group=2)
    kinds = [type(e).__name__ for e in stacked.layers]
    # dense layer 0 stays flat; the 5 MoE layers roll into one stack
    assert kinds[0] == "LayerParams"
    assert kinds[1] == "StackedLayers" and stacked.layers[1].n == 5
    assert len(stacked.layers) == 2
    # active-bytes model is layout-invariant
    a = params_active_bytes(params, cfg, pos=7)
    b = params_active_bytes(stacked, cfg, pos=7)
    assert a == pytest.approx(b, rel=1e-12)
    # idempotent
    again = stack_layer_groups(stacked, cfg, min_group=2)
    assert [type(e).__name__ for e in again.layers] == kinds


def test_scan_decode_matches_unrolled():
    cfg = _cfg(layers=5)
    params = random_params(cfg, seed=11)
    want, cache_u = _decode_logits(cfg, params)
    got, cache_s = _decode_logits(cfg, stack_layer_groups(params, cfg,
                                                          min_group=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # cache contents agree too (ring writes went to the same slots)
    np.testing.assert_allclose(np.asarray(cache_s.ckv),
                               np.asarray(cache_u.ckv),
                               rtol=1e-5, atol=1e-5)


def test_scan_prefill_matches_unrolled():
    cfg = _cfg(layers=5)
    params = random_params(cfg, seed=23)
    pre = make_forward(cfg, prefill=True, logits_mode="last")
    toks = jnp.asarray([[5, 2, 9, 1]], jnp.int32)
    lg_u, _ = pre(params, init_cache(cfg, batch=1), toks, 0)
    lg_s, _ = pre(stack_layer_groups(params, cfg, min_group=2),
                  init_cache(cfg, batch=1), toks, 0)
    np.testing.assert_allclose(np.asarray(lg_s), np.asarray(lg_u),
                               rtol=1e-5, atol=1e-5)


def test_scan_with_fused_projections():
    cfg = _cfg(layers=5)
    params = random_params(cfg, seed=31)
    want, _ = _decode_logits(cfg, params)
    fused = fuse_projections(params, cfg)
    got, _ = _decode_logits(cfg, stack_layer_groups(fused, cfg, min_group=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_debug_capture_falls_back_to_unroll():
    from deepseek_tpu.utils import debug
    cfg = _cfg(layers=5)
    params = stack_layer_groups(random_params(cfg, seed=7), cfg, min_group=2)
    # debug capture runs eager (jit=False), like the DEBUG_MODEL harness
    step = make_forward(cfg, prefill=False, logits_mode="last", jit=False)
    with debug.debug_capture() as cap:
        step(params, init_cache(cfg, batch=1),
             jnp.asarray([[3]], jnp.int32), 0)
    names = set(cap.tensors)
    # per-layer labels exist for every MoE layer — proof the stack was
    # expanded, not scanned with a traced label
    for l in range(1, 5):
        assert f"l{l}.attn" in names, sorted(names)


def test_scan_kernel_path_matches_unrolled(tmp_path):
    """The Pallas kernel route for scanned stacks (LayerSlicedQT -> expert
    tables indexed by the traced layer id) must match the unrolled kernel
    path exactly — this is the no-copy path the TPU decode hot loop uses."""
    import dataclasses
    import os

    from deepseek_tpu import convert as cv
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.models.params import StackedLayers
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=3, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=29, scale=0.1))
    out = os.path.join(str(tmp_path), "q2k")
    cv.convert(hf_dir, out, quant="q2_k", use_mla=True)

    e_flat = Engine(out, seed=0, prefill_chunk=4, decode_block=1,
                    scan_layers=False)
    e_flat.cfg = dataclasses.replace(e_flat.cfg, kernel_impl="pallas")
    e_scan = Engine(out, seed=0, prefill_chunk=4, decode_block=1,
                    scan_layers=True)
    e_scan.cfg = dataclasses.replace(e_scan.cfg, kernel_impl="pallas")
    assert any(isinstance(e, StackedLayers) for e in e_scan.params.layers)

    prompt = e_flat.tokenizer.encode("hello", bos=True)
    out1, _ = e_flat.generate(prompt, num_steps=6, temperature=0.0)
    out2, _ = e_scan.generate(prompt, num_steps=6, temperature=0.0)
    assert out1 == out2

    t1 = e_flat.perplexity(prompt + out1)[0]
    t2 = e_scan.perplexity(prompt + out1)[0]
    np.testing.assert_allclose(t2, t1, rtol=1e-3)


def test_shard_params_unstacks():
    """A mesh run on stacked params auto-unstacks (mirrors auto-unfuse):
    BatchScheduler(mesh=...) on a deep auto-scanned Engine must not crash."""
    from deepseek_tpu.parallel import make_mesh
    from deepseek_tpu.parallel.sharding import shard_params
    cfg = _cfg(layers=5)
    flat = random_params(cfg, seed=3)
    stacked = stack_layer_groups(flat, cfg, min_group=2)
    mesh = make_mesh(data=2)
    sp_flat = shard_params(flat, cfg, mesh)
    sp_stacked = shard_params(stacked, cfg, mesh)
    assert not any(isinstance(e, StackedLayers) for e in sp_stacked.layers)
    for a, b in zip(jax.tree.leaves(sp_flat), jax.tree.leaves(sp_stacked)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_unstacks():
    from deepseek_tpu.parallel.pipeline import Pipeline
    cfg = _cfg(layers=5)
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    flat = random_params(cfg, seed=9)
    want, _ = _decode_logits(cfg, flat)
    pp = Pipeline(cfg, stack_layer_groups(flat, cfg, min_group=2),
                  n_stages=2, batch=2)
    toks = [3, 17, 9, 4]
    got = []
    for pos, t in enumerate(toks):
        lg = pp.decode_step(jnp.asarray([[t]] * 2, jnp.int32), pos)
        got.append(np.asarray(lg))
    np.testing.assert_allclose(np.stack(got), want, rtol=1e-5, atol=1e-5)


def test_align_param_layouts_cpu_identity():
    """align_param_layouts is a TPU-only relayout; on CPU it must return
    the params untouched (same leaves, no copies) and never crash — the
    Engine calls it for every scanned deep model."""
    from deepseek_tpu.models.loader import align_param_layouts
    cfg = _cfg(layers=5)
    params = stack_layer_groups(random_params(cfg, seed=5), cfg,
                                min_group=2)
    out = align_param_layouts(params, cfg, n_steps=2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out)):
        assert a is b


def test_auto_scan_skips_nibble_runtime(tmp_path):
    """scan_layers="auto" must leave nibble-runtime models unrolled: the
    scan+nibble combination OOMs on chip at the first decode dispatch
    (PERFORMANCE.md), and unrolled nibble is the fastest deep config.
    Explicit scan_layers=True still stacks."""
    import os

    from deepseek_tpu import convert as cv
    from deepseek_tpu.engine import Engine
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=16, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=31, scale=0.1))
    out = os.path.join(str(tmp_path), "q2k16")
    cv.convert(hf_dir, out, quant="q2_k", use_mla=True)

    e_nib = Engine(out, seed=0, decode_block=1, kquant_runtime="nibble")
    assert not any(isinstance(e, StackedLayers) for e in e_nib.params.layers)
    e_auto = Engine(out, seed=0, decode_block=1)
    assert any(isinstance(e, StackedLayers) for e in e_auto.params.layers)


def test_sliced_qmatmul_prefill_materializes():
    """qmatmul on a LayerSlicedQT picks the formulation by mode: decode
    (1 row) routes through the expert-gather kernel (no slice copy per
    scan iteration), prefill (a chunk of rows) materializes the slice and
    batch-tiles — the pair-flat gather grid would re-dequant every weight
    tile once per ROW. Both must agree numerically."""
    from deepseek_tpu.models.testing import _random_qtensor
    from deepseek_tpu.ops.matmul import LayerSlicedQT, qmatmul
    from deepseek_tpu.ops.pallas.qmm import TRACE_COUNTS

    rng = np.random.default_rng(7)
    Lg, d, n = 3, 128, 256
    key = [jax.random.PRNGKey(11)]

    def nxt():
        key[0], sub = jax.random.split(key[0])
        return sub

    stacked = _random_qtensor(nxt, (Lg, d, n), "q2_k")
    sl = LayerSlicedQT(stacked, jnp.int32(1))

    xp = jnp.asarray(rng.standard_normal((1, 16, n), dtype=np.float32))
    xd = xp[:, :1]
    ref = qmatmul(sl, xp, impl=None)  # XLA dequant reference

    # TRACE_COUNTS bumps at jit TRACE time only: an earlier test tracing
    # qmm/qmm_experts at identical avals would turn the calls below into
    # cache hits and the exact `== base + 1` asserts would fail
    # spuriously. Clear the jit caches so each call re-traces.
    from deepseek_tpu.ops.pallas import qmm as _qmm_mod
    _qmm_mod.qmm.clear_cache()
    _qmm_mod.qmm_experts.clear_cache()

    base = dict(TRACE_COUNTS)
    out_d = qmatmul(sl, xd, impl={"interpret": True})
    assert TRACE_COUNTS["qmm_experts"] == base.get("qmm_experts", 0) + 1
    out_p = qmatmul(sl, xp, impl={"interpret": True, "prefill": True})
    assert TRACE_COUNTS["qmm_experts"] == base.get("qmm_experts", 0) + 1
    assert TRACE_COUNTS["qmm"] > base.get("qmm", 0)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_p[:, :1]), np.asarray(out_d),
                               rtol=2e-2, atol=2e-2)
