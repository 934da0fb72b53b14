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
    # EP prefill capacity path raises EPCapacityOverflow on routing skew
    # past the static budget (none here); signature stays (logits, cache)
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


def test_shard_map_decode_loop_per_slot_params():
    """Per-sequence temperature/top_p/pos vectors (what the continuous-
    batching scheduler passes) must work under dp > 1: the vectors are
    batch-sharded with the tokens."""
    from deepseek_tpu.models.deepseek import make_decode_loop

    cfg = tiny_config(use_mla=True, vocab_size=64)
    wd, params = build(cfg, seed=32)
    B = 4
    key = jax.random.PRNGKey(9)
    temps = jnp.asarray([0.0, 0.0, 0.0, 0.0], jnp.float32)
    topps = jnp.asarray([1.0, 0.9, 1.0, 0.8], jnp.float32)
    pos = jnp.asarray([0, 0, 0, 0], jnp.int32)
    tok = jnp.asarray([[3], [5], [7], [9]], jnp.int32)

    loop1 = make_decode_loop(cfg, 4)
    t1, lg1, _ = loop1(params, init_cache(cfg, batch=B), tok, pos, key,
                       temps, topps)

    mesh = make_mesh(data=2, expert=2, tensor=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=B), cfg, mesh)
    loop2 = make_decode_loop(cfg, 4, mesh=mesh, params=params, cache=sc)
    t2, lg2, _ = loop2(sp, sc, tok, pos, key, temps, topps)

    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_gspmd_jit_auto_upgrades_to_shard_map_kernels():
    """Plain-jit (GSPMD) calls with params spanning a standard mesh must
    auto-upgrade to the shard_map body so the Pallas fused-dequant kernels
    stay active per shard (pallas_call is opaque to the GSPMD partitioner;
    VERDICT r1 #9). Evidence: the gate's upgrade counter bumps (plain
    Python on first call — qmm's own trace counter can be skipped by the
    inner-jit cache when an earlier test traced identical avals)."""
    import dataclasses
    import deepseek_tpu.models.deepseek as dsk
    from deepseek_tpu.parallel import spmd as spmd_mod

    cfg = tiny_config(use_mla=True, vocab_size=64)
    cfg_pl = dataclasses.replace(cfg, kernel_impl="pallas")
    wd, params = build(cfg, seed=34)
    mesh = make_mesh(data=1, expert=2, tensor=2)
    sp = shard_params(params, cfg_pl, mesh)

    assert dsk._params_span_devices(sp)
    assert not dsk._params_span_devices(params)
    assert dsk._named_mesh(sp) is not None

    before = spmd_mod.TRACE_COUNTS["gspmd_upgrade"]
    step = make_forward(cfg_pl, prefill=False, logits_mode="last")
    sc = shard_cache(init_cache(cfg_pl, batch=1), cfg_pl, mesh)
    lg, _ = step(sp, sc, jnp.asarray([[3]], jnp.int32), 0)
    assert spmd_mod.TRACE_COUNTS["gspmd_upgrade"] > before, \
        "auto-upgrade did not engage"

    c1 = init_cache(cfg, batch=1)
    want, _ = make_forward(cfg, prefill=False, logits_mode="last")(
        params, c1, jnp.asarray([[3]], jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_gspmd_gate_rekeys_on_sharding_change():
    """One builder called with unsharded THEN sharded params (and back)
    must re-decide per sharding signature — the r2 gate cached its first
    decision keyed on nothing, so the sharded call would silently reuse
    the plain single-device fn (Pallas kernels under GSPMD = per-chip
    weight replication; VERDICT r2 #9)."""
    import dataclasses
    from deepseek_tpu.parallel import spmd as spmd_mod

    cfg = tiny_config(use_mla=True, vocab_size=64)
    cfg_pl = dataclasses.replace(cfg, kernel_impl="pallas")
    wd, params = build(cfg, seed=35)
    mesh = make_mesh(data=1, expert=2, tensor=2)
    sp = shard_params(params, cfg_pl, mesh)
    tk = jnp.asarray([[3]], jnp.int32)

    step = make_forward(cfg_pl, prefill=False, logits_mode="last")

    # 1. unsharded call first: plain single-device fn
    before = spmd_mod.TRACE_COUNTS["gspmd_upgrade"]
    want, _ = step(params, init_cache(cfg_pl, batch=1), tk, 0)
    assert spmd_mod.TRACE_COUNTS["gspmd_upgrade"] == before

    # 2. sharded call on the SAME builder: must upgrade, not reuse
    sc = shard_cache(init_cache(cfg_pl, batch=1), cfg_pl, mesh)
    lg, _ = step(sp, sc, tk, 0)
    assert spmd_mod.TRACE_COUNTS["gspmd_upgrade"] > before, \
        "stale gate: sharded params reused the single-device fn"
    np.testing.assert_allclose(np.asarray(lg), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    # 3. unsharded again: back to the plain fn, still correct
    lg3, _ = step(params, init_cache(cfg_pl, batch=1), tk, 0)
    np.testing.assert_allclose(np.asarray(lg3), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_gspmd_jit_fallback_without_mesh_form():
    """Builders with no shard_map form (with_hidden engine hook) must fall
    back to the XLA dequant path under GSPMD params — and stay correct."""
    import dataclasses
    from deepseek_tpu.ops.pallas import qmm as qmm_mod
    from deepseek_tpu.parallel import spmd as spmd_mod

    cfg = tiny_config(use_mla=True, vocab_size=64)
    cfg_pl = dataclasses.replace(cfg, kernel_impl="pallas")
    wd, params = build(cfg, seed=34)
    mesh = make_mesh(data=1, expert=2, tensor=2)
    sp = shard_params(params, cfg_pl, mesh)
    sc = shard_cache(init_cache(cfg_pl, batch=1), cfg_pl, mesh)

    before = sum(qmm_mod.TRACE_COUNTS.values())
    before_up = spmd_mod.TRACE_COUNTS["gspmd_upgrade"]
    step = make_forward(cfg_pl, prefill=False, logits_mode="last",
                        with_hidden=True)
    lg, hid, _ = step(sp, sc, jnp.asarray([[3]], jnp.int32), 0)
    assert spmd_mod.TRACE_COUNTS["gspmd_upgrade"] == before_up, \
        "with_hidden has no mesh form — must not auto-upgrade"
    assert sum(qmm_mod.TRACE_COUNTS.values()) == before, \
        "fallback path must not trace Pallas kernels under plain GSPMD jit"

    c1 = init_cache(cfg, batch=1)
    want, want_hid, _ = make_forward(
        cfg, prefill=False, logits_mode="last", with_hidden=True)(
        params, c1, jnp.asarray([[3]], jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(hid), np.asarray(want_hid),
                               rtol=2e-3, atol=2e-3)


def test_gspmd_jit_fused_params_fall_back():
    """Fused-projection params spanning devices under plain jit must fall
    back to the XLA path instead of auto-upgrading (the shard_map pspecs
    describe the UNFUSED layout — upgrading would crash with a pytree
    structure mismatch) — and the logits must stay correct."""
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deepseek_tpu.models.loader import fuse_projections
    from deepseek_tpu.parallel import spmd as spmd_mod

    cfg = tiny_config(use_mla=True, vocab_size=64)
    cfg_pl = dataclasses.replace(cfg, kernel_impl="pallas")
    wd, params = build(cfg, seed=34)
    fused = fuse_projections(params, cfg)
    assert fused.layers[0].wkvq is not None

    mesh = make_mesh(data=1, expert=2, tensor=2)
    rep = NamedSharding(mesh, P())   # user-placed: replicated but spanning
    sp = jax.tree.map(lambda a: jax.device_put(a, rep), fused)
    sc = jax.tree.map(lambda a: jax.device_put(a, rep),
                      init_cache(cfg_pl, batch=1))

    before_up = spmd_mod.TRACE_COUNTS["gspmd_upgrade"]
    step = make_forward(cfg_pl, prefill=False, logits_mode="last")
    lg, _ = step(sp, sc, jnp.asarray([[3]], jnp.int32), 0)
    assert spmd_mod.TRACE_COUNTS["gspmd_upgrade"] == before_up, \
        "fused params must not auto-upgrade"

    want, _ = make_forward(cfg, prefill=False, logits_mode="last")(
        params, init_cache(cfg, batch=1), jnp.asarray([[3]], jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(want),
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
                       mesh=mesh, params=params, cache=sc,
                       on_overflow="return")
    got, ovf, _ = pre(sp, sc, toks, 0)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_ep_decode_dispatch_parity_and_traffic():
    """EP decode uses the sorted-pair dispatch (parallel.spmd.dispatch_pairs
    + the pair-innermost qmm_experts grid): logits must match the
    single-device XLA path, and the per-shard weight-fetch count — the
    number of distinct consecutive expert ids in the sorted pair list,
    which is exactly what drives Mosaic's repeated-index DMA elision —
    must equal the shard's distinct owned experts (~k/EP), not B*k."""
    import dataclasses
    from jax.sharding import PartitionSpec as P
    from deepseek_tpu.parallel.spmd import make_ctx

    cfg = tiny_config(use_mla=True, vocab_size=64)
    cfg_pl = dataclasses.replace(cfg, kernel_impl="pallas")
    wd, params = build(cfg, seed=40)
    B = 4
    tokens = [1, 9, 22, 40, 3]

    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=B)
    lg1 = None
    for pos, t in enumerate(tokens):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]] * B, jnp.int32), pos)

    mesh = make_mesh(data=1, expert=4, tensor=2)
    sp = shard_params(params, cfg_pl, mesh)
    sc = shard_cache(init_cache(cfg_pl, batch=B), cfg_pl, mesh)
    step2 = make_forward(cfg_pl, prefill=False, logits_mode="last",
                         mesh=mesh, params=params, cache=sc)
    lg2 = None
    for pos, t in enumerate(tokens):
        lg2, sc = step2(sp, sc, jnp.asarray([[t]] * B, jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)

    # traffic accounting on the dispatch itself
    ctx = make_ctx(cfg, mesh)
    E, k = cfg.n_routed_experts, cfg.n_active_routed
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, E, size=(B, k)), jnp.int32)
    w = jnp.ones((B, k), jnp.float32)

    def body(idx, w):
        lidx, ws, tok = ctx.dispatch_pairs(idx, w, E)
        fetches = (1 + jnp.sum(lidx[1:] != lidx[:-1]))[None]
        owned = jnp.sum(ws > 0)[None]
        return lidx[None], ws[None], tok[None], fetches, owned

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P("expert"), P("expert"), P("expert"),
                   P("expert"), P("expert")), check_vma=False))
    lidx_all, w_all, tok_all, fetches, owned = map(np.asarray, f(idx, w))

    # every pair is owned by exactly one shard
    assert owned.sum() == B * k
    # E_local = 1 here: each shard fetches exactly ONE expert tile per
    # projection, no matter how many of the B*k pairs it owns
    np.testing.assert_array_equal(fetches, np.ones(4, np.int64))

    # the sorted/aliased pair lists still reconstruct the exact mixture:
    # owned weights match the original pair weights per (token, expert)
    for s in range(4):
        for p in range(B * k):
            if w_all[s, p] > 0:
                tok_id = tok_all[s, p]
                geid = s  # E_local=1 -> global expert id == shard id
                assert geid in np.asarray(idx)[tok_id]


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
@pytest.mark.parametrize("hybrid", [False, True])
def test_seq_parallel_prefill_matches(kv_dtype, hybrid, tmp_path):
    """Chunked prefill with the MLA KV cache sharded along the window:
    shard-masked slot writes + flash-merged partial attention reproduce the
    stepwise single-device logits, for both the latent (absorbed) and the
    hybrid decompressed prefill paths."""
    import dataclasses

    if hybrid:
        # hybrid prefill (wq_b/wkv_b retained) comes from the converter
        from deepseek_tpu import convert as cv
        from deepseek_tpu.engine import Engine
        from tests.util_hf import hf_config, hf_weights, write_hf_dir
        hcfg = hf_config()
        hf = str(tmp_path / "hf")
        write_hf_dir(hf, hcfg, hf_weights(hcfg, seed=36, scale=0.2))
        out = str(tmp_path / "ck")
        cv.convert(hf, out, quant="fp32", use_mla=True)
        eng = Engine(out, seed=0)
        cfg = dataclasses.replace(eng.cfg, kv_cache_dtype=kv_dtype)
        params = eng.params
        assert params.layers[0].wq_b is not None  # hybrid weights present
        vocab_hi = cfg.vocab_size
    else:
        cfg = tiny_config(use_mla=True, vocab_size=64,
                          rs_original_max_position_embeddings=16)
        cfg = dataclasses.replace(cfg, kv_cache_dtype=kv_dtype)
        wd, params = build(cfg, seed=35)
        vocab_hi = 60
    tokens = np.random.default_rng(3).integers(3, vocab_hi - 2,
                                               size=10).tolist()

    # single-device stepwise reference
    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=1)
    lg1 = None
    for pos, t in enumerate(tokens):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]], jnp.int32), pos)

    mesh = make_mesh(data=1, expert=2, tensor=2, seq=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    pre = make_forward(cfg, prefill=True, logits_mode="last",
                       mesh=mesh, params=params, cache=sc)
    step2 = make_forward(cfg, prefill=False, logits_mode="last",
                         mesh=mesh, params=params, cache=sc)
    toks = jnp.asarray([tokens[:8]], jnp.int32)
    lg2, sc = pre(sp, sc, toks, 0)
    for pos, t in enumerate(tokens[8:], start=8):
        lg2, sc = step2(sp, sc, jnp.asarray([[t]], jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
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


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_seq_parallel_decode_matches_mha(kv_dtype):
    """Sequence-sharded decompressed-MHA KV cache: guarded per-head slot
    writes, shard-0 sink re-rotation, and the flash merge must reproduce
    the unsharded decode logits through ring wraparound."""
    import dataclasses

    cfg = tiny_config(use_mla=False, rs_original_max_position_embeddings=8)
    cfg = dataclasses.replace(cfg, kv_cache_dtype=kv_dtype)
    wd, params = build(cfg, seed=37)
    tokens = np.random.default_rng(4).integers(3, 60, size=14).tolist()

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


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_seq_parallel_prefill_matches_mha(kv_dtype):
    """Chunked prefill with the decompressed-MHA KV cache sharded along the
    window: shard-intersection chunk writes + flash-merged partial
    attention reproduce the stepwise single-device logits."""
    import dataclasses

    cfg = tiny_config(use_mla=False, vocab_size=64,
                      rs_original_max_position_embeddings=16)
    cfg = dataclasses.replace(cfg, kv_cache_dtype=kv_dtype)
    wd, params = build(cfg, seed=38)
    tokens = np.random.default_rng(5).integers(3, 60, size=10).tolist()

    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=1)
    lg1 = None
    for pos, t in enumerate(tokens):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]], jnp.int32), pos)

    mesh = make_mesh(data=1, expert=2, tensor=2, seq=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    pre = make_forward(cfg, prefill=True, logits_mode="last",
                       mesh=mesh, params=params, cache=sc)
    step2 = make_forward(cfg, prefill=False, logits_mode="last",
                         mesh=mesh, params=params, cache=sc)
    toks = jnp.asarray([tokens[:8]], jnp.int32)
    lg2, sc = pre(sp, sc, toks, 0)
    for pos, t in enumerate(tokens[8:], start=8):
        lg2, sc = step2(sp, sc, jnp.asarray([[t]], jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("chunk", [8, 7])
def test_context_parallel_prefill_engages_and_matches(chunk):
    """Context-parallel prefill (chunk rows sharded over 'seq', Q-gather +
    reduce-scatter merge) engages exactly when the chunk divides the seq
    axis, falls back to replicated rows otherwise, and both reproduce the
    stepwise single-device logits."""
    import dataclasses
    from deepseek_tpu.parallel import spmd as spmd_mod

    cfg = tiny_config(use_mla=True, vocab_size=64,
                      rs_original_max_position_embeddings=16)
    wd, params = build(cfg, seed=39)
    tokens = np.random.default_rng(6).integers(3, 60, size=chunk + 2).tolist()

    step1 = make_forward(cfg, prefill=False, logits_mode="last")
    c1 = init_cache(cfg, batch=1)
    lg1 = None
    for pos, t in enumerate(tokens):
        lg1, c1 = step1(params, c1, jnp.asarray([[t]], jnp.int32), pos)

    mesh = make_mesh(data=1, expert=2, tensor=1, seq=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    pre = make_forward(cfg, prefill=True, logits_mode="last",
                       mesh=mesh, params=params, cache=sc)
    step2 = make_forward(cfg, prefill=False, logits_mode="last",
                         mesh=mesh, params=params, cache=sc)
    before = spmd_mod.TRACE_COUNTS["cp_rows"]
    lg2, sc = pre(sp, sc, jnp.asarray([tokens[:chunk]], jnp.int32), 0)
    engaged = spmd_mod.TRACE_COUNTS["cp_rows"] - before
    if chunk % 2 == 0:
        assert engaged > 0, "divisible chunk must take the CP path"
    else:
        assert engaged == 0, "non-divisible chunk must fall back"
    for pos, t in enumerate(tokens[chunk:], start=chunk):
        lg2, sc = step2(sp, sc, jnp.asarray([[t]], jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_context_parallel_prefill_all_logits():
    """logits_mode='all' under CP: lm_head runs on local row shards and the
    gathered logits match the unsharded prefill (the perplexity path)."""
    cfg = tiny_config(use_mla=True, vocab_size=64,
                      rs_original_max_position_embeddings=16)
    wd, params = build(cfg, seed=40)
    toks = jnp.asarray([np.random.default_rng(7).integers(3, 60, size=8)],
                       jnp.int32)

    pre1 = make_forward(cfg, prefill=True, logits_mode="all")
    lg1, _ = pre1(params, init_cache(cfg, batch=1), toks, 0)

    mesh = make_mesh(data=1, expert=2, tensor=2, seq=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=1), cfg, mesh)
    pre2 = make_forward(cfg, prefill=True, logits_mode="all",
                        mesh=mesh, params=params, cache=sc)
    lg2, _ = pre2(sp, sc, toks, 0)
    assert lg2.shape == lg1.shape
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-3, atol=2e-3)


def test_ep_prefill_capacity_compaction():
    """EP prefill computes only OWNED pairs, compacted to the static
    capacity: FLOP budget per shard is C = ~cf*N/EP rows (vs N before),
    parity holds when nothing overflows, and pathological routing skew is
    detected via the overflow count instead of silently dropping pairs."""
    from jax.sharding import PartitionSpec as P
    from deepseek_tpu.config import ActivationType
    from deepseek_tpu.ops.matmul import ep_prefill_capacity, grouped_expert_ffn
    from deepseek_tpu.parallel.spmd import SpmdCtx
    from deepseek_tpu.quant.qtensor import PlainTensor

    E, m, dim, B, T, k = 4, 128, 128, 1, 128, 2
    N = B * T * k
    rng = np.random.default_rng(50)
    w1 = jnp.asarray(rng.standard_normal((E, m, dim)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, dim, m)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((E, m, dim)) * 0.1, jnp.float32)
    xb = jnp.asarray(rng.standard_normal((B, T, dim)) * 0.3, jnp.float32)
    wts = jnp.asarray(rng.uniform(size=(B, T, k)), jnp.float32)

    # static budget scales with cf/EP
    assert ep_prefill_capacity(N, 1, 0.0) == 256          # exact: all pairs
    assert ep_prefill_capacity(N, 2, 2.0) == 256
    assert ep_prefill_capacity(N, 2, 0.5) == 128          # cf*N/EP rounded

    mesh = make_mesh(data=1, expert=2, tensor=1)

    def run(cf, idx):
        ctx = SpmdCtx(ep=2, ep_capacity_factor=cf)

        def body(w1, w2, w3, xb, wts, idx):
            return grouped_expert_ffn(
                PlainTensor(data=w1), PlainTensor(data=w2),
                PlainTensor(data=w3), xb, wts, idx,
                ActivationType.SILU, ctx, interpret=True)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("expert"), P("expert"), P("expert"), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        out, ovf = f(w1, w2, w3, xb, wts, idx)
        return np.asarray(out), int(ovf)

    # balanced routing, ample capacity: exact parity with the dense ref
    idx = jnp.asarray(rng.integers(0, E, size=(B, T, k)), jnp.int32)
    out, ovf = run(2.0, idx)
    assert ovf == 0
    d = [np.asarray(w) for w in (w1, w2, w3)]
    want = np.zeros((B, T, dim), np.float32)
    x = np.asarray(xb)
    for t in range(T):
        for s in range(k):
            e = int(idx[0, t, s])
            g1 = x[0, t] @ d[0][e].T
            g3 = x[0, t] @ d[2][e].T
            h = (g1 / (1 + np.exp(-g1))) * g3
            want[0, t] += float(wts[0, t, s]) * (h @ d[1][e].T)
    np.testing.assert_allclose(out, want, rtol=2e-3, atol=2e-3)

    # pathological skew: all pairs on one shard overflows the capacity and
    # the count says exactly how many contributions are missing
    idx_skew = jnp.zeros((B, T, k), jnp.int32)
    _, ovf = run(0.5, idx_skew)                           # C=128, owned=256
    assert ovf == N - 128


def test_default_mesh_shape():
    cfg = tiny_config()
    d, e, t = default_mesh_shape(8, cfg)
    assert d * e * t == 8
    assert cfg.n_routed_experts % e == 0
    assert cfg.n_heads % t == 0
    assert default_mesh_shape(1, cfg) == (1, 1, 1)
