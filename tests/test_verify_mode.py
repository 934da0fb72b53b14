"""Per-row-position verify mode: prefill semantics with pos0 (B,).

The batched speculative-verify primitive (`_forward_impl` verify mode,
models/deepseek.py): each batch row writes+attends its own T-token chunk
at its own offset. Logits must match running each row's chunk through a
single-sequence scalar-position prefill at that row's offset — same
kernels, same math; only the mask/scatter generalize. Tolerances are
f32 reduction-order noise only (batched vs B=1 einsums), ~1e-7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.models import deepseek as dsk
from deepseek_tpu.models.kvcache import init_cache
from deepseek_tpu.models.testing import random_params
from tests.util_tinymodel import tiny_config


def _merge(full, part, b):
    return jax.tree.map(
        lambda f, p: None if f is None else f.at[:, b].set(p[:, 0]),
        full, part, is_leaf=lambda x: x is None)


def _strip_decompress(params):
    """Drop wq_b/wkv_b so BOTH scalar prefill and verify take the absorbed
    MLA path (verify always does — hybrid decompression is gated off for
    tiny chunks; see _attention) — making the comparison bit-exact."""
    import dataclasses
    layers = [dataclasses.replace(lp, wq_b=None, wkv_b=None)
              for lp in params.layers]
    return dataclasses.replace(params, layers=layers)


def _run_parity(cfg, atol=1e-5, strip=False):
    params = random_params(cfg, 0)
    if strip:
        params = _strip_decompress(params)
    B, T = 3, 4
    fwd = dsk.make_forward(cfg, prefill=True, logits_mode="all", jit=False)

    rng = np.random.default_rng(0)
    lens = [5, 9, 7]
    hist = [rng.integers(1, cfg.vocab_size, size=n).astype(np.int32)
            for n in lens]
    chunks = rng.integers(1, cfg.vocab_size, size=(B, T)).astype(np.int32)

    want = []
    for b in range(B):
        c1 = init_cache(cfg, batch=1)
        _, c1 = fwd(params, c1, hist[b][None], 0)
        lg, c1 = fwd(params, c1, chunks[b][None], lens[b])
        want.append(np.asarray(lg[0]))

    cB = init_cache(cfg, batch=B)
    for b in range(B):
        c1 = init_cache(cfg, batch=1)
        _, c1 = fwd(params, c1, hist[b][None], 0)
        cB = _merge(cB, c1, b)
    lg_all, cB = fwd(params, cB, jnp.asarray(chunks),
                     jnp.asarray(lens, jnp.int32))
    got = np.asarray(lg_all)
    for b in range(B):
        np.testing.assert_allclose(got[b], want[b], atol=atol, rtol=0)
    return got, cB


def test_verify_matches_per_row_prefill_mla():
    # absorbed-only checkpoint: scalar prefill and verify share the
    # absorbed path (tolerance = batched-einsum reduction-order noise)
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    _run_parity(cfg, strip=True)


def test_verify_matches_per_row_prefill_mla_hybrid():
    # hybrid checkpoint: scalar prefill decompresses, verify stays
    # absorbed — identical math, f32 rounding only
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    _run_parity(cfg, atol=1e-4)


def test_verify_matches_per_row_prefill_mha():
    cfg = tiny_config(use_mla=False, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    _run_parity(cfg)


def test_verify_matches_per_row_prefill_int8_kv():
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32,
                      kv_cache_dtype="int8")
    _run_parity(cfg, strip=True)


def test_verify_then_decode_continues_exactly():
    """Cache state after a verify chunk equals the per-row sequential
    state: a decode step from the merged post-verify cache must match a
    decode step from each row's own sequential cache."""
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    params = random_params(cfg, 0)
    B, T = 2, 3
    fwd = dsk.make_forward(cfg, prefill=True, logits_mode="all", jit=False)
    dec = dsk.make_forward(cfg, prefill=False, logits_mode="last", jit=False)

    rng = np.random.default_rng(2)
    lens = [6, 4]
    hist = [rng.integers(1, 300, size=n).astype(np.int32) for n in lens]
    chunks = rng.integers(1, 300, size=(B, T)).astype(np.int32)
    nxt = rng.integers(1, 300, size=(B, 1)).astype(np.int32)

    want = []
    for b in range(B):
        c1 = init_cache(cfg, batch=1)
        _, c1 = fwd(params, c1, hist[b][None], 0)
        _, c1 = fwd(params, c1, chunks[b][None], lens[b])
        lg, _ = dec(params, c1, nxt[b][None], lens[b] + T)
        want.append(np.asarray(lg[0]))

    cB = init_cache(cfg, batch=B)
    for b in range(B):
        c1 = init_cache(cfg, batch=1)
        _, c1 = fwd(params, c1, hist[b][None], 0)
        cB = _merge(cB, c1, b)
    _, cB = fwd(params, cB, jnp.asarray(chunks), jnp.asarray(lens, jnp.int32))
    lg, _ = dec(params, cB, jnp.asarray(nxt),
                jnp.asarray(lens, jnp.int32) + T)
    got = np.asarray(lg)
    for b in range(B):
        # the B=2 decode sums in a different order than B=1 (float noise
        # only; the verify-path writes themselves are bit-exact above)
        np.testing.assert_allclose(got[b], want[b], atol=1e-5, rtol=0)


def test_verify_rejects_seq_parallel():
    """Verify mode must refuse seq/context-parallel contexts."""
    import dataclasses

    from deepseek_tpu.parallel.spmd import NULL_CTX
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    params = random_params(cfg, 0)
    cache = init_cache(cfg, batch=2)
    ctx = dataclasses.replace(NULL_CTX, cp=True)
    with pytest.raises(AssertionError):
        dsk._forward_impl(params, cache,
                          jnp.zeros((2, 3), jnp.int32),
                          jnp.asarray([1, 2], jnp.int32), cfg=cfg,
                          prefill=True, logits_mode="all", ctx=ctx)


def test_verify_mode_under_scanned_stack():
    """Verify mode with lax.scan-stacked layer groups (the deep-model
    runtime layout): logits match the unrolled verify forward."""
    from deepseek_tpu.models.loader import stack_layer_groups
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32,
                      n_layers=4)
    params = random_params(cfg, 0)
    stacked = stack_layer_groups(params, cfg, min_group=2)
    from deepseek_tpu.models.params import StackedLayers
    assert any(isinstance(e, StackedLayers) for e in stacked.layers)

    fwd = dsk.make_forward(cfg, prefill=True, logits_mode="all", jit=False)
    B, T = 2, 3
    rng = np.random.default_rng(3)
    lens = [5, 8]
    hist = [rng.integers(1, 300, size=n).astype(np.int32) for n in lens]
    chunks = rng.integers(1, 300, size=(B, T)).astype(np.int32)

    def run(p):
        cB = init_cache(cfg, batch=B)
        for b in range(B):
            c1 = init_cache(cfg, batch=1)
            _, c1 = fwd(p, c1, hist[b][None], 0)
            cB = _merge(cB, c1, b)
        lg, _ = fwd(p, cB, jnp.asarray(chunks), jnp.asarray(lens, jnp.int32))
        return np.asarray(lg)

    np.testing.assert_allclose(run(stacked), run(params), atol=1e-5, rtol=0)
