"""Per-row-position verify mode: prefill semantics with pos0 (B,).

The batched speculative-verify primitive (`_forward_impl` verify mode,
models/deepseek.py): each batch row writes+attends its own T-token chunk
at its own offset. Logits must match running each row's chunk through a
single-sequence scalar-position prefill at that row's offset, bit-for-bit
per path (same kernels, same math, only the mask/scatter generalize).
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


def _run_parity(cfg, atol=0.0):
    params = random_params(cfg, 0)
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
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    _run_parity(cfg)


def test_verify_matches_per_row_prefill_mha():
    cfg = tiny_config(use_mla=False, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    _run_parity(cfg)


def test_verify_matches_per_row_prefill_int8_kv():
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32,
                      kv_cache_dtype="int8")
    _run_parity(cfg)


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
