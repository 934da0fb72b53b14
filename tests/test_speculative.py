"""Speculative decoding: lossless greedy equality with any draft model."""

import pytest

from deepseek_tpu.engine import Engine
from deepseek_tpu.utils import codec

from tests.util_tinymodel import (
    tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
)


def _ckpt(tmp_path_factory, name, seed, **cfg_kw):
    d = tmp_path_factory.mktemp(name)
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=48, **cfg_kw)
    codec.save_checkpoint(
        str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, seed))],
        tiny_metadata(cfg))
    return str(d)


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    return Engine(_ckpt(tmp_path_factory, "tgt", 42), seed=0, prefill_chunk=8)


@pytest.fixture(scope="module")
def draft(tmp_path_factory):
    # different weights AND depth — a genuinely different (worse) draft
    return Engine(_ckpt(tmp_path_factory, "drf", 7, n_layers=2),
                  seed=0, prefill_chunk=8)


def test_speculative_greedy_matches_vanilla(target, draft):
    prompt = target.tokenizer.encode("ab", bos=True)
    want, _ = target.generate(prompt, num_steps=24, temperature=0.0)
    got, _ = target.generate_speculative(
        prompt, draft, num_steps=24, temperature=0.0, spec_k=3)
    assert got == want


def test_speculative_self_draft_full_acceptance(target):
    """Drafting with the target itself must accept everything (greedy)."""
    prompt = target.tokenizer.encode("ba", bos=True)
    want, _ = target.generate(prompt, num_steps=12, temperature=0.0)
    got, stats = target.generate_speculative(
        prompt, target, num_steps=12, temperature=0.0, spec_k=4)
    assert got == want


def test_speculative_past_window_fallback(target, draft):
    """Rounds fall back to plain decode once positions leave the prefill
    window; greedy output stays identical through the transition."""
    prompt = target.tokenizer.encode("ab", bos=True)
    want, _ = target.generate(prompt, num_steps=60, temperature=0.0)
    got, _ = target.generate_speculative(
        prompt, draft, num_steps=60, temperature=0.0, spec_k=4)
    assert got == want


def test_speculative_sampled_runs(target, draft):
    prompt = target.tokenizer.encode("ab", bos=True)
    got, _ = target.generate_speculative(
        prompt, draft, num_steps=10, temperature=0.9, top_p=0.9, spec_k=3)
    assert 1 <= len(got) <= 10
    assert all(0 <= t < target.cfg.vocab_size for t in got)
