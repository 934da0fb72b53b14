"""Speculative decoding: lossless greedy equality with any draft model."""

import pytest

from deepseek_tpu.engine import Engine
from deepseek_tpu.utils import codec

from tests.util_tinymodel import (
    tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
)


def _ckpt(tmp_path_factory, name, seed, **cfg_kw):
    d = tmp_path_factory.mktemp(name)
    kw = dict(use_mla=True, vocab_size=300, max_seq_len=128,
              rs_original_max_position_embeddings=48)
    kw.update(cfg_kw)
    cfg = tiny_config(**kw)
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


def test_ngram_greedy_matches_vanilla(target):
    """Prompt-lookup speculation is lossless: greedy outputs are token-
    identical to plain decode whatever the drafter proposes (repetitive
    prompt so the n-gram matcher actually fires)."""
    prompt = target.tokenizer.encode("ab ab ab ab", bos=True)
    want, _ = target.generate(prompt, num_steps=20, temperature=0.0)
    got, stats = target.generate_ngram(
        prompt, num_steps=20, temperature=0.0, spec_k=3)
    assert got == want
    assert stats.spec_rounds >= 1        # the fused stage actually ran


def test_ngram_greedy_non_repetitive_prompt(target):
    """No-match rounds (fresh text) still produce exact greedy output,
    and the all-miss fallback to plain decode preserves it."""
    prompt = target.tokenizer.encode("xyzq", bos=True)
    want, _ = target.generate(prompt, num_steps=24, temperature=0.0)
    got, _ = target.generate_ngram(
        prompt, num_steps=24, temperature=0.0, spec_k=3)
    assert got == want


def test_ngram_accepts_on_context_echo(tmp_path_factory):
    """Acceptance fires when the continuation echoes the context: feed the
    model a prompt that CONTAINS its own greedy continuation prefix (the
    tiny model's cycle), so the lookup drafter proposes exactly what the
    target will emit — and the result must still equal plain decode.

    (Needs its own checkpoint: the module fixture's 48-slot window is too
    small for the fused stage to reach the echo region.)"""
    eng = Engine(_ckpt(tmp_path_factory, "ngr", 42, max_seq_len=256,
                       rs_original_max_position_embeddings=128),
                 seed=0, prefill_chunk=8)
    prompt = eng.tokenizer.encode("ab ab ab", bos=True)
    want, _ = eng.generate(prompt, num_steps=48, temperature=0.0)
    p2 = prompt + want[:32]              # embeds the model's own cycle
    want2, _ = eng.generate(p2, num_steps=16, temperature=0.0)
    got, stats = eng.generate_ngram(p2, num_steps=16, temperature=0.0,
                                    spec_k=4)
    assert got == want2
    assert stats.spec_accepted > 0       # multi-token rounds happened
    assert stats.spec_rounds < len(got)  # fewer verifies than tokens


def test_ngram_sampled_runs(target):
    prompt = target.tokenizer.encode("ab ab ab ab", bos=True)
    got, _ = target.generate_ngram(
        prompt, num_steps=10, temperature=0.9, top_p=0.9, spec_k=3)
    assert 1 <= len(got) <= 10
    assert all(0 <= t < target.cfg.vocab_size for t in got)
