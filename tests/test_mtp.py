"""MTP (multi-token prediction) self-speculative decoding.

Losslessness is the key property: whatever the MTP weights predict, the
verified output must be token-identical to plain greedy decoding."""

import os

import numpy as np
import pytest

from deepseek_tpu import convert as cv
from deepseek_tpu.engine import Engine

from tests.util_hf import hf_config, hf_weights, write_hf_dir


@pytest.fixture(scope="module")
def mtp_engine(tmp_path_factory):
    cfg = hf_config(dim=64, hidden=96, q_lora=48, kv_lora=32, nope=16,
                    rope=16, v_dim=16, layers=2, vocab=300)
    d = str(tmp_path_factory.mktemp("mtp"))
    hf_dir = os.path.join(d, "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=9, scale=0.15, mtp=True))
    out = os.path.join(d, "ck")
    cv.convert(hf_dir, out, quant="fp32", use_mla=True)
    return Engine(out, seed=0, prefill_chunk=8)


def test_mtp_weights_loaded(mtp_engine):
    mp = mtp_engine.params.mtp
    assert mp is not None
    assert mp.eh_proj.shape[-1] == 2 * mtp_engine.cfg.dim
    # wkv_a rides inside the fused [wkv_a; wq_a] pair by default
    assert mp.block.wkv_a is not None or mp.block.wkvq is not None


def test_mtp_greedy_matches_vanilla(mtp_engine):
    prompt = mtp_engine.tokenizer.encode("ab", bos=True)
    want, _ = mtp_engine.generate(prompt, num_steps=20, temperature=0.0)
    got, _ = mtp_engine.generate_mtp(prompt, num_steps=20, temperature=0.0,
                                     spec_k=2)
    assert got == want


def test_mtp_greedy_matches_deeper_chain(mtp_engine):
    prompt = mtp_engine.tokenizer.encode("ba", bos=True)
    want, _ = mtp_engine.generate(prompt, num_steps=16, temperature=0.0)
    got, _ = mtp_engine.generate_mtp(prompt, num_steps=16, temperature=0.0,
                                     spec_k=4)
    assert got == want


def test_mtp_sampled_runs(mtp_engine):
    prompt = mtp_engine.tokenizer.encode("ab", bos=True)
    got, _ = mtp_engine.generate_mtp(prompt, num_steps=8, temperature=0.8,
                                     top_p=0.9, spec_k=2)
    assert 1 <= len(got) <= 8
    assert all(0 <= t < mtp_engine.cfg.vocab_size for t in got)


def test_checkpoint_without_mtp_has_none(tmp_path):
    cfg = hf_config(dim=64, hidden=96, q_lora=48, kv_lora=32, nope=16,
                    rope=16, v_dim=16, layers=2, vocab=300)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=10, scale=0.15))
    out = os.path.join(str(tmp_path), "ck")
    cv.convert(hf_dir, out, quant="fp32", use_mla=True)
    assert Engine(out, seed=0).params.mtp is None
