"""Hybrid MLA: decompressed prefill must equal absorbed prefill exactly
(the absorption is a linear factorization — same math, fewer FLOPs)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from deepseek_tpu import convert as cv
from deepseek_tpu.engine import Engine

from tests.util_hf import hf_config, hf_weights, write_hf_dir


def test_hybrid_prefill_with_int8_cache(tmp_path):
    """Decompressed prefill + int8 KV cache: the prefill branch must carry
    the sink float-master buffer through (regression: it was dropped,
    crashing the first decode step after hydrate)."""
    cfg = hf_config(dim=64, hidden=96, q_lora=48, kv_lora=32, nope=16,
                    rope=16, v_dim=16, layers=2, vocab=300)
    hf_dir = os.path.join(str(tmp_path), "hf8")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=4, scale=0.15))
    out = os.path.join(str(tmp_path), "mla8")
    cv.convert(hf_dir, out, quant="fp32", use_mla=True)

    eng = Engine(out, seed=0, prefill_chunk=8, kv_cache_dtype="int8")
    assert eng.params.layers[0].wkv_b is not None  # hybrid path active
    toks = eng.tokenizer.encode("hello world", bos=True)
    out_toks, _ = eng.generate(toks, num_steps=6, temperature=0.0)
    assert len(out_toks) >= 1

    # parity against the float cache within int8 rounding
    eng_f = Engine(out, seed=0, prefill_chunk=8)
    want, _ = eng_f.generate(toks, num_steps=6, temperature=0.0)
    # greedy tokens may flip on near-ties; just require a sane prefix match
    assert out_toks[0] == want[0]


def test_hybrid_prefill_equals_absorbed(tmp_path):
    cfg = hf_config(dim=64, hidden=96, q_lora=48, kv_lora=32, nope=16,
                    rope=16, v_dim=16, layers=2, vocab=300)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=3, scale=0.15))
    out = os.path.join(str(tmp_path), "mla")
    cv.convert(hf_dir, out, quant="fp32", use_mla=True)

    eng = Engine(out, seed=0, prefill_chunk=8)
    lp = eng.params.layers[0]
    assert lp.wkv_b is not None and lp.wq_b is not None, \
        "--mla checkpoints must retain the decompressed projections"

    toks = eng.tokenizer.encode("hello world", bos=True)

    # hybrid (decompressed prefill branch active)
    c1 = eng.new_cache()
    c1, lg_hybrid, lsm_h, _ = eng.hydrate(c1, toks, 0, collect_all_logits=True)

    # absorbed-only: strip the decompressed projections
    eng.params = dataclasses.replace(
        eng.params,
        layers=[dataclasses.replace(l, wkv_b=None, wq_b=None)
                for l in eng.params.layers])
    eng._fns = {}
    c2 = eng.new_cache()
    c2, lg_abs, lsm_a, _ = eng.hydrate(c2, toks, 0, collect_all_logits=True)

    np.testing.assert_allclose(lsm_h, lsm_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(lg_hybrid, lg_abs, rtol=2e-4, atol=2e-4)
    # cache contents identical too (writes are the same latent rows)
    np.testing.assert_allclose(np.asarray(c1.ckv), np.asarray(c2.ckv),
                               rtol=1e-5, atol=1e-5)


def test_hydration_numerics_chunk_length_independent(tmp_path):
    """Round-5 policy pin: on a QUANTIZED hybrid-MLA checkpoint, hydrating
    the same document with different prefill chunk sizes must produce
    near-identical perplexity. A chunk-size-dependent projection policy
    (round 4's MAC-count decompress gate) silently switched short chunks
    to the absorbed quantized projections, whose quantization error
    differs from the factors' — ppl then depended on chunk length."""
    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300,
                    n_experts=4, n_active=2)
    hf_dir = os.path.join(str(tmp_path), "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=29, scale=0.1))
    out = os.path.join(str(tmp_path), "q2k")
    cv.convert(hf_dir, out, quant="q2_k", use_mla=True)

    e_small = Engine(out, seed=0, prefill_chunk=4, decode_block=1)
    doc = e_small.tokenizer.encode(
        "the quick brown fox jumps over the lazy dog again and again",
        bos=True)
    p_small = e_small.perplexity(doc)[0]
    e_big = Engine(out, seed=0, prefill_chunk=64, decode_block=1)
    p_big = e_big.perplexity(doc)[0]
    # same projection policy regime for every chunk size -> only masking /
    # accumulation-order noise remains
    np.testing.assert_allclose(p_small, p_big, rtol=2e-3)
