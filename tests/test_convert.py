import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu import convert as cv
from deepseek_tpu.config import ModelConfig
from deepseek_tpu.engine import Engine
from deepseek_tpu.quant import fp8 as fp8q
from deepseek_tpu.utils import codec

from tests.util_hf import hf_config, hf_weights, write_hf_dir


def _mk(tmp_path, name, cfg, wd):
    d = os.path.join(str(tmp_path), name)
    write_hf_dir(d, cfg, wd)
    return d


def _greedy_logits(ckpt, tokens, steps=3):
    eng = Engine(ckpt, seed=0, prefill_chunk=4)
    cache = eng.new_cache()
    cache, logits, _, pos = eng.hydrate(cache, tokens, 0)
    outs = [logits]
    step = eng.fwd(False, "last")
    t = int(np.argmax(logits))
    for _ in range(steps):
        out, cache = step(eng.params, cache, jnp.asarray([[t]], jnp.int32), pos)
        logits = np.asarray(out[0])
        outs.append(logits)
        t = int(np.argmax(logits))
        pos += 1
    return np.stack(outs)


def test_convert_fp32_and_mla_absorption_equivalence(tmp_path):
    """The absorbed-MLA checkpoint must produce the same logits as the
    decompressed-MHA checkpoint built from the same HF weights — this is the
    mathematical content of the offline absorption (convert.py:396-434)."""
    cfg = hf_config()
    wd = hf_weights(cfg, seed=0)
    hf_dir = _mk(tmp_path, "hf", cfg, wd)

    out_mha = os.path.join(str(tmp_path), "mha")
    out_mla = os.path.join(str(tmp_path), "mla")
    cv.convert(hf_dir, out_mha, quant="fp32")
    cv.convert(hf_dir, out_mla, quant="fp32", use_mla=True)

    tokens = [1, 9, 22, 40]
    a = _greedy_logits(out_mha, tokens)
    b = _greedy_logits(out_mla, tokens)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


def test_convert_metadata_roundtrip(tmp_path):
    cfg = hf_config(arch="DeepseekV3ForCausalLM", topk_method="noaux_tc",
                    scoring="sigmoid")
    wd = hf_weights(cfg, seed=1)
    hf_dir = _mk(tmp_path, "hf", cfg, wd)
    out = os.path.join(str(tmp_path), "out")
    cv.convert(hf_dir, out, quant="fp16", use_mla=True)
    data = codec.load_checkpoint(out)
    mc = ModelConfig.from_metadata(data.metadata)
    assert mc.arch == "DeepseekV3ForCausalLM"
    assert mc.topk_method.value == "noaux_tc"       # kept, not downgraded
    assert mc.has_moegate_bias and mc.use_mla
    assert "model.layers.1.moegate.bias" in data

    # ref-compat downgrade flag
    out2 = os.path.join(str(tmp_path), "out2")
    cv.convert(hf_dir, out2, quant="fp16", use_mla=True, ref_compat_topk=True)
    md2 = codec.load_checkpoint(out2).metadata
    assert md2["topk_method"] == "group_limited_greedy"


def test_convert_fp16_close_to_fp32(tmp_path):
    cfg = hf_config()
    wd = hf_weights(cfg, seed=2)
    hf_dir = _mk(tmp_path, "hf", cfg, wd)
    o32 = os.path.join(str(tmp_path), "o32")
    o16 = os.path.join(str(tmp_path), "o16")
    cv.convert(hf_dir, o32, quant="fp32")
    cv.convert(hf_dir, o16, quant="fp16")
    tokens = [1, 5, 30]
    a = _greedy_logits(o32, tokens, steps=1)
    b = _greedy_logits(o16, tokens, steps=1)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("quant", ["f8e5m2", "q2_k", "q3_k"])
def test_convert_quantized_runs(tmp_path, quant):
    # dims divisible by 256 for K-quants
    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300)
    wd = hf_weights(cfg, seed=3, scale=0.1)
    hf_dir = _mk(tmp_path, "hf", cfg, wd)
    out = os.path.join(str(tmp_path), quant)
    cv.convert(hf_dir, out, quant=quant, use_mla=True,
               bsize=128 if quant == "f8e5m2" else None)
    data = codec.load_checkpoint(out)
    assert data.metadata["quant"] == quant
    logits = _greedy_logits(out, [1, 9], steps=1)
    assert np.isfinite(logits).all()
    if quant == "f8e5m2":
        assert "model.layers.0.attn.wo.scale" in data
        assert data.metadata["quantization_block_size_0"] == "128"


def test_convert_per_tensor_fp8(tmp_path):
    """--bsize 0 = per-tensor scalar scales, wire-format-identical to the
    reference's no---bsize default (/root/reference/convert.py:326-334,
    344-362: ONE scalar even for expert stacks). The reference binary
    cannot load this format back (its check_tensor divides by
    block_size=0, model.cpp:192+), so parity here is converter-side wire
    format + this engine loading and running it on both kernel paths."""
    import dataclasses
    from deepseek_tpu.models import init_cache, make_forward

    cfg = hf_config(dim=256, hidden=256, q_lora=256, kv_lora=256, nope=128,
                    rope=64, v_dim=128, moe_inter=256, layers=2, vocab=300)
    wd = hf_weights(cfg, seed=7, scale=0.1)
    hf_dir = _mk(tmp_path, "hf", cfg, wd)
    out = os.path.join(str(tmp_path), "pt")
    cv.convert(hf_dir, out, quant="f8e5m2", use_mla=True, bsize=0)
    data = codec.load_checkpoint(out)

    # wire format: no block-size metadata, ONE scalar scale per tensor
    # (the codec round-trips 0-d as shape-(1,))
    assert "quantization_block_size_0" not in data.metadata
    assert np.asarray(data["model.layers.0.attn.wo.scale"]).size == 1
    assert np.asarray(data["model.layers.1.mlp.w1.scale"]).size == 1

    # dequant roundtrip accuracy: e5m2 normals carry 2 mantissa bits
    orig = wd["model.layers.0.self_attn.o_proj.weight"]
    q = np.asarray(data["model.layers.0.attn.wo.weight"]).astype(np.float32)
    s = float(np.asarray(data["model.layers.0.attn.wo.scale"]))
    np.testing.assert_allclose(q * s, orig, rtol=0.13,
                               atol=float(np.abs(orig).max()) / 2 ** 10)

    # engine loads it (expert-stack scalar broadcasts to (E,1,1)) and the
    # XLA and kernel (gated: per-tensor fp8 has no fused expert kernel)
    # paths agree
    eng = Engine(out, seed=0, prefill_chunk=8)
    assert eng.cfg.block_size == (0, 0)
    from deepseek_tpu.quant.qtensor import Fp8Tensor
    w1 = eng.params.layers[1].w1
    assert isinstance(w1, Fp8Tensor) and w1.scale.shape == (4, 1, 1)
    lg = _greedy_logits(out, [1, 9], steps=1)
    assert np.isfinite(lg).all()

    cfg_k = dataclasses.replace(eng.cfg, kernel_impl="pallas")
    cfg_x = dataclasses.replace(eng.cfg, kernel_impl="xla")
    toks = jnp.asarray([[1, 9, 4, 7]], jnp.int32)
    outs = []
    for c in (cfg_k, cfg_x):
        cache = init_cache(c, batch=1)
        l, cache = make_forward(c, prefill=True, logits_mode="last")(
            eng.params, cache, toks, jnp.int32(0))
        d, cache = make_forward(c, prefill=False, logits_mode="last")(
            eng.params, cache, jnp.asarray([[2]], jnp.int32), jnp.int32(4))
        outs.append((np.asarray(l), np.asarray(d)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=2e-2, atol=2e-2)


def test_convert_dequantizes_hf_fp8_checkpoints(tmp_path):
    """HF-native FP8 weights with weight_scale_inv grids must be dequantized
    (convert.py:315-324)."""
    cfg = hf_config()
    cfg["quantization_config"] = {"quant_method": "fp8",
                                  "weight_block_size": [16, 16]}
    wd = hf_weights(cfg, seed=4)
    # replace one weight with an fp8 + scale pair
    name = "model.layers.0.self_attn.o_proj.weight"
    orig = wd[name]
    q, s = fp8q.blockwise_quantize(orig, (16, 16))
    wd[name] = q
    wd[name.replace(".weight", ".weight_scale_inv")] = s
    hf_dir = _mk(tmp_path, "hf", cfg, wd)
    out = os.path.join(str(tmp_path), "out")
    cv.convert(hf_dir, out, quant="fp32")
    data = codec.load_checkpoint(out)
    got = np.asarray(data["model.layers.0.attn.wo.weight"])
    want = fp8q.blockwise_dequantize(q, s, (16, 16))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_convert_n_layers_cap_and_sharding(tmp_path):
    cfg = hf_config(layers=3)
    wd = hf_weights(cfg, seed=5)
    hf_dir = _mk(tmp_path, "hf", cfg, wd)
    out = os.path.join(str(tmp_path), "out")
    cv.convert(hf_dir, out, quant="fp32", n_layers=2)
    data = codec.load_checkpoint(out)
    assert data.metadata["n_layers"] == "2"
    assert "model.layers.2.attn.norm.weight" not in data
    # engine loads and runs the truncated model
    _greedy_logits(out, [1, 4], steps=1)


def test_load_tokens_gpt2_and_sentencepiece(tmp_path):
    # sentencepiece style (byte_fallback=True): U+2581 -> space
    sp = {"model": {"vocab": {"<unk>": 0, "▁hi": 1}, "byte_fallback": True},
          "added_tokens": [{"id": 2, "content": "<pad>"}]}
    p = os.path.join(str(tmp_path), "sp.json")
    json.dump(sp, open(p, "w"))
    toks = cv.load_tokens(p, 3)
    assert toks[1] == b" hi" and toks[2] == b"<pad>"

    # gpt2-byte style (no byte_fallback): unicode chars map back to bytes
    from deepseek_tpu.convert import gpt2_bytes_to_unicode
    enc = gpt2_bytes_to_unicode()
    word = "".join(enc[b] for b in b"hi there")
    g2 = {"model": {"vocab": {"<unk>": 0, word: 1}}, "added_tokens": []}
    p2 = os.path.join(str(tmp_path), "g2.json")
    json.dump(g2, open(p2, "w"))
    toks2 = cv.load_tokens(p2, 2)
    assert toks2[1] == b"hi there"
