"""HuggingFace -> `.dseek` checkpoint converter.

Capability parity with the reference converter (/root/reference/convert.py):
normalizes the HF config into string-valued metadata, merges safetensors
shards, embeds the tokenizer vocab as a tensor, dequantizes HF-native FP8
checkpoints (weight_scale_inv block grids), re-quantizes to the target
format (fp32 / fp16 / blockwise f8e5m2 / Q2_K / Q3_K), stacks per-expert
weights into one 3-D tensor, performs the offline MLA absorption
(c_proj = k_nope_b^T @ q_nope_b per head -> attn.wc / wq_rope_b / wv_b,
convert.py:384-438), and writes `shard_NNN.dseek` every 8 layers.

Improvements over the reference converter:
- numpy/ml_dtypes pipeline (no torch dependency for the common path)
- ``noaux_tc`` is kept as-is (the engine implements it); pass
  ``--ref-compat-topk`` to downgrade to group_limited_greedy like the
  reference (convert.py:110-111)
- K-quant encoding uses the vectorized encoder (deepseek_tpu.quant.kquant)
  or the native C++/OpenMP encoder when built (deepseek_tpu.native).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from deepseek_tpu.quant import fp8 as fp8q
from deepseek_tpu.quant import kquant
from deepseek_tpu.utils import codec

SUPPORTED_ARCHITECTURES = ["DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM"]
SUPPORTED_QUANTS = ["fp32", "fp16", "f8e5m2", "q2_k", "q3_k"]


def _k_quantize(t: np.ndarray, method: str) -> np.ndarray:
    try:
        from deepseek_tpu.native import kquant_native
        if kquant_native.available():
            return kquant_native.quantize(t, method)
    except ImportError:
        pass
    fn = kquant.quantize_q2_k if method == "q2_k" else kquant.quantize_q3_k
    return fn(t)


# ---------------------------------------------------------------------------
# config normalization
# ---------------------------------------------------------------------------

def normalize_metadata(config: dict, tokenizer_config: dict, quant: str,
                       n_layers: Optional[int], use_mla: bool,
                       bsize: Optional[int], ref_compat_topk: bool = False) -> dict:
    arch = config["architectures"][0]
    if arch not in SUPPORTED_ARCHITECTURES:
        raise ValueError(f"unsupported architecture {arch}")
    if quant not in SUPPORTED_QUANTS:
        raise ValueError(f"unsupported quant {quant}")

    nl = config["num_hidden_layers"]
    if n_layers is not None:
        nl = min(nl, n_layers)

    q_lora = config["q_lora_rank"] or 0
    if use_mla and not (q_lora > 0 and config["kv_lora_rank"] > 0):
        raise ValueError("--mla requires q_lora_rank > 0 and kv_lora_rank > 0")

    assert not config.get("attention_bias", False)
    assert not config.get("mlp_bias", False)
    assert config["hidden_act"] in ("gelu", "silu")

    topk_method = config["topk_method"]
    if topk_method == "noaux_tc" and ref_compat_topk:
        topk_method = "group_limited_greedy"

    rs = config["rope_scaling"]
    assert rs["type"] == "yarn"

    md = {
        "arch": arch,
        "use_mla": str(int(use_mla)),
        "quant": quant,
        "dim": str(config["hidden_size"]),
        "hidden_dim": str(config["intermediate_size"]),
        "n_layers": str(nl),
        "n_heads": str(config["num_attention_heads"]),
        "vocab_size": str(config["vocab_size"]),
        "max_seq_len": str(tokenizer_config["model_max_length"]),
        "bos_token_id": str(config["bos_token_id"]),
        "eos_token_id": str(config["eos_token_id"]),
        "rope_theta": str(config.get("rope_theta", 10000.0)),
        "norm_eps": str(config["rms_norm_eps"]),
        "norm_type": "rmsnorm",
        "act_type": config["hidden_act"],
        "first_k_dense_replace": str(config["first_k_dense_replace"]),
        "kv_lora_rank": str(config["kv_lora_rank"]),
        "q_lora_rank": str(q_lora),
        "qk_nope_head_dim": str(config["qk_nope_head_dim"]),
        "qk_rope_head_dim": str(config["qk_rope_head_dim"]),
        "v_head_dim": str(config["v_head_dim"]),
        "n_shared_experts": str(config["n_shared_experts"]),
        "n_routed_experts": str(config["n_routed_experts"]),
        "n_active_routed": str(config["num_experts_per_tok"]),
        "moe_intermediate_size": str(config["moe_intermediate_size"]),
        "routed_scaling_factor": str(config["routed_scaling_factor"]),
        "n_group": str(config["n_group"]),
        "norm_topk_prob": str(config["norm_topk_prob"]),
        "scoring_func": config["scoring_func"],
        "topk_group": str(config["topk_group"]),
        "topk_method": topk_method,
        "rope_scaling_beta_fast": str(rs["beta_fast"]),
        "rope_scaling_beta_slow": str(rs["beta_slow"]),
        "rope_scaling_factor": str(rs["factor"]),
        "rope_scaling_mscale": str(rs["mscale"]),
        "rope_scaling_mscale_all_dim": str(rs["mscale_all_dim"]),
        "rope_scaling_original_max_position_embeddings":
            str(rs["original_max_position_embeddings"]),
    }
    if quant == "f8e5m2" and bsize != 0:
        # --bsize 0 = per-tensor scalar scales (the reference's no---bsize
        # default, convert.py:326-334): no block-size keys in the metadata,
        # the runtime loads scalar/(E,1,1) scales (loader.py). The default
        # here stays 128x128 blockwise — scale tiles map 1:1 onto MXU tiles
        # and feed the fused Pallas kernels; per-tensor fp8 runs the XLA
        # dequant path.
        b = bsize if bsize else 128
        md["quantization_block_size_0"] = str(b)
        md["quantization_block_size_1"] = str(b)

    # chat template (HF tokenizer_config.json): embedded verbatim so the
    # CLI chat mode / the server's /v1/chat/completions can format turns
    # the way the checkpoint expects (deepseek_tpu.chat.render_chat). The
    # reference has no chat surface; extra metadata keys are ignored by
    # its Config::from_yalm, so .dseek files stay cross-loadable.
    tpl = tokenizer_config.get("chat_template")
    if isinstance(tpl, list):        # HF multi-template form
        named = {t.get("name"): t.get("template") for t in tpl
                 if isinstance(t, dict)}
        tpl = named.get("default") or next(iter(named.values()), None)
    if isinstance(tpl, str) and tpl:
        md["chat_template"] = tpl

        def tok_str(key):
            v = tokenizer_config.get(key)
            if isinstance(v, dict):      # AddedToken form
                v = v.get("content")
            return v if isinstance(v, str) else None

        bos, eos = tok_str("bos_token"), tok_str("eos_token")
        if bos:
            md["chat_bos_token"] = bos
        if eos:
            md["chat_eos_token"] = eos
    return md


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def gpt2_bytes_to_unicode() -> Dict[int, str]:
    """The GPT-2 byte<->unicode mapping used by HF ByteLevel tokenizers."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def load_tokens(tokenizer_path: str, vocab_size: int) -> List[bytes]:
    """Extract the vocab as UTF-8 byte strings (convert.py:187-214)."""
    with open(tokenizer_path) as f:
        tok = json.load(f)
    use_gpt2_bytes = not tok["model"].get("byte_fallback", False)
    tokens: List[str] = [""] * vocab_size
    for t, i in tok["model"]["vocab"].items():
        tokens[i] = t
    for added in tok.get("added_tokens", []):
        tokens[added["id"]] = added["content"]

    gpt2_decode = {v: k for k, v in gpt2_bytes_to_unicode().items()}
    out: List[bytes] = []
    for t in tokens:
        if use_gpt2_bytes:
            b = bytes(gpt2_decode.get(ch, 0) for ch in t)
        else:
            b = t.replace("▁", " ").encode("utf-8")
        out.append(b.replace(b"\x00", b"\x07"))
    return out


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _read_safetensors(paths: List[str]
                      ) -> Tuple[Dict[str, np.ndarray], List[np.memmap]]:
    """Memmap every input shard: tensors are lazy views, fetched (copied)
    one at a time by Converter.fetch — conversion never holds the
    checkpoint in RAM. Also returns the underlying memmaps so the caller
    can drop already-consumed pages (see _release_mapped_pages)."""
    weights: Dict[str, np.ndarray] = {}
    mms: List[np.memmap] = []
    for path in paths:
        _, tensors = codec.load_shard(path, read_metadata=False)
        first = True
        for name, tv in tensors.items():
            if name in weights:
                raise ValueError(f"duplicate tensor {name}")
            weights[name] = tv.array
            if first:
                b = tv.array
                while b is not None and not isinstance(b, np.memmap):
                    b = b.base
                if isinstance(b, np.memmap):
                    mms.append(b)
                first = False
    return weights, mms


def _release_mapped_pages(mms: List[np.memmap]) -> None:
    """Drop the input memmaps' resident pages (MADV_DONTNEED).

    Every HF tensor is read exactly once, but touched pages of a private
    read-only mapping stay counted in RSS until memory pressure — on a
    671B-scale checkpoint that reads as an unbounded-memory converter.
    Called after each output shard is written; peak RSS stays ~one output
    shard + the largest single tensor, independent of checkpoint size
    (verified by scripts/check_convert_rss.py). Pages not yet touched are
    unaffected; a hypothetical re-read just refaults from disk."""
    import mmap as _m
    if not hasattr(_m, "MADV_DONTNEED"):  # pragma: no cover - non-Linux
        return
    for mm in mms:
        try:
            mm._mmap.madvise(_m.MADV_DONTNEED)
        except (AttributeError, ValueError, OSError):  # pragma: no cover
            pass


class Converter:
    def __init__(self, weights: Dict[str, np.ndarray], md: dict, quant: str,
                 bsize: Optional[int], dequant_block: Optional[Tuple[int, int]]):
        self.w = weights
        self.md = md
        self.quant = quant
        if quant == "f8e5m2":
            # (0, 0) = per-tensor scalar scale (--bsize 0)
            self.block = (0, 0) if bsize == 0 else (bsize or 128,) * 2
        else:
            self.block = None
        self.dequant_block = dequant_block

    def fetch(self, name: str) -> np.ndarray:
        """Load + dequantize an HF tensor (handles fp8 weight_scale_inv)."""
        t = np.asarray(self.w[name])
        scale_name = name.replace(".weight", ".weight_scale_inv")
        if scale_name in self.w and scale_name != name:
            t = fp8q.blockwise_dequantize(
                t.astype(np.float32), np.asarray(self.w[scale_name], np.float32),
                self.dequant_block)
        return t.astype(np.float32)

    def quantize(self, t: np.ndarray) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        if self.quant == "fp32":
            return t.astype(np.float32), None
        if self.quant == "fp16":
            return t.astype(np.float16), None
        if self.quant == "f8e5m2":
            if self.block == (0, 0):
                # per-tensor scalar scale, ONE per stored tensor even for
                # expert stacks — byte-identical wire format to the
                # reference's no---bsize path (convert.py:326-334,344-362;
                # note the reference BINARY cannot load this format back:
                # its check_tensor divides by block_size 0, model.cpp:192+
                # — convert-side only there; this engine loads and runs it,
                # loader.py broadcasts the scalar per expert axis)
                return fp8q.per_tensor_quantize(t)
            if t.ndim == 3:  # stacked experts: per-expert block grids
                qs, ss = zip(*(fp8q.blockwise_quantize(e, self.block) for e in t))
                return np.stack(qs), np.stack(ss)
            q, s = fp8q.blockwise_quantize(t, self.block)
            return q, s
        # K-quants
        if t.ndim == 3:
            return np.stack([_k_quantize(e, self.quant) for e in t]), None
        return _k_quantize(t, self.quant), None

    def conv(self, out: dict, out_name: str, hf_name: str):
        q, s = self.quantize(self.fetch(hf_name))
        out[out_name + ".weight"] = q
        if s is not None:
            out[out_name + ".scale"] = s

    def conv_raw(self, out: dict, out_name: str, t: np.ndarray):
        q, s = self.quantize(t)
        out[out_name + ".weight"] = q
        if s is not None:
            out[out_name + ".scale"] = s

    def conv_experts(self, out: dict, out_name: str, hf_names: List[str]):
        t = np.stack([self.fetch(n) for n in hf_names])
        self.conv_raw(out, out_name, t)


def convert_weights(weights: Dict[str, np.ndarray], md: dict,
                    quant: str, use_mla: bool, tie_word_embeddings: bool,
                    bsize: Optional[int],
                    dequant_block: Optional[Tuple[int, int]],
                    progress: bool = False,
                    mtp_layer: Optional[int] = None) -> Iterator[dict]:
    """Yields tensor dicts, one per 8-layer output shard (convert.py:374-377)."""
    cv = Converter(weights, md, quant, bsize, dequant_block)
    n_layers = int(md["n_layers"])
    n_heads = int(md["n_heads"])
    kv_lora = int(md["kv_lora_rank"])
    q_lora = int(md["q_lora_rank"])
    rope_dim = int(md["qk_rope_head_dim"])
    nope_dim = int(md["qk_nope_head_dim"])
    v_dim = int(md["v_head_dim"])
    first_dense = int(md["first_k_dense_replace"])
    n_experts = int(md["n_routed_experts"])
    is_v3 = md["arch"] == "DeepseekV3ForCausalLM"

    tensors: dict = {}
    cv.conv(tensors, "model.embed", "model.embed_tokens.weight")

    def convert_block(tensors, hf, out, moe):
        """One transformer block (shared by main layers and the MTP block)."""
        tensors[f"{out}.attn.norm.weight"] = \
            np.asarray(weights[f"{hf}.input_layernorm.weight"], np.float32)
        tensors[f"{out}.attn.kv_a_norm.weight"] = \
            np.asarray(weights[f"{hf}.self_attn.kv_a_layernorm.weight"], np.float32)

        cv.conv(tensors, f"{out}.attn.wkv_a", f"{hf}.self_attn.kv_a_proj_with_mqa.weight")
        cv.conv(tensors, f"{out}.attn.wo", f"{hf}.self_attn.o_proj.weight")

        if use_mla:
            cv.conv(tensors, f"{out}.attn.wq_a", f"{hf}.self_attn.q_a_proj.weight")
            tensors[f"{out}.attn.q_a_norm.weight"] = \
                np.asarray(weights[f"{hf}.self_attn.q_a_layernorm.weight"], np.float32)
            # --- offline MLA absorption (convert.py:396-434) ---
            kv_b = cv.fetch(f"{hf}.self_attn.kv_b_proj.weight").reshape(
                n_heads, nope_dim + v_dim, kv_lora)
            q_b = cv.fetch(f"{hf}.self_attn.q_b_proj.weight").reshape(
                n_heads, nope_dim + rope_dim, q_lora)
            k_nope_b = kv_b[:, :nope_dim]                   # (H, nope, R)
            v_b = kv_b[:, nope_dim:].reshape(n_heads * v_dim, kv_lora)
            q_nope_b = q_b[:, :nope_dim]                    # (H, nope, Q)
            q_rope_b = q_b[:, nope_dim:]                    # (H, rope, Q)
            # absorbed score projection: scores live in kv_lora space
            c_proj = np.einsum("hnr,hnq->hrq", k_nope_b, q_nope_b)
            cv.conv_raw(tensors, f"{out}.attn.wq_rope_b",
                        q_rope_b.reshape(-1, q_lora))
            cv.conv_raw(tensors, f"{out}.attn.wc", c_proj.reshape(-1, q_lora))
            cv.conv_raw(tensors, f"{out}.attn.wv_b", v_b)
            # ALSO keep the decompressed projections (~3% extra bytes):
            # prefill attends in head space (nope+rope dims) which costs
            # ~2-3x fewer FLOPs than absorbed latent-space scores at large
            # chunk x window; decode keeps the absorbed path. Identical math
            # (the absorption is a linear factorization).
            cv.conv(tensors, f"{out}.attn.wkv_b", f"{hf}.self_attn.kv_b_proj.weight")
            cv.conv(tensors, f"{out}.attn.wq_b", f"{hf}.self_attn.q_b_proj.weight")
        else:
            cv.conv(tensors, f"{out}.attn.wkv_b", f"{hf}.self_attn.kv_b_proj.weight")
            if q_lora > 0:
                cv.conv(tensors, f"{out}.attn.wq_a", f"{hf}.self_attn.q_a_proj.weight")
                cv.conv(tensors, f"{out}.attn.wq_b", f"{hf}.self_attn.q_b_proj.weight")
                tensors[f"{out}.attn.q_a_norm.weight"] = \
                    np.asarray(weights[f"{hf}.self_attn.q_a_layernorm.weight"], np.float32)
            else:
                cv.conv(tensors, f"{out}.attn.wq", f"{hf}.self_attn.q_proj.weight")

        tensors[f"{out}.mlp.norm.weight"] = \
            np.asarray(weights[f"{hf}.post_attention_layernorm.weight"], np.float32)

        if not moe:
            cv.conv(tensors, f"{out}.mlp.w1", f"{hf}.mlp.gate_proj.weight")
            cv.conv(tensors, f"{out}.mlp.w2", f"{hf}.mlp.down_proj.weight")
            cv.conv(tensors, f"{out}.mlp.w3", f"{hf}.mlp.up_proj.weight")
        else:
            tensors[f"{out}.moegate.weight"] = \
                np.asarray(weights[f"{hf}.mlp.gate.weight"], np.float32)
            if is_v3:
                tensors[f"{out}.moegate.bias"] = np.asarray(
                    weights[f"{hf}.mlp.gate.e_score_correction_bias"], np.float32)
            for proj, hf_proj in (("w1", "gate_proj"), ("w2", "down_proj"),
                                  ("w3", "up_proj")):
                cv.conv_experts(
                    tensors, f"{out}.mlp.{proj}",
                    [f"{hf}.mlp.experts.{e}.{hf_proj}.weight" for e in range(n_experts)])
            cv.conv(tensors, f"{out}.shared_mlp.w1", f"{hf}.mlp.shared_experts.gate_proj.weight")
            cv.conv(tensors, f"{out}.shared_mlp.w2", f"{hf}.mlp.shared_experts.down_proj.weight")
            cv.conv(tensors, f"{out}.shared_mlp.w3", f"{hf}.mlp.shared_experts.up_proj.weight")

    for l in range(n_layers):
        if l % 8 == 0 and l > 0:
            yield tensors
            tensors = {}
        if progress:
            print(f"\rConverting layer {l + 1}/{n_layers}", end="", flush=True)
        convert_block(tensors, f"model.layers.{l}", f"model.layers.{l}",
                      moe=l >= first_dense)

    # DeepSeek-V3 MTP module (HF stores it as one extra layer index):
    # converted for lossless self-speculative decoding; the reference drops
    # it entirely. The prediction head is the shared lm_head.
    if mtp_layer is not None and \
            f"model.layers.{mtp_layer}.eh_proj.weight" in weights:
        hf = f"model.layers.{mtp_layer}"
        tensors["model.mtp.enorm.weight"] = \
            np.asarray(weights[f"{hf}.enorm.weight"], np.float32)
        tensors["model.mtp.hnorm.weight"] = \
            np.asarray(weights[f"{hf}.hnorm.weight"], np.float32)
        cv.conv(tensors, "model.mtp.eh_proj", f"{hf}.eh_proj.weight")
        tensors["model.mtp.norm.weight"] = \
            np.asarray(weights[f"{hf}.shared_head.norm.weight"], np.float32)
        convert_block(tensors, hf, "model.mtp.block",
                      moe=mtp_layer >= first_dense)

    tensors["model.norm.weight"] = np.asarray(weights["model.norm.weight"], np.float32)
    if not tie_word_embeddings:
        cv.conv(tensors, "model.output", "lm_head.weight")
    if progress:
        print()
    yield tensors


# ---------------------------------------------------------------------------

def convert(input_dir: str, output_dir: str, *, quant: str = "fp16",
            use_mla: bool = False, n_layers: Optional[int] = None,
            bsize: Optional[int] = None, ref_compat_topk: bool = False,
            progress: bool = False) -> None:
    with open(os.path.join(input_dir, "config.json")) as f:
        config = json.load(f)
    with open(os.path.join(input_dir, "tokenizer_config.json")) as f:
        tokenizer_config = json.load(f)

    md = normalize_metadata(config, tokenizer_config, quant, n_layers,
                            use_mla, bsize, ref_compat_topk)

    dequant_block = None
    qc = config.get("quantization_config")
    if qc is not None:
        assert qc["quant_method"] == "fp8"
        dequant_block = tuple(qc["weight_block_size"])

    model_files = sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.endswith(".safetensors"))
    if not model_files:
        raise FileNotFoundError(f"no .safetensors in {input_dir}")
    weights, mms = _read_safetensors(model_files)

    tokens = load_tokens(os.path.join(input_dir, "tokenizer.json"),
                         int(md["vocab_size"]))

    os.makedirs(output_dir, exist_ok=True)
    # MTP module lives at HF layer index num_hidden_layers (V3 checkpoints)
    mtp_layer = int(config["num_hidden_layers"])
    if f"model.layers.{mtp_layer}.eh_proj.weight" not in weights:
        mtp_layer = None
    shards = convert_weights(
        weights, md, quant, use_mla,
        bool(config.get("tie_word_embeddings", False)), bsize, dequant_block,
        progress=progress, mtp_layer=mtp_layer)
    for i, shard in enumerate(shards):
        if i == 0:
            shard["tokenizer.tokens"] = codec.pack_tokenizer_tokens(tokens)
        codec.save_shard(
            os.path.join(output_dir, f"shard_{i:03d}.dseek"),
            shard, metadata=md if i == 0 else None)
        _release_mapped_pages(mms)   # bounded RSS at any checkpoint size
        if progress:
            print(f"Saved shard {i}", flush=True)


def main():
    ap = argparse.ArgumentParser(description="HF checkpoint -> .dseek")
    ap.add_argument("output_dir")
    ap.add_argument("input", help="HF model dir (config.json, tokenizer.json, *.safetensors)")
    ap.add_argument("--mla", action="store_true", help="absorbed-MLA attention")
    ap.add_argument("--quant", default="fp16", choices=SUPPORTED_QUANTS)
    ap.add_argument("--bsize", type=int, default=None,
                    help="f8e5m2 scale block size (default 128; 0 = "
                         "per-tensor scalar scales like the reference's "
                         "no---bsize default)")
    ap.add_argument("--n-layers", type=int, default=None)
    ap.add_argument("--ref-compat-topk", action="store_true",
                    help="downgrade noaux_tc to group_limited_greedy like the reference")
    args = ap.parse_args()
    convert(args.input, args.output_dir, quant=args.quant, use_mla=args.mla,
            n_layers=args.n_layers, bsize=args.bsize,
            ref_compat_topk=args.ref_compat_topk, progress=True)


if __name__ == "__main__":
    main()
