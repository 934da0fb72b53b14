"""Re-attribute the lm_head + skeleton decode cost (VERDICT r4 #8).

Vocab ablation on the 8L bench config: decode tok/s at the full 102400
vocab vs a tiny 512 vocab — the delta is the lm_head matvec + full-vocab
sampling cost as actually paid inside the fused decode loop. Run for
bf16 (420 MB head; the round-1 attribution said 0.9 ms vs 0.51 ideal)
and Q3_K nibble (the headline runtime).

Usage: python scripts/probe_lmhead.py [bf16|nibble]
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from deepseek_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from bench import bench_config, measure_decode
from deepseek_tpu.models.loader import fuse_projections
from deepseek_tpu.models.testing import random_params, random_quantized_params


def run(quant: str, vocab: int):
    cfg = bench_config(8)
    cfg = dataclasses.replace(cfg, vocab_size=vocab)
    if quant == "bf16":
        params = random_params(cfg, seed=0)
    else:
        cfg = dataclasses.replace(cfg, moe_intermediate_size=1536)
        params = random_quantized_params(cfg, "q3_k_nibble")
    params = fuse_projections(params, cfg, consume=True)
    jax.block_until_ready(jax.tree.leaves(params))
    tok_s, gb_s = measure_decode(cfg, params, jax.default_backend())
    del params
    return tok_s


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    full = run(quant, 102400)
    tiny = run(quant, 512)
    ms_full, ms_tiny = 1e3 / full, 1e3 / tiny
    if quant == "bf16":
        head_gb = 102400 * 2048 * 2 / 1e9
    else:
        head_gb = 102400 * 2048 * 0.625 / 1e9
    ideal = head_gb / 820 * 1e3
    print(f"[{quant}] full-vocab {full:.1f} tok/s ({ms_full:.3f} ms), "
          f"vocab-512 {tiny:.1f} tok/s ({ms_tiny:.3f} ms)")
    print(f"[{quant}] lm_head+sampling delta {ms_full - ms_tiny:.3f} ms "
          f"vs {ideal:.3f} ms ideal head stream "
          f"({head_gb:.2f} GB head)")


if __name__ == "__main__":
    main()
