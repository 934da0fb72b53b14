"""Unrolled-nibble depth ladder: does the TPU program-size cliff return?

PERFORMANCE.md (round 2) measured the unrolled program-size cliff at
L>24 on the packed K-quants (marginal layer cost 0.32 -> 1.7 ms) and
fixed it with scanned layer stacks — but scan+nibble OOMs at depth, so
nibble models ship UNROLLED. That is only viable at DeepSeek-V3 depth
(61 layers) if the unrolled nibble program stays under the instruction
budget. Program size scales with the op count per layer x layer count,
NOT weight bytes, so this ladder slims the expert table (E=16, same k)
to fit 61 layers of Q3_K nibble in one v5e HBM while keeping the
per-layer op structure identical to the real model.

Usage: python scripts/bench_depth.py [L ...]   (default 16 32 48 61)
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_config
from deepseek_tpu.models import init_cache
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.models.loader import fuse_projections, params_active_bytes
from deepseek_tpu.models.testing import random_quantized_params
from deepseek_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def slim_config(layers: int):
    """V2-Lite shapes with the expert TABLE cut to 16 (k=6 unchanged):
    per-layer op count (and thus program size) matches the full model;
    only resident bytes shrink so 61 layers fit one chip."""
    return dataclasses.replace(
        bench_config(layers), moe_intermediate_size=1536,
        n_routed_experts=16, n_active_routed=6, n_group=4, topk_group=2)


def measure(layers: int, block: int = 32, n_blocks: int = 4):
    cfg = slim_config(layers)
    t0 = time.perf_counter()
    params = random_quantized_params(cfg, "q3_k_nibble")
    params = fuse_projections(params, cfg, consume=True)
    jax.block_until_ready(jax.tree.leaves(params))
    synth_s = time.perf_counter() - t0
    cache = init_cache(cfg, batch=1)
    loop = make_decode_loop(cfg, block)
    key = jax.random.PRNGKey(0)
    args = (jnp.float32(0.0), jnp.float32(1.0))
    tok = jnp.zeros((1, 1), jnp.int32)
    t0 = time.perf_counter()
    for wu in range(2):
        toks, _, cache = loop(params, cache, tok, jnp.int32(wu * block),
                              key, *args)
        tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_blocks):
        toks, _, cache = loop(params, cache, tok, jnp.int32(block * (i + 2)),
                              key, *args)
        tok = toks[:, -1:]
    _ = int(np.asarray(tok)[0, 0])
    dt = time.perf_counter() - t0
    n = n_blocks * block
    tok_s = n / dt
    gb = params_active_bytes(params, cfg, n) / 1e9
    print(f"L={layers:3d}: {tok_s:7.1f} tok/s  {1e3/tok_s:7.3f} ms/token  "
          f"({gb*tok_s:4.0f} GB/s active; synth {synth_s:.0f}s, "
          f"compile+warm {compile_s:.0f}s)", flush=True)
    del params, cache
    return 1e3 / tok_s


def main():
    depths = [int(a) for a in sys.argv[1:]] or [16, 32, 48, 61]
    ms = {}
    for L in depths:
        ms[L] = measure(L)
    for a, b in zip(depths, depths[1:]):
        print(f"marginal ms/layer {a}->{b}: {(ms[b]-ms[a])/(b-a):.3f}")


if __name__ == "__main__":
    main()
