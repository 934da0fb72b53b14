"""DeepSeek-V3-proportioned decode slice on the attached chip.

The reference's one published number is DeepSeek-V3 671B Q2_K decode
(/root/reference/README.md:24-26). The full 61-layer model cannot fit a
single 16 GB v5e in ANY format (Q3_K nibble needs ~430 GB), so this bench
proves the *architecture class* on real silicon: every dimension is the
exact V3 config (dim 7168, 128 heads, MLA r=512 + q_lora 1536, 256 routed
experts with k=8 sigmoid/noaux_tc group-8 routing + e-score bias, m=2048,
vocab 129280 — models.testing.deepseek_v3_proportions) and only the layer
count is sliced to what HBM holds:

    q3_k_nibble : 1 dense + 1 MoE layer, E=256 (~10.1 GB) <- headline v3slice
    q2_k packed : 1 dense + 1 MoE layer, E=256 (~6 GB) — BASELINE.md's
                  north-star format (the reference's published number IS
                  DeepSeek-V3 Q2_K). 2.625 bits/weight would fit a 3-layer
                  slice, but the packed planes' NARROW-MINOR f32 scale
                  arrays ((rows, n/256): 28 lanes at dim 7168) relayout-
                  copy into (8,128)-padded HLO temps inside the program —
                  measured 7.2 GB of temps at 30% utilization, OOM at L=3.
                  The Q2_K->nibble runtime layout (Engine
                  kquant_runtime="nibble", same wire bytes) avoids it and
                  is 1.8x faster besides; packed L=2 is kept as the
                  wire-layout measurement.
    f8e5m2      : 1 dense + 1 MoE layer, E=128 (~9.2 GB) — the full E=256
                  table is 11.6 GB in fp8 and measured-OOMs against the
                  chip's ~15.0 GB usable (E=160 at 10.6 GB also OOM'd at
                  dispatch: fp8 program temps run larger than nibble's);
                  E=128 keeps every fp8 kernel shape (dim 7168, m 2048)
    bf16        : impossible (one MoE layer = 22.6 GB weights alone)

Measurements:
  - L=2 (dense+MoE) fused 32-step decode-loop tok/s        (v3slice)
  - L=1 (dense only) same loop -> marginal MoE-layer ms    (61L plan input)
  - E=64 variant at identical k=8 (same active bytes)      (E=256 dispatch
    and n_group=8 gating cost isolation — "new cliffs" check)

Usage: python scripts/bench_v3.py [nibble|fp8] [--quick]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_tpu.models import init_cache
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.models.loader import params_active_bytes
from deepseek_tpu.models.testing import (
    deepseek_v3_proportions, random_fused_params,
)
from deepseek_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def v3_slice_config(n_layers: int, n_dense: int = 1, experts: int = 256):
    """V3 proportions with the depth (and optionally E) sliced to fit.
    first_k_dense_replace=n_dense keeps one real dense layer in the slice
    (hidden_dim-18432 shapes); everything else is exact V3."""
    return deepseek_v3_proportions(
        n_layers=n_layers, first_k_dense_replace=n_dense,
        n_routed_experts=experts)


def measure_decode(cfg, params, n_blocks: int = 8, block: int = 32,
                   tag: str = ""):
    cache = init_cache(cfg, batch=1)
    loop = make_decode_loop(cfg, block)
    key = jax.random.PRNGKey(0)
    args = (jnp.float32(0.0), jnp.float32(1.0))
    tok = jnp.zeros((1, 1), jnp.int32)
    t0 = time.perf_counter()
    for wu in range(2):  # compile + slow-first-dispatch warmup
        toks, _, cache = loop(params, cache, tok, jnp.int32(wu * block),
                              key, *args)
        tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])
    print(f"  [{tag}] compile+warmup: {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    for i in range(n_blocks):
        toks, _, cache = loop(params, cache, tok,
                              jnp.int32(block * (i + 2)), key, *args)
        tok = toks[:, -1:]
    _ = int(np.asarray(tok)[0, 0])
    dt = time.perf_counter() - t0
    n = n_blocks * block
    tok_s = n / dt
    gb = params_active_bytes(params, cfg, n) / 1e9
    print(f"  [{tag}] {tok_s:.1f} tok/s  ({1e3/tok_s:.2f} ms/token, "
          f"{gb:.2f} GB active/token -> {gb*tok_s:.0f} GB/s)")
    del cache
    return tok_s


def run_long_context(quant: str, quick: bool, window: int = 32768):
    """V3-proportioned LONG-CONTEXT decode: the slice at a ``window``-slot
    ring (YaRN-class context) with the cache nearly full, bf16 vs int8 KV.
    At dim 7168 / 128 absorbed-MLA heads a full window step reads
    window x (512+64) latent bytes per layer — the flash-decode kernel's
    scaling regime, which the 4096-window headline never exercises."""
    from deepseek_tpu.models.kvcache import init_cache as _init
    nb = 2 if quick else 6
    results = {}
    for kv_dtype in ("bfloat16", "int8"):
        cfg = v3_slice_config(2, experts=256)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, max_seq_len=window,
            rs_original_max_position_embeddings=window,
            kv_cache_dtype=kv_dtype)
        params = random_fused_params(cfg, quant)
        jax.block_until_ready(jax.tree.leaves(params))
        # hydrate position: start decoding near the END of the window so
        # attention covers ~the whole ring (the long-context cost case)
        cache = init_cache(cfg, batch=1)
        loop = make_decode_loop(cfg, 32)
        key = jax.random.PRNGKey(0)
        tok = jnp.zeros((1, 1), jnp.int32)
        pos0 = window - 32 * (nb + 3)
        t0 = time.perf_counter()
        for wu in range(2):
            toks, _, cache = loop(params, cache, tok,
                                  jnp.int32(pos0 + wu * 32), key,
                                  jnp.float32(0.0), jnp.float32(1.0))
            tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])
        print(f"  [long {kv_dtype}] compile+warmup: "
              f"{time.perf_counter()-t0:.0f}s")
        t0 = time.perf_counter()
        for i in range(nb):
            toks, _, cache = loop(params, cache, tok,
                                  jnp.int32(pos0 + 32 * (i + 2)), key,
                                  jnp.float32(0.0), jnp.float32(1.0))
            tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])
        dt = time.perf_counter() - t0
        tok_s = nb * 32 / dt
        results[kv_dtype] = tok_s
        print(f"  [long W={window} {kv_dtype} KV] {tok_s:.1f} tok/s "
              f"({1e3/tok_s:.2f} ms/token)")
        del params, cache
    return results


def run(quant: str, quick: bool):
    results = {}
    nb = 2 if quick else 8

    # --- headline: exact V3 proportions, as deep as the format fits ---
    e_full = 256 if quant != "f8e5m2" else 128   # see module docstring
    n_slice = 2
    cfg2 = v3_slice_config(n_slice, experts=e_full)
    t0 = time.perf_counter()
    params = random_fused_params(cfg2, quant)
    jax.block_until_ready(jax.tree.leaves(params))
    print(f"synth L{n_slice} E{e_full}: {time.perf_counter()-t0:.0f}s")
    results["v3slice_L2"] = measure_decode(
        cfg2, params, nb, tag=f"{quant} L{n_slice} E{e_full}")
    del params

    # --- L=1 dense-only: isolates the MoE layer's marginal cost ---
    cfg1 = v3_slice_config(1)
    params = random_fused_params(cfg1, quant)
    jax.block_until_ready(jax.tree.leaves(params))
    results["v3slice_L1dense"] = measure_decode(cfg1, params, nb,
                                                tag=f"{quant} L1 dense")
    del params

    n_moe = n_slice - 1
    moe_ms = (1e3 / results["v3slice_L2"]
              - 1e3 / results["v3slice_L1dense"]) / n_moe
    print(f"marginal MoE-layer cost: {moe_ms:.2f} ms/layer")

    # --- E=64 variant, same k=8: E-scaling of dispatch + gating ---
    cfg64 = v3_slice_config(n_slice, experts=64)
    params = random_fused_params(cfg64, quant)
    jax.block_until_ready(jax.tree.leaves(params))
    results["v3slice_L2_E64"] = measure_decode(
        cfg64, params, nb, tag=f"{quant} L{n_slice} E64")
    del params
    d = 1e3 / results["v3slice_L2"] - 1e3 / results["v3slice_L2_E64"]
    print(f"E=256 vs E=64 at k=8: {d*1e3:+.0f} us/token "
          f"(dispatch+gating E-scaling)")
    return results, moe_ms


if __name__ == "__main__":
    quant = "q3_k_nibble"
    if len(sys.argv) > 1 and sys.argv[1] in ("fp8", "f8e5m2"):
        quant = "f8e5m2"
    elif len(sys.argv) > 1 and sys.argv[1] in ("q2_k", "q2k"):
        quant = "q2_k"
    elif len(sys.argv) > 1 and sys.argv[1] not in ("nibble", "q3_k_nibble",
                                                   "--quick", "--long"):
        sys.exit(f"usage: {sys.argv[0]} [nibble|fp8|q2_k] [--quick] [--long]")
    if "--long" in sys.argv:
        run_long_context(quant, "--quick" in sys.argv)
    else:
        run(quant, "--quick" in sys.argv)
