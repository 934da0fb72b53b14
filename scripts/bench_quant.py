"""Quantized decode benchmark: Q2_K / Q3_K / FP8 variants of the bench model
on the attached chip (the BASELINE headline is DeepSeek-V3 Q2_K decode).

Synthesizes random packed quantized weights on device (values don't affect
throughput; encode/decode correctness is covered by the golden tests) and
measures the fused-kernel decode loop. Usage:

    python scripts/bench_quant.py [q2_k|q3_k|f8e5m2|q2_k_turbo|q3_k_turbo|
                                   q2_k_nibble|q3_k_nibble] [layers]

The *_turbo modes run the pre-scaled int8-plane runtime layout
(quant.qtensor.Q2KTurboTensor): ~3x fewer dequant VPU ops per weight.
The *_nibble modes run the 4-bit nibble planes (quant.qtensor.
KNibbleTensor): fastest K-quant decode at 5-6 bits/weight — fits
full-depth models the turbo layout cannot.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_config
from deepseek_tpu.models import init_cache
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.models.loader import params_active_bytes


from deepseek_tpu.models.testing import random_quantized_params as \
    quantized_params  # packed-plane synth now lives in models.testing


def main():
    # usage: bench_quant.py [quant] [layers] [--scan|--no-scan]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    unknown = flags - {"--scan", "--no-scan"}
    if unknown:
        sys.exit(f"unknown flags: {sorted(unknown)} "
                 "(supported: --scan, --no-scan)")
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    quant = pos[0] if pos else "q2_k"
    layers = int(pos[1]) if len(pos) > 1 else 8
    backend = jax.default_backend()
    cfg = bench_config(layers)
    # moe_intermediate 1408 is not 256-divisible; use 1536 for K-quant rows
    import dataclasses
    if quant.startswith(("q2_k", "q3_k")):
        cfg = dataclasses.replace(cfg, moe_intermediate_size=1536)

    t0 = time.perf_counter()
    params = quantized_params(cfg, quant)
    from deepseek_tpu.models.loader import fuse_projections, stack_layer_groups
    params = fuse_projections(params, cfg, consume=True)
    # --scan/--no-scan force either way for every quant; the default
    # mirrors Engine scan_layers="auto": scan+nibble at depth OOMs on
    # chip at the first dispatch (PERFORMANCE.md) and unrolled nibble is
    # the fastest deep config anyway, so nibble defaults to unrolled.
    if "--scan" in flags:
        scan_ok = True
    elif "--no-scan" in flags:
        scan_ok = False
    else:
        scan_ok = not quant.endswith("_nibble")
    if layers >= 16 and scan_ok:
        # deep stacks: scan homogeneous layers (program-size cliff past
        # ~24 unrolled layers — PERFORMANCE.md); consume=True bounds the
        # stacking transient to ~the largest field's stacked buffer
        params = stack_layer_groups(params, cfg, consume=True)
        # pre-relayout to the loop's compiled formats so decode steps
        # bind copy-free (align_param_layouts docstring; does NOT fix
        # the scan+nibble full-depth OOM)
        from deepseek_tpu.models.loader import align_param_layouts
        params = align_param_layouts(params, cfg, n_steps=32)
    jax.block_until_ready(jax.tree.leaves(params))
    print(f"quantize+load: {time.perf_counter()-t0:.1f}s")

    cache = init_cache(cfg, batch=1)
    block = 32 if backend != "cpu" else 4
    loop = make_decode_loop(cfg, block)
    key = jax.random.PRNGKey(0)
    args = (jnp.float32(0.0), jnp.float32(1.0))

    tok = jnp.zeros((1, 1), jnp.int32)
    for wu in range(2):  # 2x: first post-compile dispatch is ~3x slow
        toks, _, cache = loop(params, cache, tok, jnp.int32(wu * block),
                              key, *args)
        tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])

    n_blocks = 8 if backend != "cpu" else 1
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
    print(f"{quant} L{layers} decode: {tok_s:.1f} tok/s  "
          f"({gb:.2f} GB active/token -> {gb*tok_s:.0f} GB/s)")


if __name__ == "__main__":
    main()
