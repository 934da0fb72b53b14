"""HBM read-bandwidth microbenchmark (parity with the reference's
mem_bench/mem_bench2, test.cpp:218-310 — decode is bandwidth-bound, so this
is the roofline the decode step is measured against).

Usage: python scripts/membench.py [GB_total]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_read(size_mb: int, iters: int = 16) -> float:
    n = size_mb * 1024 * 1024 // 2
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def f(x, acc):
        return acc + x.sum().astype(jnp.float32)

    acc = jnp.float32(0)
    acc = f(x, acc)
    _ = float(np.asarray(acc))  # sync (block_until_ready can lie over relays)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = f(x, acc)
    _ = float(np.asarray(acc))
    dt = time.perf_counter() - t0
    return size_mb / 1024 * iters / dt


def main():
    total_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    for mb in (256, 1024, 4096):
        if mb / 1024 > total_gb:
            break
        gbps = bench_read(mb)
        print(f"read {mb:5d} MB blocks: {gbps:8.1f} GB/s")


if __name__ == "__main__":
    main()
