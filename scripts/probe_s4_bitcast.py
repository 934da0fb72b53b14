"""Probe 4: S4 nibble planes via IN-KERNEL pltpu.bitcast of uint8 blocks.

probe_int4 measured native-S4 kernels at 1230-1440 Gelem/s (vs ~1000 for
the shipped uint8 mask+shift+concat unpack) but S4 jit ARGUMENTS crash
the axon dispatch path (re-verified: RecursionError), and
lax.bitcast_convert_type to int4 hangs axon at the jit level AND is
unsupported inside Mosaic ("Changing bitwidths not supported").

What DOES lower: ``pltpu.bitcast(u8_block, int4)`` inside the kernel —
shape (M, N) u8 -> (2M, N) s4 where output row 2m holds row m's LOW
nibbles and row 2m+1 the HIGH nibbles (verified against the fallback
lowering in jax pallas/mosaic/primitives.py). So the plane layout packs
ROW PAIRS per byte, column-preserving: plane byte (r, c) =
(W[2r, c] & 0xF) | (W[2r+1, c] << 4), stored values (u - 8) & 0xF so the
s4 view reads exactly u - 8 (two's complement).

This probe checks, at the V3 dense w13 matvec shape (36864 x 7168):
  1. numerics of the bitcast row-pair kernel vs a numpy reference
  2. slope speed vs the shipped concat-unpack body
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 64
D, N = 36864, 7168            # V3 dense-layer w13 shape (biggest matvec)
N16 = N // 16


def timeit(name, fn, *args):
    def make(length):
        @jax.jit
        def run(x, *rest):
            def body(x, _):
                o = fn(x, *rest)
                return x + 1e-20 * jnp.sum(o).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, None, length=length)
            return x
        return run
    times = {}
    for length in (ITERS, 4 * ITERS):
        run = make(length)
        out = run(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        times[length] = time.perf_counter() - t0
    t = max((times[4 * ITERS] - times[ITERS]) / (3 * ITERS), 1e-9)
    print(f"{name:44s} {t * 1e6:9.1f} us  {D * N / t / 1e9:7.1f} Gelem/s",
          flush=True)
    return t


TD = 512


def _u8_body(x_ref, p_ref, a_ref, o_ref):
    # shipped concat-unpack structure (deinterleaved halves layout)
    pu = p_ref[...].astype(jnp.int32)
    u = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1).astype(jnp.float32)
    w = pltpu.repeat(a_ref[...].astype(jnp.float32), 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _s4_body(x_ref, p_ref, a_ref, o_ref):
    u = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.float32)  # (TD, n)
    w = pltpu.repeat(a_ref[...].astype(jnp.float32), 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def mm_u8(x, p, a):
    return pl.pallas_call(
        _u8_body, grid=(D // TD,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0)),
            pl.BlockSpec((TD, N // 2), lambda i: (i, 0)),
            pl.BlockSpec((TD, N16), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, TD), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
    )(x, p, a)


def mm_s4(x, p, a):
    return pl.pallas_call(
        _s4_body, grid=(D // TD,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0)),
            pl.BlockSpec((TD // 2, N), lambda i: (i, 0)),
            pl.BlockSpec((TD, N16), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, TD), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
    )(x, p, a)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    u = rng.integers(0, 8, size=(D, N), dtype=np.uint8)   # q3k-nibble range
    x = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((D, N16)) * 0.1, jnp.bfloat16)

    # u8 layout: deinterleaved column halves (shipped)
    p_half = jnp.asarray(u[:, :N // 2] | (u[:, N // 2:] << 4), jnp.uint8)
    # s4 layout: ROW pairs of (u - 8) & 0xF — (D/2, N) bytes
    s = ((u.astype(np.int32) - 8) & 0xF).astype(np.uint8)
    p_rows = jnp.asarray(s[0::2, :] | (s[1::2, :] << 4), jnp.uint8)

    # numerics: both kernels use tile-repeat scale order (col c -> a[:, c % N16])
    scale_cols = np.asarray(a, np.float32)[:, np.arange(N) % N16]
    ref = np.asarray(x) @ (scale_cols * (u.astype(np.float32) - 8.0)).T
    out_s4 = np.asarray(mm_s4(x, p_rows, a))
    err = float(np.max(np.abs(out_s4 - ref)) / np.max(np.abs(ref)))
    print(f"s4 row-pair bitcast kernel: max rel err {err:.2e}")

    timeit("u8 concat-unpack (shipped)", mm_u8, x, p_half, a)
    timeit("s4 in-kernel pltpu.bitcast", mm_s4, x, p_rows, a)


if __name__ == "__main__":
    main()
