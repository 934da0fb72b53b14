"""Probe 5: cheaper nibble unpack pipelines at the V3 w13 matvec shape.

bench_moe_micro/bench_attn_micro showed every nibble decode kernel sits
at the ELEMENT-rate bound (~1000 Gelem/s: w13 692 GB/s, w2 570, wcr 589),
not the 820 GB/s byte roofline. probe_int4 showed native S4 reaches
1230-1440 Gelem/s, but S4 jit args crash axon and the in-kernel
pltpu.bitcast route stalls 3-10 min once per process (first int4 program).

Variants (all same math: y = x . (rep16(a) * (u - off))^T):
  A. shipped: astype(i32) -> mask/shift -> concat -> f32 convert, f32 mul
  B. 8-bit-domain mask/shift (4x denser vregs), then convert
  C. bf16 convert + bf16 scale multiply (2x denser than f32)
  D. B + C combined
  E. in-kernel pltpu.bitcast s4 (pays the one-time process stall)
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
D, N = 36864, 7168
N16 = N // 16
TD = 512


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


def _body_a(x_ref, p_ref, a_ref, o_ref):
    pu = p_ref[...].astype(jnp.int32)
    u = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1).astype(jnp.float32)
    w = pltpu.repeat(a_ref[...].astype(jnp.float32), 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _body_b(x_ref, p_ref, a_ref, o_ref):
    pu = p_ref[...]                                       # u8
    u8 = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1)    # u8 ops
    u = u8.astype(jnp.float32)
    w = pltpu.repeat(a_ref[...].astype(jnp.float32), 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _body_c(x_ref, p_ref, a_ref, o_ref):
    pu = p_ref[...].astype(jnp.int32)
    u = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1).astype(jnp.bfloat16)
    w = pltpu.repeat(a_ref[...], 16, axis=1) * u          # bf16 mul
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _body_d(x_ref, p_ref, a_ref, o_ref):
    pu = p_ref[...]
    u8 = jnp.concatenate([pu & 0xF, pu >> 4], axis=-1)
    u = u8.astype(jnp.bfloat16)
    w = pltpu.repeat(a_ref[...], 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _body_e(x_ref, p_ref, a_ref, o_ref):
    u = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.float32)
    w = pltpu.repeat(a_ref[...].astype(jnp.float32), 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def mm(body, x, p, a, p_rows=False):
    return pl.pallas_call(
        body, grid=(D // TD,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0)),
            pl.BlockSpec((TD // 2, N) if p_rows else (TD, N // 2),
                         lambda i: (i, 0)),
            pl.BlockSpec((TD, N16), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, TD), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
    )(x, p, a)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    u = rng.integers(0, 8, size=(D, N), dtype=np.uint8)
    x = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((D, N16)) * 0.1, jnp.bfloat16)
    p_half = jnp.asarray(u[:, :N // 2] | (u[:, N // 2:] << 4), jnp.uint8)
    s = ((u.astype(np.int32) - 8) & 0xF).astype(np.uint8)
    p_rows = jnp.asarray(s[0::2, :] | (s[1::2, :] << 4), jnp.uint8)

    # numerics vs A (same plane/layout for A-D)
    ref = np.asarray(mm(_body_a, x, p_half, a))
    for name, body in (("B", _body_b), ("C", _body_c), ("D", _body_d)):
        out = np.asarray(mm(body, x, p_half, a))
        err = float(np.max(np.abs(out - ref)) / np.max(np.abs(ref)))
        print(f"variant {name}: rel err vs A {err:.2e}")

    timeit("A shipped i32 mask/shift + f32", lambda x, p, a: mm(_body_a, x, p, a), x, p_half, a)
    timeit("B u8-domain mask/shift + f32", lambda x, p, a: mm(_body_b, x, p, a), x, p_half, a)
    timeit("C i32 mask/shift + bf16 mul", lambda x, p, a: mm(_body_c, x, p, a), x, p_half, a)
    timeit("D u8-domain + bf16 mul", lambda x, p, a: mm(_body_d, x, p, a), x, p_half, a)
    if "--s4" in sys.argv:
        timeit("E pltpu.bitcast s4 (one-time stall)",
               lambda x, p, a: mm(_body_e, x, p, a, p_rows=True), x, p_rows, a)


if __name__ == "__main__":
    main()
