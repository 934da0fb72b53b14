"""Probe 3: make the scaled nibble kernel fast.

probe_int4b: nibble unpack alone = 1164 Gelem/s; + per-16 scales = 450.
The scale multiply should cost ~30 us (one f32 mult/elem), not 180.
Variants:
  A. concat + f32 scale multiply (the slow baseline from probe 2)
  B. NO concat: two half-width dots (w_lo, w_hi), f32 multiply
  C. two half-width dots, bf16 multiply (dot truncates to bf16 anyway)
  D. two half-width dots, scale multiply on int side? (int*int8 widen)
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
D, N = 65536, 2048
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
    nelem = D * N
    print(f"{name:52s} {t * 1e6:9.1f} us  {nelem / t / 1e9:7.1f} Gelem/s",
          flush=True)
    return t


def _body_a(x_ref, w_ref, a_ref, o_ref):
    wu = w_ref[...].astype(jnp.int32)
    u = jnp.concatenate([wu & 0xF, wu >> 4], axis=-1).astype(jnp.float32)
    w = pltpu.repeat(a_ref[...].astype(jnp.float32), 16, axis=1) * u
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _body_b(x_ref, w_ref, a_ref, o_ref):
    wu = w_ref[...].astype(jnp.int32)
    s = pltpu.repeat(a_ref[...].astype(jnp.float32), 8, axis=1)  # (td, N/2)
    x = x_ref[...]
    n2 = wu.shape[-1]
    lo = s * (wu & 0xF).astype(jnp.float32)
    hi = s * (wu >> 4).astype(jnp.float32)
    o_ref[...] = (
        jax.lax.dot_general(x[:, :n2], lo, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x[:, n2:], hi, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))


def _body_c(x_ref, w_ref, a_ref, o_ref):
    wu = w_ref[...].astype(jnp.int32)
    s = pltpu.repeat(a_ref[...], 8, axis=1)                      # bf16
    x = x_ref[...]
    n2 = wu.shape[-1]
    lo = s * (wu & 0xF).astype(jnp.bfloat16)
    hi = s * (wu >> 4).astype(jnp.bfloat16)
    o_ref[...] = (
        jax.lax.dot_general(x[:, :n2], lo, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x[:, n2:], hi, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))


def _body_n(x_ref, w_ref, a_ref, o_ref):
    # unscaled two-dot control (scale cost = body_b minus this)
    wu = w_ref[...].astype(jnp.int32)
    x = x_ref[...]
    n2 = wu.shape[-1]
    o_ref[...] = (
        jax.lax.dot_general(x[:, :n2], (wu & 0xF).astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x[:, n2:], (wu >> 4).astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))


def mm(w, x, a, body, td=1024):
    return pl.pallas_call(
        body,
        grid=(D // td,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((td, N // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, N16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, td), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
    )(x, w, a)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    u = rng.integers(0, 8, size=(D, N), dtype=np.uint8)
    x = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((D, N16)) * 0.1, jnp.bfloat16)
    packed = jnp.asarray(u[:, :N // 2] | (u[:, N // 2:] << 4), jnp.uint8)

    # reference for B/C (scale layout: block j of width N/2 uses rep8;
    # within the halves, group = col mod N16)
    s_half = np.tile(np.asarray(a, np.float32), (1, 8))
    wf = np.concatenate([s_half * u[:, :N // 2], s_half * u[:, N // 2:]],
                        axis=1)
    ref = jnp.einsum("bn,dn->bd", x, jnp.asarray(wf))

    for name, body in (("B two-dot f32", _body_b), ("C two-dot bf16", _body_c)):
        out = mm(packed, x, a, body)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        print(f"{name}: rel err {err:.2e}")

    timeit("A concat + f32 scales (probe2 baseline)",
           lambda x, w, a: mm(w, x, a, _body_a), x, packed, a)
    timeit("B two half dots + f32 scales",
           lambda x, w, a: mm(w, x, a, _body_b), x, packed, a)
    timeit("C two half dots + bf16 scales",
           lambda x, w, a: mm(w, x, a, _body_c), x, packed, a)
    timeit("N two half dots, no scales (control)",
           lambda x, w, a: mm(w, x, a, _body_n), x, packed, a)


if __name__ == "__main__":
    main()
