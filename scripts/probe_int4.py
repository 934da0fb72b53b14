"""Feasibility probe: int4 quant planes in Pallas on this chip.

Question: can Mosaic load a jnp.int4 array and convert it in-kernel at
the same element rate as the int8 turbo planes? If yes, the K-quant
"turbo" runtime layouts can halve their dominant plane bytes
(Q3_K: p in [-4,3] fits int4 exactly; Q2_K: raw q in [0,3] fits with the
per-16 scale moved to a bf16 plane) — turning the 9 bit/w turbo trade
into ~5-6 bit/w, which fits V2-Lite full depth (27L) in one v5e HBM.

Measures (two-length slope, see scripts/bench_ops.py):
  - int8 plane matvec (the shipped turbo structure) — baseline
  - int4 plane matvec (same structure, half the plane bytes)
  - int4 with per-16 bf16 scale expansion (full Q3-turbo-nibble shape)
Correctness asserted against an XLA dequant reference first.
"""

import sys
import time
import functools

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 64
D, N = 65536, 2048     # weights far exceed VMEM; matvec row tiles stream


def bench(name, op, x0, nbytes, nelem, consts=()):
    def make(length):
        @jax.jit
        def run(x, *consts):
            def body(x, _):
                o = op(x, *consts)
                return x + 1e-20 * jnp.sum(o).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, None, length=length)
            return x
        return run

    times = {}
    for length in (ITERS, 4 * ITERS):
        run = make(length)
        out = run(x0, *consts)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        out = run(x0, *consts)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        times[length] = time.perf_counter() - t0
    t = max((times[4 * ITERS] - times[ITERS]) / (3 * ITERS), 1e-9)
    print(f"{name:44s} {t * 1e6:9.1f} us  {nbytes / t / 1e9:7.1f} GB/s  "
          f"{nelem / t / 1e9:7.1f} Gelem/s", flush=True)
    return t


def _plain_body(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _rep16(a):
    # tile concatenation like the shipped kernels (permuted column order:
    # position c carries group c mod n/16) — Mosaic has no element-repeat
    return pltpu.repeat(a.astype(jnp.float32), 16, axis=a.ndim - 1)


def _scaled_body(x_ref, w_ref, a_ref, o_ref):
    w = _rep16(a_ref[...].astype(jnp.float32)) * w_ref[...].astype(jnp.float32)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def plane_mm(w, x, td=1024, scales=None, interpret=False):
    D, N = w.shape
    in_specs = [
        pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((td, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w]
    body = _plain_body
    if scales is not None:
        in_specs.append(pl.BlockSpec((td, N // 16), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales)
        body = _scaled_body
    return pl.pallas_call(
        body,
        grid=(D // td,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, td), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        interpret=interpret,
    )(*args)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    q = rng.integers(-4, 4, size=(D, N), dtype=np.int8)
    x = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((D, N // 16)) * 0.1, jnp.bfloat16)

    w8 = jnp.asarray(q, jnp.int8)
    try:
        # the axon host->device path rejects S4 uploads; convert on device
        w4 = jax.jit(lambda w: w.astype(jnp.int4))(w8)
        jax.block_until_ready(w4)
        print("int4 array ok:", w4.dtype, w4.nbytes, "bytes "
              f"({w4.nbytes / (D * N):.2f} B/elem)")
    except Exception as e:
        print("int4 array FAILED:", type(e).__name__, str(e)[:300])
        return

    # The axon dispatch path rejects S4 jit ARGUMENTS (recursive-jit error),
    # so every int4 use converts int8->int4 INSIDE the jitted graph; XLA
    # materializes the S4 buffer in HBM once (loop-invariant, hoisted out
    # of the timing scan) and the Pallas kernel reads S4 from HBM.
    # correctness first (full-precision reference via XLA)
    ref = jnp.einsum("bn,dn->bd", x, w8.astype(jnp.float32))
    try:
        got4 = jax.jit(
            lambda w, x: plane_mm(w.astype(jnp.int4), x))(w8, x)
        err = float(jnp.max(jnp.abs(got4 - ref)) / jnp.max(jnp.abs(ref)))
        print(f"int4 plain kernel: max rel err {err:.2e}")
        # DEFAULT MXU precision truncates operands to bf16 (by design,
        # ops/pallas/qmm.py docstring) — 1e-3-class err is expected
        assert err < 5e-3
    except Exception as e:
        print("int4 plain kernel FAILED:", type(e).__name__, str(e)[:500])
        return

    refs = jnp.einsum("bn,dn->bd", x,
                      jnp.tile(a.astype(jnp.float32), (1, 16))
                      * w8.astype(jnp.float32))
    try:
        got4s = jax.jit(
            lambda w, x, a: plane_mm(w.astype(jnp.int4), x, scales=a))(
                w8, x, a)
        err = float(jnp.max(jnp.abs(got4s - refs)) / jnp.max(jnp.abs(refs)))
        print(f"int4 scaled kernel: max rel err {err:.2e}")
    except Exception as e:
        print("int4 scaled kernel FAILED:", type(e).__name__, str(e)[:500])

    nelem = D * N
    n4bytes = D * N // 2   # true HBM bytes of a packed S4 plane

    def as4(w):
        return w.astype(jnp.int4)

    bench("int8 plane matvec (turbo baseline)",
          lambda x, w: plane_mm(w, x), x, w8.nbytes, nelem, consts=(w8,))
    bench("int4 plane matvec",
          lambda x, w: plane_mm(as4(w), x), x, n4bytes, nelem, consts=(w8,))
    bench("int8 + per-16 bf16 scales (q3 turbo shape)",
          lambda x, w, a: plane_mm(w, x, scales=a), x,
          w8.nbytes + a.nbytes, nelem, consts=(w8, a))
    bench("int4 + per-16 bf16 scales (q3 nibble shape)",
          lambda x, w, a: plane_mm(as4(w), x, scales=a), x,
          n4bytes + a.nbytes, nelem, consts=(w8, a))


if __name__ == "__main__":
    main()
