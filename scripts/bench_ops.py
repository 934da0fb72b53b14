"""Per-op HBM bandwidth microbench on the real chip.

Times each decode-step constituent in isolation and reports achieved GB/s
vs the weight bytes it must stream, to locate where the end-to-end decode
step loses roofline bandwidth.

Under remote (axon) execution per-dispatch latency is large, so each op is
iterated inside ONE jitted lax.scan with a token data dependence between
iterations (prevents XLA from hoisting the loop-invariant matmul).
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

ITERS = 64


def gbps(nbytes, secs):
    return nbytes / secs / 1e9


def bench(name, op, x0, nbytes, iters=ITERS, consts=()):
    """op: (x, *consts) -> out. Chains x_{i+1} = x_i + eps*sum(out_i) inside
    lax.scan. consts are passed as jit args (NOT closures — closed-over
    arrays become HLO constants, which the remote-compile path re-uploads).

    Per-iter cost comes from the TWO-LENGTH SLOPE (t(4k) - t(k)) / 3k: a
    single absolute timing here is dominated by the ~25-50 ms fixed
    dispatch+sync round trip of the remote tunnel (measured: a 55 us
    matvec reads as ~800 us at 64 iters)."""

    def make(length):
        @jax.jit
        def run(x, *consts):
            def body(x, _):
                o = op(x, *consts)
                dep = (jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
                return x + 1e-20 * dep.astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, None, length=length)
            return x
        return run

    times = {}
    for length in (iters, 4 * iters):
        run = make(length)
        out = run(x0, *consts)          # compile + slow-first-dispatch
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        out = run(x0, *consts)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]  # host fetch = only reliable sync
        times[length] = time.perf_counter() - t0
    t = max((times[4 * iters] - times[iters]) / (3 * iters), 1e-9)
    print(f"{name:48s} {t * 1e6:9.1f} us   {gbps(nbytes, t):8.1f} GB/s",
          flush=True)
    return t


def main():
    key = jax.random.PRNGKey(0)

    # 1. plain bf16 matvec decode shapes
    for (d, n) in [(102400, 2048), (10944, 2048), (2048, 10944), (2048, 2048)]:
        w = jax.random.normal(key, (d, n), jnp.bfloat16)
        x = jax.random.normal(key, (1, n), jnp.float32)
        bench(f"bf16 matvec {d}x{n} (f32 x)",
              lambda x, w: jnp.einsum("bn,dn->bd", x, w.astype(jnp.float32),
                                      preferred_element_type=jnp.float32),
              x, w.nbytes, consts=(w,))
        bench(f"bf16 matvec {d}x{n} (bf16 x)",
              lambda x, w: jnp.einsum("bn,dn->bd", x.astype(jnp.bfloat16), w,
                                      preferred_element_type=jnp.float32),
              x, w.nbytes, consts=(w,))

    d, n = 10944, 2048
    w = jax.random.normal(key, (d, n), jnp.bfloat16)
    x8 = jax.random.normal(key, (8, n), jnp.float32)
    bench(f"bf16 matvec B=8 {d}x{n}",
          lambda x, w: jnp.einsum("bn,dn->bd", x, w.astype(jnp.float32),
                                  preferred_element_type=jnp.float32),
          x8, w.nbytes, consts=(w,))

    # 2. qmm_experts PlainTensor at MoE decode shape
    from deepseek_tpu.quant.qtensor import PlainTensor
    from deepseek_tpu.ops.pallas.qmm import qmm_experts
    E, m, dim, k = 64, 1408, 2048, 6
    wq = PlainTensor(data=jax.random.normal(key, (E, m, dim), jnp.bfloat16))
    idx = jnp.arange(k, dtype=jnp.int32)[None]
    xk = jax.random.normal(key, (1, k, dim), jnp.float32)
    active = k * m * dim * 2
    bench(f"qmm_experts bf16 E{E} k{k} {m}x{dim}",
          lambda x, wq: qmm_experts(wq, idx, x), xk, active, consts=(wq,))

    wq2 = PlainTensor(data=jax.random.normal(key, (E, dim, m), jnp.bfloat16))
    xk2 = jax.random.normal(key, (1, k, m), jnp.float32)
    bench(f"qmm_experts bf16 E{E} k{k} {dim}x{m}",
          lambda x, wq2: qmm_experts(wq2, idx, x), xk2, active, consts=(wq2,))

    # 3. MLA decode attention: jnp vs pallas at bench shapes
    from deepseek_tpu.ops.attention import decode_attn_mla
    from deepseek_tpu.ops.pallas.attention import mla_decode_attn
    B, H, R, P, S = 1, 16, 512, 64, 4096
    q_c = jax.random.normal(key, (B, H, R), jnp.float32)
    q_r = jax.random.normal(key, (B, H, P), jnp.float32)
    ckv = jax.random.normal(key, (B, S, R), jnp.bfloat16)
    kr = jax.random.normal(key, (B, S, P), jnp.bfloat16)
    kl = jnp.full((B,), S, jnp.int32)
    kv_bytes = ckv.nbytes + kr.nbytes
    bench(f"decode_attn_mla jnp S={S}",
          lambda q, ckv, kr: decode_attn_mla(q, q_r, ckv, kr, kl, 192),
          q_c, kv_bytes, consts=(ckv, kr))
    bench(f"mla_decode_attn pallas S={S}",
          lambda q, ckv, kr: mla_decode_attn(q, q_r, ckv, kr, kl, 192 ** -0.5),
          q_c, kv_bytes, consts=(ckv, kr))

    # 4. raw HBM read roofline
    big = jax.random.normal(key, (256, 1024, 1024), jnp.bfloat16)  # 512MB
    bench("HBM read roofline (512MB sum)",
          lambda s, big: jnp.sum(big * s, dtype=jnp.float32)[None],
          jnp.ones((1,), jnp.bfloat16), big.nbytes, iters=8, consts=(big,))


if __name__ == "__main__":
    main()
