"""Random-parameter model builders (benchmarks, compile checks, dry runs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepseek_tpu.config import (
    ActivationType, ModelConfig, QuantKind, ScoringFunc, TopKMethod,
)
from deepseek_tpu.models.params import LayerParams, ModelParams
from deepseek_tpu.quant.qtensor import PlainTensor


def random_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16,
                  scale: float = 0.02) -> ModelParams:
    """Random weights with the exact pytree structure the loader produces."""
    key = jax.random.PRNGKey(seed)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(*shape):
        return PlainTensor(data=(jax.random.normal(nxt(), shape, jnp.float32)
                                 * scale).astype(dtype))

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    c = cfg
    H, hd, nope, P, Dv, R = (c.n_heads, c.head_dim, c.qk_nope_head_dim,
                             c.qk_rope_head_dim, c.v_head_dim, c.kv_lora_rank)

    def mla_weights():
        """Hybrid MLA weights with a CONSISTENT factorization: random
        wq_b/wkv_b, and wc/wq_rope_b/wv_b DERIVED from them exactly like
        the converter's offline absorption (convert.py c_proj math) — the
        decompressed prefill path and the absorbed decode path must compute
        the same function, or prefill==decode parity (and speculative
        acceptance) silently breaks on random checkpoints."""
        wq_b = w(H * hd, c.q_lora_rank)
        wkv_b = w(H * (nope + Dv), R)
        qb = wq_b.data.astype(jnp.float32).reshape(H, hd, c.q_lora_rank)
        kvb = wkv_b.data.astype(jnp.float32).reshape(H, nope + Dv, R)
        q_nope_b, q_rope_b = qb[:, :nope], qb[:, nope:]
        k_nope_b, v_b = kvb[:, :nope], kvb[:, nope:]
        c_proj = jnp.einsum("hnr,hnq->hrq", k_nope_b, q_nope_b)
        mk = lambda a: PlainTensor(data=a.astype(dtype))
        return (wq_b, wkv_b,
                mk(c_proj.reshape(H * R, c.q_lora_rank)),
                mk(q_rope_b.reshape(H * P, c.q_lora_rank)),
                mk(v_b.reshape(H * Dv, R)))

    layers = []
    for l in range(c.n_layers):
        moe = c.is_moe_layer(l)
        E, m = c.n_routed_experts, c.moe_intermediate_size
        if c.use_mla:
            wq_b, wkv_b, wc, wq_rope_b, wv_b = mla_weights()
        else:
            wq_b = w(H * hd, c.q_lora_rank) if c.q_lora_rank > 0 else None
            wkv_b = w(H * (nope + Dv), R)
            wc = wq_rope_b = wv_b = None
        layers.append(LayerParams(
            attn_norm=ones(c.dim), ffn_norm=ones(c.dim),
            kv_a_norm=ones(R),
            q_a_norm=ones(c.q_lora_rank) if c.q_lora_rank > 0 else None,
            wkv_a=w(R + P, c.dim),
            wo=w(c.dim, H * Dv),
            wq=None if c.q_lora_rank > 0 else (None if c.use_mla else w(H * hd, c.dim)),
            wq_a=w(c.q_lora_rank, c.dim) if c.q_lora_rank > 0 else None,
            # MLA checkpoints keep the decompressed projections too
            # (hybrid prefill path, see convert.py / models/deepseek.py)
            wq_b=wq_b,
            wkv_b=wkv_b,
            wc=wc,
            wq_rope_b=wq_rope_b,
            wv_b=wv_b,
            w1=w(E, m, c.dim) if moe else w(c.hidden_dim, c.dim),
            w2=w(E, c.dim, m) if moe else w(c.dim, c.hidden_dim),
            w3=w(E, m, c.dim) if moe else w(c.hidden_dim, c.dim),
            shared_w1=w(c.n_shared_experts * m, c.dim) if (moe and c.n_shared_experts) else None,
            shared_w2=w(c.dim, c.n_shared_experts * m) if (moe and c.n_shared_experts) else None,
            shared_w3=w(c.n_shared_experts * m, c.dim) if (moe and c.n_shared_experts) else None,
            moegate=(jax.random.normal(nxt(), (E, c.dim), jnp.float32) * scale) if moe else None,
            moegate_bias=(jnp.zeros((E,), jnp.float32)
                          if (moe and c.has_moegate_bias) else None),
        ))
    return ModelParams(
        embed=w(c.vocab_size, c.dim),
        layers=layers,
        final_norm=ones(c.dim),
        lm_head=w(c.vocab_size, c.dim),
    )


def _random_qtensor(key_gen, shape, quant: str):
    """Random *packed* quantized tensor synthesized directly on device.

    Throughput doesn't depend on weight values, and generating the packed
    planes on-chip avoids both the CPU K-quant encode (~0.3s per expert
    matrix) and gigabytes of host->device transfers — the real loader path
    is exercised by tests/test_kquant.py golden tests instead.
    """
    from deepseek_tpu.quant.qtensor import (
        Fp8Tensor, Q2KTensor, Q3KTensor, q2k_to_nibble, q2k_to_turbo,
        q3k_to_nibble, q3k_to_turbo,
    )
    rows, cols = shape[-2], shape[-1]
    lead = shape[:-2]
    turbo = quant.endswith("_turbo")
    nibble = quant.endswith("_nibble")
    quant = quant[:-7] if nibble else quant[:-6] if turbo else quant
    if quant in ("q2_k", "q3_k") and cols % 256 == 0:
        qs = jax.random.randint(key_gen(), (*lead, rows, cols // 4), 0, 256,
                                jnp.int32).astype(jnp.uint8)
        d = jax.random.uniform(key_gen(), (*lead, rows, cols // 256),
                               jnp.float32, 0.001, 0.01)
        if quant == "q2_k":
            sm = jax.random.randint(key_gen(), (*lead, rows, cols // 16), 0,
                                    256, jnp.int32).astype(jnp.uint8)
            dmin = jax.random.uniform(key_gen(), d.shape, jnp.float32,
                                      0.001, 0.01)
            qt = Q2KTensor(qs=qs, sm=sm, d=d, dmin=dmin)
            return (q2k_to_turbo(qt) if turbo
                    else q2k_to_nibble(qt) if nibble else qt)
        hm = jax.random.randint(key_gen(), (*lead, rows, cols // 8), 0, 256,
                                jnp.int32).astype(jnp.uint8)
        sc = jax.random.randint(key_gen(), (*lead, rows, cols // 16), -32, 32,
                                jnp.int32).astype(jnp.int8)
        qt = Q3KTensor(qs=qs, hm=hm, sc=sc, d=d)
        return (q3k_to_turbo(qt) if turbo
                else q3k_to_nibble(qt) if nibble else qt)
    if quant == "f8e5m2" and rows % 128 == 0 and cols % 128 == 0:
        data = (jax.random.normal(key_gen(), (*lead, rows, cols),
                                  jnp.bfloat16)).astype(jnp.float8_e5m2)
        scale = jax.random.uniform(
            key_gen(), (*lead, rows // 128, cols // 128), jnp.float32,
            0.005, 0.02)
        return Fp8Tensor(data=data, scale=scale, block_size=(128, 128))
    # fallback (odd dims): bf16
    return PlainTensor(
        data=jax.random.normal(key_gen(), shape, jnp.bfloat16) * 0.02)


def deepseek_v3_proportions(n_layers: int = 61, **overrides) -> ModelConfig:
    """DeepSeek-V3's EXACT architecture hyperparameters (config.json of
    deepseek-ai/DeepSeek-V3; the reference's README headline model —
    /root/reference/README.md:24-26): dim 7168, 128 heads, MLA r=512 with
    q_lora 1536, 256 routed experts (k=8, sigmoid + noaux_tc group
    routing over 8 groups, e-score correction bias), 1 shared expert,
    m=2048, first 3 layers dense, vocab 129280.

    ``n_layers`` defaults to the full 61; benches slice it down to what a
    single chip's HBM holds (BENCH `v3slice`) — every other dimension
    stays exact so the E=256 dispatch, n_group=8 gating and dim-7168
    kernel shapes are the real thing. The window stays at the YaRN
    original max position (4096), matching the reference's ring-buffer
    semantics (infer.cpp:1271-1277).
    """
    base = dict(
        dim=7168, hidden_dim=18432, n_layers=n_layers, n_heads=128,
        vocab_size=129280, max_seq_len=4096, rope_theta=10000.0,
        norm_eps=1e-6, act=ActivationType.SILU, first_k_dense_replace=3,
        n_shared_experts=1, n_routed_experts=256, n_active_routed=8,
        moe_intermediate_size=2048, routed_scaling_factor=2.5, n_group=8,
        norm_topk_prob=True, scoring_func=ScoringFunc.SIGMOID,
        topk_group=4, topk_method=TopKMethod.NOAUX_TC, has_moegate_bias=True,
        use_mla=True, kv_lora_rank=512, q_lora_rank=1536,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        weight_quant=QuantKind.F16,
        rs_original_max_position_embeddings=4096,
        arch="DeepseekV3ForCausalLM",
        compute_dtype="bfloat16", kv_cache_dtype="bfloat16",
    )
    base.update(overrides)
    return ModelConfig(**base)


import functools


@functools.partial(jax.jit, static_argnames=("shape",))
def _rand_u8_2d(key, shape):
    """Random uint8 array via u32 threefry words, bitcast down in one jit
    (the eager bitcast would materialize a rank-raised intermediate whose
    4-wide minor dim pads badly on TPU)."""
    w = jax.random.bits(key, (*shape[:-1], shape[-1] // 4), jnp.uint32)
    return jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(shape)


def _direct_qtensor(key_gen, shape, quant: str):
    """Random quantized tensor synthesized DIRECTLY in its runtime layout.

    Unlike ``_random_qtensor`` (packed wire planes -> runtime conversion,
    which tests layout-conversion parity), this materializes only the
    final planes — no int32 randint or unpack transients. At DeepSeek-V3
    proportions one expert table is 11.3B weights: the conversion path's
    transients (~3x the packed bytes) would OOM a 16 GB chip, while the
    direct path's peak is the output itself. Throughput does not depend
    on weight values; wire-format numerics are covered by the golden
    kquant tests."""
    from deepseek_tpu.quant.qtensor import Fp8Tensor, KNibbleTensor

    def tile_lead(blk, shape):
        """Stacked experts reuse ONE random 2-D block across the lead axis
        (throughput doesn't depend on values and the kernels still fetch
        each expert's tiles from its own address): synth transient peak
        stays ~the output buffer itself instead of ~3x it — at V3 scale
        (an 11.3B-weight table) the difference is fitting in HBM."""
        if blk.shape == tuple(shape):
            return blk
        return jnp.broadcast_to(blk, shape) + jnp.zeros((), blk.dtype)

    def rand_u8(shape):
        # random.bits(dtype=uint8) generates one 32-bit threefry word PER
        # ELEMENT (4x the bytes — measured 28 GB for a 3.8 GB plane);
        # generate uint32 words and bitcast down inside ONE jit so the
        # rank-raised bitcast intermediate fuses away
        assert shape[-1] % 4 == 0
        return tile_lead(_rand_u8_2d(key_gen(), tuple(shape[-2:])), shape)

    def rand_f(shape, dtype, lo, hi):
        blk = jax.random.uniform(key_gen(), tuple(shape[-2:]), dtype, lo, hi)
        return tile_lead(blk, shape)

    rows, cols = shape[-2], shape[-1]
    lead = shape[:-2]
    if quant in ("q2_k", "q3_k") and cols % 256 == 0:
        # packed TPU plane layouts (quant.repack shapes) with random bits
        from deepseek_tpu.quant.qtensor import Q2KTensor, Q3KTensor
        qs = rand_u8((*lead, rows, cols // 4))
        d = rand_f((*lead, rows, cols // 256), jnp.float32, 0.001, 0.01)
        if quant == "q2_k":
            sm = rand_u8((*lead, rows, cols // 16))
            dmin = rand_f(d.shape, jnp.float32, 0.001, 0.01)
            return Q2KTensor(qs=qs, sm=sm, d=d, dmin=dmin)
        hm = rand_u8((*lead, rows, cols // 8))
        sc = tile_lead(jax.random.randint(
            key_gen(), (rows, cols // 16), -32, 32, jnp.int8),
            (*lead, rows, cols // 16))
        return Q3KTensor(qs=qs, hm=hm, sc=sc, d=d)
    if quant in ("q3_k_nibble", "q2_k_nibble") and cols % 256 == 0:
        p = rand_u8((*lead, rows, cols // 2))
        a = rand_f((*lead, rows, cols // 16), jnp.bfloat16, 0.001, 0.01)
        if quant == "q2_k_nibble":
            c = rand_f(a.shape, jnp.bfloat16, 0.0005, 0.005)
            return KNibbleTensor(p=p, a=a, c=c, off=0)
        return KNibbleTensor(p=p, a=a, c=None, off=4)
    if quant == "f8e5m2" and rows % 128 == 0 and cols % 128 == 0:
        # random bytes with the exponent's top bit cleared: no inf/NaN
        # patterns, |x| < 1 — and no bf16-normal transient at 2x the bytes
        blk = jax.lax.bitcast_convert_type(
            _rand_u8_2d(key_gen(), (rows, cols)) & jnp.uint8(0xBF),
            jnp.float8_e5m2)
        data = tile_lead(blk, (*lead, rows, cols))
        scale = rand_f((*lead, rows // 128, cols // 128), jnp.float32,
                       0.005, 0.02)
        return Fp8Tensor(data=data, scale=scale, block_size=(128, 128))
    return PlainTensor(
        data=jax.random.normal(key_gen(), shape, jnp.bfloat16) * 0.02)


def _mark_rowperm(qt):
    """Declare a synthesized expert [w1;w3] table row-permuted (the fused
    decode layout, loader._rowperm_layer; opt-in via DSEEK_FUSED_FFN like
    the production layout). The planes are random, so no actual
    permutation is needed — the flag selects the fused expert-chain
    kernel path and the permuted-h handling downstream."""
    import dataclasses
    import os

    from deepseek_tpu.quant.qtensor import KNibbleTensor
    if (os.environ.get("DSEEK_FUSED_FFN")
            and isinstance(qt, KNibbleTensor)
            and qt.p.shape[-2] % 32 == 0):
        return dataclasses.replace(qt, rowperm=2)
    return qt


def random_fused_params(cfg: ModelConfig, quant: str,
                        seed: int = 7) -> ModelParams:
    """Random model directly in the FUSED single-chip decode layout
    (loader.fuse_projections output: wkvq/wcr fused projections, shared
    experts folded into w13s/w2s) with planes synthesized in their final
    runtime format (``_direct_qtensor``).

    Built for V3-proportioned benches where the unfused-synth +
    fuse_projections route would spend 2-3x the model's bytes in
    concat/conversion transients. ``quant``: bf16 | f8e5m2 |
    q2_k_nibble | q3_k_nibble.
    """
    key = [jax.random.PRNGKey(seed)]

    def nxt():
        key[0], sub = jax.random.split(key[0])
        return sub

    def qt(*shape):
        q = "bf16?" if quant == "bf16" else quant  # bf16 hits the fallback
        return _direct_qtensor(nxt, shape, q)

    def w(*shape):
        return jax.random.normal(nxt(), shape, jnp.float32) * 0.02

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    c = cfg
    H, P, Dv, R = (c.n_heads, c.qk_rope_head_dim, c.v_head_dim,
                   c.kv_lora_rank)
    layers = []
    for l in range(c.n_layers):
        moe = c.is_moe_layer(l)
        E, m, ns = c.n_routed_experts, c.moe_intermediate_size, \
            c.n_shared_experts
        layers.append(LayerParams(
            attn_norm=ones(c.dim), ffn_norm=ones(c.dim), kv_a_norm=ones(R),
            q_a_norm=ones(c.q_lora_rank),
            wkv_a=None, wo=qt(c.dim, H * Dv),
            wq=None, wq_a=None, wq_b=None, wkv_b=None,
            wc=None, wq_rope_b=None,
            wv_b=qt(H * Dv, R),
            w1=None, w2=None if moe else qt(c.dim, c.hidden_dim), w3=None,
            shared_w1=None, shared_w2=None, shared_w3=None,
            moegate=w(E, c.dim) if moe else None,
            moegate_bias=(jnp.zeros((E,), jnp.float32)
                          if (moe and c.has_moegate_bias) else None),
            w13=None if moe else qt(2 * c.hidden_dim, c.dim),
            wcr=qt(H * P + H * R, c.q_lora_rank),
            wkvq=qt(R + P + c.q_lora_rank, c.dim),
            w13s=_mark_rowperm(qt(E + ns, 2 * m, c.dim)) if moe else None,
            w2s=qt(E + ns, c.dim, m) if moe else None,
        ))
        jax.block_until_ready(jax.tree.leaves(layers[-1]))  # bound transients
    return ModelParams(
        embed=PlainTensor(data=w(c.vocab_size, c.dim).astype(jnp.bfloat16)),
        layers=layers, final_norm=ones(c.dim),
        lm_head=qt(c.vocab_size, c.dim))


def random_quantized_params(cfg: ModelConfig, quant: str,
                            seed: int = 1234) -> ModelParams:
    """Random packed-plane quantized model for throughput benchmarks
    (absorbed-MLA layout; bench.py / scripts/bench_quant.py).

    ``quant``: q2_k | q3_k | f8e5m2 | q2_k_turbo | q3_k_turbo |
    q2_k_nibble | q3_k_nibble.
    """
    key = [jax.random.PRNGKey(seed)]

    def nxt():
        key[0], sub = jax.random.split(key[0])
        return sub

    def w(*shape):
        return jax.random.normal(nxt(), shape, jnp.float32) * 0.02

    def qt(*shape):
        return _random_qtensor(nxt, shape, quant)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    c = cfg
    H, P, Dv, R = (c.n_heads, c.qk_rope_head_dim, c.v_head_dim,
                   c.kv_lora_rank)
    layers = []
    for l in range(c.n_layers):
        moe = c.is_moe_layer(l)
        E, m = c.n_routed_experts, c.moe_intermediate_size
        layers.append(LayerParams(
            attn_norm=ones(c.dim), ffn_norm=ones(c.dim), kv_a_norm=ones(R),
            q_a_norm=ones(c.q_lora_rank),
            wkv_a=qt(R + P, c.dim), wo=qt(c.dim, H * Dv),
            wq=None, wq_a=qt(c.q_lora_rank, c.dim), wq_b=None, wkv_b=None,
            wc=qt(H * R, c.q_lora_rank), wq_rope_b=qt(H * P, c.q_lora_rank),
            wv_b=qt(H * Dv, R),
            w1=qt(E, m, c.dim) if moe else qt(c.hidden_dim, c.dim),
            w2=qt(E, c.dim, m) if moe else qt(c.dim, c.hidden_dim),
            w3=qt(E, m, c.dim) if moe else qt(c.hidden_dim, c.dim),
            shared_w1=qt(c.n_shared_experts * m, c.dim) if moe else None,
            shared_w2=qt(c.dim, c.n_shared_experts * m) if moe else None,
            shared_w3=qt(c.n_shared_experts * m, c.dim) if moe else None,
            moegate=w(E, c.dim) if moe else None,
            moegate_bias=None,
        ))
    return ModelParams(
        embed=PlainTensor(data=w(c.vocab_size, c.dim).astype(jnp.bfloat16)),
        layers=layers, final_norm=ones(c.dim),
        lm_head=qt(c.vocab_size, c.dim))
