"""Speculative-decoding dispatch benchmark (real chip).

Measures the fused speculation round (deepseek_tpu.speculative) against the
plain fused decode loop on the bench-scale model:

- plain: make_decode_loop tok/s (the 343 tok/s baseline path)
- self-draft spec: target == draft -> greedy acceptance is 100%, giving the
  measured UPPER BOUND tok/s of the fused rounds
- cost model: a round emits (accepted + 1) tokens; with round time t_r and
  acceptance rate a (model-pair dependent), tok/s = R*(a*k+1)/(R*t_r);
  the printed table evaluates the measured t_r at several a values.

Usage: python scripts/bench_spec.py [layers] [k] [rounds]
           [--draft-layers N] [--mtp]

--draft-layers N overrides the default layers//4 draft depth (the VERDICT
r2 #7 measurement is 16-layer target / 1-layer draft); --mtp additionally
benches self-speculation through a synthesized MTP module (one extra
transformer block + eh_proj drafting from the main hidden state).
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
from deepseek_tpu.models.testing import random_params
from deepseek_tpu.speculative import make_spec_rounds


def synth_mtp(cfg, seed=3):
    """Random MTPParams matching the main model's block structure (the
    converter emits the same shape from V3 checkpoints, convert.py
    mtp_layer path)."""
    import dataclasses
    from deepseek_tpu.models.params import MTPParams
    from deepseek_tpu.quant.qtensor import PlainTensor
    blk = random_params(
        dataclasses.replace(cfg, n_layers=1, first_k_dense_replace=0),
        seed=seed)
    key = jax.random.PRNGKey(seed + 1)
    eh = PlainTensor(data=(jax.random.normal(
        key, (cfg.dim, 2 * cfg.dim), jnp.float32) * 0.02
    ).astype(jnp.bfloat16))
    ones = jnp.ones((cfg.dim,), jnp.float32)
    return MTPParams(enorm=ones, hnorm=ones, eh_proj=eh,
                     block=blk.layers[0], final_norm=ones)


def main():
    argv, pos, draft_layers, want_mtp = sys.argv[1:], [], None, False
    quant, experts, pos_self, want_ngram = None, None, True, False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--draft-layers":
            i += 1
            draft_layers = int(argv[i])
        elif a == "--mtp":
            want_mtp = True
        elif a == "--ngram":
            want_ngram = True
        elif a == "--quant":
            i += 1
            quant = argv[i]
        elif a == "--experts":
            i += 1
            experts = int(argv[i])
        elif a == "--no-self":
            pos_self = False
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a} (supported: --draft-layers, --mtp, "
                     "--ngram, --quant, --experts, --no-self)")
        else:
            pos.append(a)
        i += 1
    layers = int(pos[0]) if pos else 8
    k = int(pos[1]) if len(pos) > 1 else 4
    R = int(pos[2]) if len(pos) > 2 else 4
    backend = jax.default_backend()
    if backend == "cpu":
        layers, block = 2, 4
    else:
        block = 32
    if draft_layers is None:
        draft_layers = max(1, layers // 4)
    cfg = bench_config(layers)
    dcfg = bench_config(draft_layers)
    if quant:
        # quantized weights let DEEP targets fit the chip (16L bf16 is
        # ~18 GB; nibble is ~3 GB) — the depth-RATIO scaling measurement
        # VERDICT r2 #7 asks for. K-quant rows need 256-divisible m.
        import dataclasses
        cfg = dataclasses.replace(cfg, moe_intermediate_size=1536)
        dcfg = dataclasses.replace(dcfg, moe_intermediate_size=1536)
    if experts:
        # slim expert table (same per-layer op structure, fewer resident
        # bytes): lets FULL-DEPTH targets (61L) fit one chip, like
        # scripts/bench_depth.py
        import dataclasses
        slim = dict(n_routed_experts=experts, n_active_routed=6,
                    n_group=4, topk_group=2)
        cfg = dataclasses.replace(cfg, **slim)
        dcfg = dataclasses.replace(dcfg, **slim)

    if quant:
        from deepseek_tpu.models.testing import random_quantized_params
        params = random_quantized_params(cfg, quant, seed=0)
        dparams = random_quantized_params(dcfg, quant, seed=1)
    else:
        params = random_params(cfg, seed=0)
        dparams = random_params(dcfg, seed=1)
    from deepseek_tpu.models.loader import fuse_projections
    params = fuse_projections(params, cfg, consume=True)
    dparams = fuse_projections(dparams, dcfg, consume=True)
    jax.block_until_ready(jax.tree.leaves(params))

    key = jax.random.PRNGKey(0)
    t0f = jnp.float32(0.0)
    t1f = jnp.float32(1.0)

    # --- plain fused decode loop ---------------------------------------
    loop = make_decode_loop(cfg, block)
    cache = init_cache(cfg, batch=1)
    tok = jnp.zeros((1, 1), jnp.int32)
    for wu in range(2):
        toks, _, cache = loop(params, cache, tok, jnp.int32(wu * block),
                              key, t0f, t1f)
        tok = toks[:, -1:]
        _ = int(np.asarray(tok)[0, 0])
    reps = 6 if backend != "cpu" else 1
    t0 = time.perf_counter()
    for i in range(reps):
        toks, _, cache = loop(params, cache, tok,
                              jnp.int32(block * (2 + i)), key, t0f, t1f)
        tok = toks[:, -1:]
    _ = int(np.asarray(tok)[0, 0])
    plain_tok_s = reps * block / (time.perf_counter() - t0)
    print(f"plain decode: {plain_tok_s:.1f} tok/s (block {block})")

    # --- fused speculative rounds, self-draft (acceptance == 1) --------
    def run_spec(pt, pd, cfg_d, tag):
        fn = make_spec_rounds(cfg, cfg_d, k, R, greedy=True)
        ct = init_cache(cfg, batch=1)
        cd = init_cache(cfg_d, batch=1)
        tok = jnp.zeros((1, 1), jnp.int32)
        pos = 0
        # warmup x2 with CORRECT position tracking; acceptance measured here
        accs = []
        for _ in range(2):
            dr, na, nx, ct, cd = fn(pt, pd, ct, cd, tok, jnp.int32(pos),
                                    key, t0f, t1f)
            na_np = np.asarray(na)
            accs.append(na_np.mean() / k)
            pos += int(na_np.sum()) + R
            tok = nx[-1][None, None]
        acc = float(accs[-1])
        # timing loop measures DISPATCH COST only (pos bookkeeping is
        # approximate — compute cost does not depend on token values)
        n_disp = 6 if backend != "cpu" else 1
        t0 = time.perf_counter()
        for _ in range(n_disp):
            dr, na, nx, ct, cd = fn(pt, pd, ct, cd, tok, jnp.int32(pos),
                                    key, t0f, t1f)
            tok = nx[-1][None, None]
            pos += R
        _ = np.asarray(na)              # syncs
        dt = time.perf_counter() - t0
        t_round = dt / (n_disp * R)
        print(f"{tag}: {t_round*1e3:.2f} ms/round (k={k}, R={R}/dispatch), "
              f"measured acceptance {acc:.2f}")
        for a in (acc, 0.6, 0.8, 1.0):
            eff = (a * k + 1) / t_round
            print(f"   acceptance {a:.2f} -> {eff:.1f} tok/s "
                  f"({eff / plain_tok_s:.2f}x plain)")
        return t_round

    if pos_self:
        # skippable (--no-self): a deep target drafting ITSELF doubles the
        # verify program's footprint for a row nobody deploys
        run_spec(params, params, cfg, "self-draft spec (upper bound)")
    run_spec(params, dparams, dcfg, f"{draft_layers}-layer draft spec")

    if want_ngram:
        # prompt-lookup speculation: drafting costs ZERO model FLOPs, so a
        # round is one (k+1)-token verify chunk + the in-graph history
        # machinery — the measured t_round is the floor any drafter can
        # reach; acceptance is workload-dependent (context echo)
        from deepseek_tpu.speculative import make_ngram_spec_rounds
        H = cfg.kv_window
        fn = make_ngram_spec_rounds(cfg, k, R, hist_len=H, greedy=True)
        ct = init_cache(cfg, batch=1)
        rngh = np.random.default_rng(0)
        seed_toks = rngh.integers(2, cfg.vocab_size, 64)
        hist = jnp.zeros((1, H), jnp.int32).at[0, :64].set(
            jnp.asarray(seed_toks, jnp.int32))
        hlen = jnp.int32(64)
        tok = jnp.asarray([[int(seed_toks[-1])]], jnp.int32)
        pos = 63
        for _ in range(2):
            dr, na, nx, mt, ct, hist, hlen = fn(
                params, ct, hist, hlen, tok, jnp.int32(pos), key, t0f, t1f)
            na_np = np.asarray(na)
            pos += int(na_np.sum()) + R
            tok = nx[-1][None, None]
        n_disp = 6 if backend != "cpu" else 1
        t0 = time.perf_counter()
        for _ in range(n_disp):
            dr, na, nx, mt, ct, hist, hlen = fn(
                params, ct, hist, hlen, tok, jnp.int32(pos), key, t0f, t1f)
            tok = nx[-1][None, None]
            pos += R
        _ = np.asarray(na)
        t_round = (time.perf_counter() - t0) / (n_disp * R)
        print(f"n-gram spec: {t_round*1e3:.2f} ms/round (k={k}, R={R}; "
              f"zero-FLOP drafter, H={H}) — acceptance is workload echo "
              f"rate")
        for a in (0.3, 0.6, 0.8, 1.0):
            eff = (a * k + 1) / t_round
            print(f"   acceptance {a:.2f} -> {eff:.1f} tok/s "
                  f"({eff / plain_tok_s:.2f}x plain)")

    if want_mtp:
        # self-speculation through the MTP module: drafter = ONE extra
        # block chained on the main hidden state (the V3 deployment shape)
        from deepseek_tpu.models.mtp import init_mtp_cache
        from deepseek_tpu.speculative import make_mtp_spec_rounds
        import dataclasses
        mtp = synth_mtp(cfg)
        mparams = dataclasses.replace(params, mtp=mtp)
        fn = make_mtp_spec_rounds(cfg, k, R, greedy=True)
        ct = init_cache(cfg, batch=1)
        cm = init_mtp_cache(cfg)
        tok = jnp.zeros((1, 1), jnp.int32)
        h = jnp.zeros((1, 1, cfg.dim), jnp.float32)
        pos = 0
        accs = []
        for _ in range(2):
            dr, na, nx, h, ct, cm = fn(mparams, ct, cm, tok, h,
                                       jnp.int32(pos), key, t0f, t1f)
            na_np = np.asarray(na)
            accs.append(na_np.mean() / k)
            pos += int(na_np.sum()) + R
            tok = nx[-1][None, None]
        acc = float(accs[-1])
        n_disp = 6 if backend != "cpu" else 1
        t0 = time.perf_counter()
        for _ in range(n_disp):
            dr, na, nx, h, ct, cm = fn(mparams, ct, cm, tok, h,
                                       jnp.int32(pos), key, t0f, t1f)
            tok = nx[-1][None, None]
            pos += R
        _ = np.asarray(na)
        t_round = (time.perf_counter() - t0) / (n_disp * R)
        print(f"MTP spec: {t_round*1e3:.2f} ms/round (k={k}, R={R}), "
              f"measured acceptance {acc:.2f} (random MTP weights -> "
              f"meaningless draft quality; real checkpoints measure a)")
        for a in (0.6, 0.8, 1.0):
            eff = (a * k + 1) / t_round
            print(f"   acceptance {a:.2f} -> {eff:.1f} tok/s "
                  f"({eff / plain_tok_s:.2f}x plain)")


if __name__ == "__main__":
    main()
