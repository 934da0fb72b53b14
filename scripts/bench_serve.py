"""Continuous-batching serving throughput at bench scale.

Drives the BatchScheduler directly (the HTTP layer adds only queue hops):
M requests with P-token prompts, max_tokens each, measured end-to-end
(admission prefills + fused block decodes). Usage:

    python scripts/bench_serve.py [batch_slots] [n_requests] [max_tokens] [block]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import numpy as np

from bench import bench_config
from deepseek_tpu.models.testing import random_params
from deepseek_tpu.serving import BatchScheduler, Request


class _BenchEngine:
    """Engine-shaped shim over random bench-scale params (no checkpoint:
    building one server-side costs minutes of remote transfers).
    ``quant`` switches to the fused quantized synth (V3-slice serving)."""

    def __init__(self, cfg, quant=None):
        from deepseek_tpu.models import init_cache, make_forward
        from deepseek_tpu.models.loader import params_active_bytes

        self.cfg = cfg
        if quant:
            from deepseek_tpu.models.testing import random_fused_params
            self.params = random_fused_params(cfg, quant)
        else:
            self.params = random_params(cfg, seed=0)
        jax.block_until_ready(jax.tree.leaves(self.params))
        self.prefill_chunk = 256
        self._fns = {}
        self._init_cache = init_cache
        self._make_forward = make_forward
        self._pab = params_active_bytes

        class Tok:
            bos_id = 1

            def decode_one(self, prev, tok):
                return b"?"

            def is_eos_or_eot(self, tok):
                return False  # run all requests to max_tokens

        self.tokenizer = Tok()

        class Sam:
            def sample(self, logits, t, p, top_k=0, min_p=0.0):
                return int(np.argmax(logits))

        self.sampler = Sam()

    def new_cache(self, batch=1):
        return self._init_cache(self.cfg, batch=batch)

    def fwd(self, prefill, logits_mode):
        key = (prefill, logits_mode)
        if key not in self._fns:
            self._fns[key] = self._make_forward(
                self.cfg, prefill=prefill, logits_mode=logits_mode)
        return self._fns[key]

    # BatchScheduler._admit calls engine.hydrate
    def hydrate(self, cache, tokens, pos0=0, want_last_logits=True,
                collect_all_logits=False, progress=None):
        from deepseek_tpu.engine import Engine
        return Engine.hydrate(self, cache, tokens, pos0, want_last_logits,
                              collect_all_logits, progress)


def main():
    import jax.numpy as jnp  # noqa: F401

    argv = list(sys.argv[1:])
    if "--spec" in argv:                  # drop --spec's optional operand
        ai = argv.index("--spec")
        if ai + 1 < len(argv) and argv[ai + 1] in ("ngram", "mtp"):
            del argv[ai + 1]
    pos = [a for a in argv if not a.startswith("--")]
    slots = int(pos[0]) if len(pos) > 0 else 8
    n_req = int(pos[1]) if len(pos) > 1 else 16
    max_tok = int(pos[2]) if len(pos) > 2 else 64
    block = int(pos[3]) if len(pos) > 3 else 8

    if "--v3" in sys.argv:
        # DeepSeek-V3-proportioned serving (dim 7168, 256 experts, k=8
        # noaux_tc; Q3_K nibble — the deepest slice one chip holds)
        sys.path.insert(0, "scripts")
        from bench_v3 import v3_slice_config
        cfg = v3_slice_config(2 if jax.default_backend() != "cpu" else 1)
        eng = _BenchEngine(cfg, quant="q3_k_nibble")
    else:
        cfg = bench_config(8 if jax.default_backend() != "cpu" else 2)
        eng = _BenchEngine(cfg)
    rng = np.random.default_rng(0)

    # --- cold-start latency under Server-style warmup --------------------
    # FIRST in the process (nothing compiled yet): warmup() precompiles the
    # occupancy buckets + admission chunk shapes, then requests arrive and
    # every step is timed FROM THE FIRST ONE. The warmup guarantee: p95
    # with admissions in flight stays within ~2x the idle p50 — no inline
    # compile spikes on the serving path.
    import time as _t
    sched = BatchScheduler(eng, batch_size=slots, decode_block=block)
    t0 = _t.perf_counter()
    sched.warmup()
    warm_s = _t.perf_counter() - t0
    for _ in range(n_req):
        sched.submit(Request(prompt_tokens=rng.integers(
            2, cfg.vocab_size, 256).tolist(), max_new_tokens=max_tok,
            temperature=0.0))
    cold = []
    while sched.has_work and len(cold) < 32:
        t0 = _t.perf_counter()
        sched.step()
        cold.append(_t.perf_counter() - t0)
    sched.run()
    pct = lambda a, q: float(np.percentile(np.asarray(a), q))
    print(f"warmed cold start: warmup {warm_s:.1f}s, first-32-step "
          f"latency p50 {pct(cold,50)*1e3:.1f}ms p95 {pct(cold,95)*1e3:.1f}ms "
          f"(admissions in flight from step 1)")

    sched = BatchScheduler(eng, batch_size=slots, decode_block=block)
    for _ in range(n_req):
        sched.submit(Request(
            prompt_tokens=rng.integers(2, cfg.vocab_size, 64).tolist(),
            max_new_tokens=max_tok, temperature=0.0))
    t0 = time.perf_counter()
    done = sched.run()
    dt = time.perf_counter() - t0
    total = sum(len(r.out_tokens) for r in done)
    print(f"serving: {len(done)} requests, {total} tokens in {dt:.2f}s "
          f"-> {total/dt:.0f} tok/s aggregate "
          f"(slots={slots}, block={sched.block})")

    # --- decode-latency distribution under concurrent admissions ---------
    # half the slots run a long generation; the rest of the requests arrive
    # while it decodes, so every admission chunk splices between blocks.
    # Reported: per-step decode latency p50/p95 with admissions in flight
    # vs an idle batch (no queue) — the chunk-interleaving guarantee is
    # that the former stays within ~2x of the latter.
    def step_times(sched, n_steps, skip: int = 2):
        """Per-step latencies; the first ``skip`` samples are dropped —
        the first dispatch of a program after a pause runs ~3x slow on
        remote-attached chips (PERFORMANCE.md methodology), and a
        12-sample window polluted by it misreported the V3-slice idle
        p50 ~9x high."""
        ts = []
        while sched.has_work and len(ts) < n_steps + skip:
            t0 = time.perf_counter()
            sched.step()
            ts.append(time.perf_counter() - t0)
        return ts[skip:]

    sched = BatchScheduler(eng, batch_size=slots, decode_block=block)
    for _ in range(max(1, slots // 2)):
        sched.submit(Request(prompt_tokens=rng.integers(
            2, cfg.vocab_size, 64).tolist(), max_new_tokens=max_tok,
            temperature=0.0))
    while sched.pending is not None or sched.queue:
        sched.step()                       # finish initial admissions
    idle = step_times(sched, 16)

    for _ in range(n_req):
        sched.submit(Request(prompt_tokens=rng.integers(
            2, cfg.vocab_size, 256).tolist(), max_new_tokens=max_tok,
            temperature=0.0))
    busy = step_times(sched, 24, skip=1)
    sched.run()

    print(f"decode step latency idle: p50 {pct(idle,50)*1e3:.1f}ms "
          f"p95 {pct(idle,95)*1e3:.1f}ms | with admissions: "
          f"p50 {pct(busy,50)*1e3:.1f}ms p95 {pct(busy,95)*1e3:.1f}ms "
          f"(ratio p50 {pct(busy,50)/max(pct(idle,50),1e-9):.2f}x)")

    # --- prompt-prefix cache: shared-system-prompt admission cost --------
    # n_req requests share a 512-token system prefix + 64 distinct tokens;
    # reported per config: wall time and mean time-to-first-token (the
    # admission path is exactly what prefix reuse removes).
    if "--prefix" in sys.argv:
        shared = rng.integers(2, cfg.vocab_size, 512).tolist()
        prompts = [shared + rng.integers(2, cfg.vocab_size, 64).tolist()
                   for _ in range(n_req)]

        def run_shared(prefix_mb):
            sched = BatchScheduler(eng, batch_size=slots, decode_block=block,
                                   prefix_cache_mb=prefix_mb,
                                   prefix_block=128)
            sched.warmup()
            ttft = {}
            t0 = time.perf_counter()
            for i, ptoks in enumerate(prompts):
                def first(tok, piece, i=i):
                    ttft.setdefault(i, time.perf_counter() - t0)
                sched.submit(Request(prompt_tokens=list(ptoks),
                                     max_new_tokens=8, temperature=0.0,
                                     on_token=first))
            sched.run()
            wall = time.perf_counter() - t0
            stats = (sched.prefix_cache.stats if sched.prefix_cache
                     else {})
            return wall, float(np.mean(list(ttft.values()))), stats

        w0, t0_, _ = run_shared(0.0)
        w1, t1_, st = run_shared(512.0)
        print(f"shared-prefix admissions ({n_req} x 512+64-token prompts, "
              f"8 new tokens): no prefix cache wall {w0:.2f}s mean-TTFT "
              f"{t0_*1e3:.0f}ms | with cache wall {w1:.2f}s mean-TTFT "
              f"{t1_*1e3:.0f}ms ({w0/max(w1,1e-9):.2f}x wall, "
              f"hits {st.get('hits')}, "
              f"{st.get('tokens_reused')} prompt tokens not re-prefilled)")

    # --- speculative continuous batching ---------------------------------
    # Random weights give arbitrary greedy walks, so workload acceptance
    # cannot be STAGED here (a prompt can never contain tokens the model
    # has not yet chosen; measured-alpha needs a real checkpoint — the
    # CPU tests pin acceptance>0 on the cyclic tiny model). Reported
    # instead, bench_spec.py-style: (1) losslessness on chip (spec output
    # == plain output, token-exact), (2) the novel-text BACKOFF BOUND
    # (spec on never-matching text stays near plain throughput), (3) the
    # MECHANICAL dispatch costs — t_spec (R fused verify rounds, whole
    # batch) vs t_block (plain fused block) — and the projected aggregate
    # tok/s at workload acceptance alpha: one spec dispatch emits
    # B*R*(alpha*k+1) tokens where a plain dispatch emits B*block.
    if "--spec" in sys.argv:
        K, R = 4, 2
        # optional mode operand: --spec [ngram|mtp]
        ai = sys.argv.index("--spec")
        spec_mode = (sys.argv[ai + 1]
                     if ai + 1 < len(sys.argv)
                     and sys.argv[ai + 1] in ("ngram", "mtp") else "ngram")
        if spec_mode == "mtp":
            if "--v3" in sys.argv:
                print("spec mtp: skipped at the V3 slice (a synthesized "
                      "MoE MTP block at dim 7168/E=256 is ~22 GB bf16)")
                return
            import dataclasses
            sys.path.insert(0, "scripts")
            from bench_spec import synth_mtp
            eng.params = dataclasses.replace(eng.params,
                                             mtp=synth_mtp(cfg))
            jax.block_until_ready(jax.tree.leaves(eng.params.mtp))

        def run_sched(prompts, **kw):
            sched = BatchScheduler(eng, batch_size=slots,
                                   decode_block=block, **kw)
            sched.warmup()
            reqs = [Request(prompt_tokens=list(p), max_new_tokens=max_tok,
                            temperature=0.0) for p in prompts]
            for r in reqs:
                sched.submit(r)
            t0 = time.perf_counter()
            sched.run()
            dt = time.perf_counter() - t0
            total = sum(len(r.out_tokens) for r in reqs)
            return total / dt, reqs, sched

        novel = [rng.integers(2, cfg.vocab_size, 80).tolist()
                 for _ in range(n_req)]
        tp_p0, reqs_p0, _ = run_sched(novel)
        tp_pn, reqs_p, _ = run_sched(novel)
        assert all(a.out_tokens == b.out_tokens
                   for a, b in zip(reqs_p0, reqs_p)), \
            "plain decode must be deterministic (methodology check)"
        tp_sn, reqs_s, ssn = run_sched(novel, spec=spec_mode, spec_k=K,
                                       spec_rounds=R)
        # greedy agreement vs plain decode: token-identity is pinned on
        # CPU f32 (tests/test_serving.py); on-chip bf16 the verify and
        # decode forwards are DIFFERENT compilations, so near-tie argmax
        # picks can flip and the (both individually deterministic) greedy
        # sequences may split — the same class of divergence as batched-
        # vs-unbatched decode. Report the agreement prefix instead.
        def prefix(a, b):
            n = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                n += 1
            return n
        agr = [prefix(a.out_tokens, b.out_tokens)
               for a, b in zip(reqs_p, reqs_s)]
        full = sum(1 for a, b in zip(agr, reqs_p)
                   if a == len(b.out_tokens))
        stn = ssn.spec_stats
        print(f"spec serving [{spec_mode}] (novel text): plain "
              f"{tp_pn:.0f} tok/s | spec "
              f"{tp_sn:.0f} tok/s ({tp_sn/max(tp_pn,1e-9):.2f}x backoff "
              f"bound; {stn['dispatches']} spec dispatches, "
              f"{stn['plain_fallbacks']} plain fallbacks); greedy "
              f"agreement with plain: {full}/{n_req} exact, mean "
              f"divergence-free prefix {np.mean(agr):.1f}/{max_tok} "
              f"(bf16 near-tie flips across compilations)")

        # mechanical dispatch costs at full occupancy (steady state, no
        # admissions in flight): medians over repeated timed steps
        def steady(spec):
            kw = dict(spec=spec_mode, spec_k=K, spec_rounds=R) if spec else {}
            sched = BatchScheduler(eng, batch_size=slots,
                                   decode_block=block, **kw)
            sched.warmup()
            for _ in range(slots):
                sched.submit(Request(prompt_tokens=rng.integers(
                    2, cfg.vocab_size, 64).tolist(),
                    max_new_tokens=10 ** 6, temperature=0.0))
            while sched.pending is not None or sched.queue:
                sched.step()
            if spec:
                # measuring the DISPATCH cost: hold the dry-spell backoff
                # (and the acceptance-EMA floor) far out of reach so every
                # timed step speculates
                sched._spec_dry = -10 ** 9
                sched._spec_alpha_floor = -1.0
            ts = step_times(sched, 12)
            for req in sched.slots:          # stop the unbounded requests
                if req is not None:
                    req.done = True
            return float(np.median(np.asarray(ts)))

        t_block = steady(False)
        t_spec = steady(True)
        toks_block = slots * block
        print(f"dispatch cost at B={slots}: plain block({block}) "
              f"{t_block*1e3:.1f}ms ({toks_block/t_block:.0f} tok/s) | "
              f"spec R={R},k={K} {t_spec*1e3:.1f}ms; projected aggregate "
              + " ".join(
                  f"alpha={a:.1f}: {slots*R*(a*K+1)/t_spec:.0f} tok/s"
                  for a in (0.0, 0.5, 0.8, 1.0)))


if __name__ == "__main__":
    main()
