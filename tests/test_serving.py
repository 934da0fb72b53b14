import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_tpu.engine import Engine
from deepseek_tpu.serving import BatchScheduler, Request
from deepseek_tpu.utils import codec
from tests.util_tinymodel import (
    tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=32)
    codec.save_checkpoint(
        str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 55))],
        tiny_metadata(cfg))
    return Engine(str(d), seed=0, prefill_chunk=8, decode_block=1)


def test_continuous_batching_matches_individual(engine):
    """5 greedy requests through a 2-slot scheduler == 5 individual runs.

    Forces slot reuse (continuous admission) and exercises per-sequence
    decode positions (slots run at different pos simultaneously)."""
    prompts = ["hello", "hello world", "abc", "xyz test", "q"]
    lens = [3, 6, 4, 5, 2]

    want = []
    for p, n in zip(prompts, lens):
        toks = engine.tokenizer.encode(p, bos=True)
        out, _ = engine.generate(toks, num_steps=n, temperature=0.0)
        want.append(out)

    sched = BatchScheduler(engine, batch_size=2)
    for p, n in zip(prompts, lens):
        sched.submit(Request(
            prompt_tokens=engine.tokenizer.encode(p, bos=True),
            max_new_tokens=n, temperature=0.0))
    finished = sched.run()
    assert len(finished) == 5
    for req, expect in zip(finished, want):
        assert req.out_tokens == expect, (req.request_id, req.out_tokens, expect)


def test_warmup_precompiles_without_corrupting_state(engine):
    """Server-startup warmup (precompiles bucket loops + admission shapes
    + the slot merge) must leave the scheduler producing exactly the
    outputs of a cold scheduler: warmup's garbage decode rows and the
    slot-0 merge are fully overwritten by real admissions."""
    prompts = ["hello world", "abc"]
    want = []
    for p in prompts:
        toks = engine.tokenizer.encode(p, bos=True)
        out, _ = engine.generate(toks, num_steps=4, temperature=0.0)
        want.append(out)

    sched = BatchScheduler(engine, batch_size=2)
    sched.warmup()
    # every power-of-2 occupancy bucket loop is compiled up front
    assert set(sched._loops) == {(1, sched.block), (2, sched.block)}
    assert sched._merge is not None
    for p in prompts:
        sched.submit(Request(
            prompt_tokens=engine.tokenizer.encode(p, bos=True),
            max_new_tokens=4, temperature=0.0))
    finished = sched.run()
    assert [r.out_tokens for r in finished] == want


def test_scheduler_streams_tokens(engine):
    got = []
    sched = BatchScheduler(engine, batch_size=1)
    sched.submit(Request(
        prompt_tokens=engine.tokenizer.encode("hi", bos=True),
        max_new_tokens=3, temperature=0.0,
        on_token=lambda t, piece: got.append((t, piece))))
    finished = sched.run()
    assert [t for t, _ in got] == finished[0].out_tokens
    assert all(isinstance(p, bytes) for _, p in got)


def test_admission_chunks_interleave_with_decode(engine):
    """A long-prompt admission hydrates one bounded chunk per step while the
    running sequence keeps decoding between chunks (no full-prompt stall),
    and the admitted request still matches its individual greedy run."""
    a_tokens = []
    sched = BatchScheduler(engine, batch_size=2, decode_block=1)
    sched.submit(Request(
        prompt_tokens=engine.tokenizer.encode("hello", bos=True),
        max_new_tokens=40, temperature=0.0,
        on_token=lambda t, b: a_tokens.append(t)))
    sched.step()                      # admit + first decode for A
    assert len(a_tokens) >= 1

    long_prompt = engine.tokenizer.encode("word " * 40, bos=True)
    assert len(long_prompt) > engine.cfg.kv_window  # spans chunks AND ring
    want, _ = engine.generate(long_prompt, num_steps=3, temperature=0.0)
    reqB = Request(prompt_tokens=long_prompt, max_new_tokens=3,
                   temperature=0.0)
    sched.submit(reqB)

    progress = []
    steps = 0
    while (sched.pending is not None or sched.queue) and steps < 100:
        before = len(a_tokens)
        sched.step()
        progress.append(len(a_tokens) - before)
        steps += 1
    # hydration spanned multiple scheduler steps AND decode advanced
    assert len(progress) >= 3
    assert sum(progress) >= 3
    sched.run()
    assert reqB.out_tokens == want


def test_scheduler_dp_sharded_matches_unsharded(engine):
    """Continuous batching over a (data=2, expert=2, tensor=2) mesh: the
    batch DP-shards across chips with per-slot sampling params, and greedy
    outputs match the unsharded scheduler exactly."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deepseek_tpu.parallel import make_mesh

    prompts = ["hello", "abc xyz", "q"]
    lens = [5, 4, 3]

    def run(mesh):
        sched = BatchScheduler(engine, batch_size=2, decode_block=2,
                               mesh=mesh)
        for p, n in zip(prompts, lens):
            sched.submit(Request(
                prompt_tokens=engine.tokenizer.encode(p, bos=True),
                max_new_tokens=n, temperature=0.0))
        return [r.out_tokens for r in sched.run()]

    want = run(None)
    got = run(make_mesh(data=2, expert=2, tensor=2))
    assert got == want


def test_scheduler_mixed_lengths_interleave(engine):
    """A long and short request share the batch; the short one finishes and a
    third is admitted while the long one continues."""
    sched = BatchScheduler(engine, batch_size=2)
    toks = engine.tokenizer.encode("hello", bos=True)
    a = sched.submit(Request(prompt_tokens=toks, max_new_tokens=10, temperature=0.0))
    b = sched.submit(Request(prompt_tokens=toks, max_new_tokens=2, temperature=0.0))
    c = sched.submit(Request(prompt_tokens=toks, max_new_tokens=2, temperature=0.0))
    finished = sched.run()
    by_id = {r.request_id: r for r in finished}
    assert len(by_id[a].out_tokens) == 10
    assert len(by_id[b].out_tokens) == 2
    assert len(by_id[c].out_tokens) == 2
    # identical inputs -> identical greedy outputs regardless of slot timing
    assert by_id[b].out_tokens == by_id[c].out_tokens


def test_stop_sequence_truncates_and_holds_back(engine):
    """Stop sequences: generation ends when the decoded text contains the
    stop string; out_bytes truncates BEFORE the match; streamed pieces
    never leak any byte of the stop string even when it spans tokens."""
    toks = engine.tokenizer.encode("hello", bos=True)
    # reference run: what greedy produces with no stop
    sched = BatchScheduler(engine, batch_size=1)
    base = Request(prompt_tokens=list(toks), max_new_tokens=10,
                   temperature=0.0)
    sched.submit(base)
    sched.run()
    full = base.out_bytes.decode("utf-8", errors="replace")
    assert base.out_bytes == engine.tokenizer.decode(base.out_tokens)
    assert len(full) > 4

    # pick a stop string strictly inside the text, crossing a token
    # boundary when possible (starts mid-way through the output)
    cut = len(full) // 2
    stop = full[cut:cut + 3]
    assert stop and stop in full[1:]

    pieces = []
    sched2 = BatchScheduler(engine, batch_size=1)
    req = Request(prompt_tokens=list(toks), max_new_tokens=10,
                  temperature=0.0, stop=[stop],
                  on_token=lambda t, b: pieces.append(b))
    sched2.submit(req)
    sched2.run()
    text = req.out_bytes.decode("utf-8", errors="replace")
    assert req.stop_hit and req.done
    assert stop not in text
    assert full.startswith(text)
    assert text == full[:full.index(stop)]
    # streaming view must equal the truncated text exactly
    assert b"".join(pieces) == req.out_bytes


def test_stop_not_hit_flushes_heldback_tail(engine):
    """A stop whose PREFIX ends the generation (match never completes)
    must still deliver the held-back bytes at the end."""
    toks = engine.tokenizer.encode("hello", bos=True)
    sched = BatchScheduler(engine, batch_size=1)
    base = Request(prompt_tokens=list(toks), max_new_tokens=6,
                   temperature=0.0)
    sched.submit(base)
    sched.run()
    full = base.out_bytes
    # stop = last 2 bytes of the text + an impossible continuation: its
    # prefix is pending when max_tokens ends the request
    stop = (full[-2:] + b"\xff\xff\xff").decode("utf-8", errors="replace")

    pieces = []
    sched2 = BatchScheduler(engine, batch_size=1)
    req = Request(prompt_tokens=list(toks), max_new_tokens=6,
                  temperature=0.0, stop=[stop],
                  on_token=lambda t, b: pieces.append(b))
    sched2.submit(req)
    sched2.run()
    assert not req.stop_hit and req.done
    assert req.out_bytes == full
    assert b"".join(pieces) == full


def _greedy_many(engine, token_lists, n, **sched_kw):
    sched = BatchScheduler(engine, batch_size=2, **sched_kw)
    reqs = [Request(prompt_tokens=list(t), max_new_tokens=n, temperature=0.0)
            for t in token_lists]
    for r in reqs:
        sched.submit(r)
    sched.run()
    return [r.out_tokens for r in reqs], sched


def test_prefix_cache_exact_and_hits(engine):
    """Requests sharing a prompt prefix through a prefix-cached scheduler
    produce exactly the uncached greedy outputs, and later admissions
    reuse the stored blocks instead of re-prefilling them."""
    shared = engine.tokenizer.encode("hello world abc xyz", bos=True)
    assert len(shared) >= 9
    tails = [engine.tokenizer.encode(t, bos=False)
             for t in (" one", " two three", " four")]
    prompts = [shared + t for t in tails]

    want, _ = _greedy_many(engine, prompts, 5)
    got, sched = _greedy_many(engine, prompts, 5,
                              prefix_cache_mb=8.0, prefix_block=4)
    assert got == want
    pc = sched.prefix_cache
    # the first admission seeds the store; every later one hits
    assert pc.stats["hits"] >= 2
    assert pc.stats["tokens_reused"] >= 2 * (len(shared) // 4) * 4 - 8
    assert pc.stats["blocks"] > 0
    # a fourth request repeating prompt 0 reuses the FULL stored chain:
    # all blocks up to the last one strictly inside the prompt
    reused, frags = pc.match(prompts[0])
    assert reused == (len(prompts[0]) - 1) // 4 * 4
    assert len(frags) == reused // 4


def test_prefix_cache_eviction_keeps_chain_roots(engine):
    """LRU regression: under budget pressure with per-request unique tail
    blocks, eviction must trim chains at the TAIL, never at block 0 — a
    shallow-first touch order once made every chain's root the global
    oldest entry, degrading the full store to a permanent 0% hit rate."""
    shared = engine.tokenizer.encode("hello world abc xyz", bos=True)
    assert len(shared) >= 13             # >= 3 blocks of 4
    sched = BatchScheduler(engine, batch_size=2, prefix_cache_mb=1.0,
                           prefix_block=4)
    pc = sched.prefix_cache
    # budget = exactly the bytes of one admission's blocks: every later
    # admission with a unique tail forces eviction
    first = shared + engine.tokenizer.encode(" t0", bos=False)
    sched.submit(Request(prompt_tokens=list(first), max_new_tokens=2,
                         temperature=0.0))
    sched.run()
    pc.budget = pc.stats["bytes"]
    for i in range(1, 4):
        tail = engine.tokenizer.encode(f" tail{i}", bos=False)
        sched.submit(Request(prompt_tokens=shared + tail, max_new_tokens=2,
                             temperature=0.0))
        sched.run()
    # every admission after the first must reuse the shared chain
    assert pc.stats["hits"] == 3, pc.stats
    assert pc.stats["tokens_reused"] >= 3 * (len(shared) // 4) * 4 - 12


def test_prefix_cache_eviction_keeps_correctness(engine):
    """A ~zero-byte budget evicts every block immediately; outputs stay
    exact (the cache only ever changes WHERE rows come from)."""
    shared = engine.tokenizer.encode("hello world abc", bos=True)
    prompts = [shared + engine.tokenizer.encode(t, bos=False)
               for t in (" one", " two")]
    want, _ = _greedy_many(engine, prompts, 4)
    got, sched = _greedy_many(engine, prompts, 4,
                              prefix_cache_mb=1e-9, prefix_block=4)
    assert got == want
    assert sched.prefix_cache.stats["bytes"] == 0


def test_prefix_cache_skips_past_window_prompts(engine):
    """Prompts longer than the ring window hydrate with wrap + sink
    re-rotation — their rows are not prefix-pure and must never be
    stored; admission correctness is unaffected."""
    long_prompt = engine.tokenizer.encode("word " * 40, bos=True)
    assert len(long_prompt) > engine.cfg.kv_window
    want, _ = _greedy_many(engine, [long_prompt], 3)
    got, sched = _greedy_many(engine, [long_prompt], 3,
                              prefix_cache_mb=8.0, prefix_block=4)
    assert got == want
    assert sched.prefix_cache.stats["blocks"] == 0


def test_prefix_cache_int8_kv(tmp_path):
    """Prefix reuse with the int8 KV cache: the per-row scales and the
    float sink masters restore with the blocks (whole-leaf for masters),
    greedy outputs match the uncached int8 scheduler exactly."""
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=32)
    codec.save_checkpoint(
        str(tmp_path), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 55))],
        tiny_metadata(cfg))
    eng = Engine(str(tmp_path), seed=0, prefill_chunk=8, decode_block=1,
                 kv_cache_dtype="int8")
    shared = eng.tokenizer.encode("hello world abc xyz", bos=True)
    prompts = [shared + eng.tokenizer.encode(t, bos=False)
               for t in (" one", " two")]
    want, _ = _greedy_many(eng, prompts, 4)
    got, sched = _greedy_many(eng, prompts, 4,
                              prefix_cache_mb=8.0, prefix_block=4)
    assert got == want
    assert sched.prefix_cache.stats["hits"] >= 1


def test_warmup_covers_prefix_cache(engine):
    """warmup() precompiles the prefix slice/restore so the first cached
    admission compiles nothing new."""
    sched = BatchScheduler(engine, batch_size=2, prefix_cache_mb=8.0,
                           prefix_block=4)
    sched.warmup()
    assert sched.prefix_cache._slice is not None
    assert sched.prefix_cache._write is not None
    toks = engine.tokenizer.encode("hello world abc", bos=True)
    want, _ = _greedy_many(engine, [toks], 3)
    for _ in range(2):
        r = Request(prompt_tokens=list(toks), max_new_tokens=3,
                    temperature=0.0)
        sched.submit(r)
        sched.run()
        assert r.out_tokens == want[0]
    assert sched.prefix_cache.stats["hits"] == 1


def test_per_slot_top_k_greedy_equivalence(engine):
    """top_k=1 must reproduce greedy decoding exactly (device path), even
    at temperature 1.0, and per-slot params must not cross-contaminate."""
    prompts = ["hello", "abc"]
    want = []
    for p in prompts:
        toks = engine.tokenizer.encode(p, bos=True)
        out, _ = engine.generate(toks, num_steps=5, temperature=0.0)
        want.append(out)

    sched = BatchScheduler(engine, batch_size=2)
    reqs = [Request(prompt_tokens=engine.tokenizer.encode(p, bos=True),
                    max_new_tokens=5, temperature=1.0, top_k=1)
            for p in prompts]
    for r in reqs:
        sched.submit(r)
    sched.run()
    for r, expect in zip(reqs, want):
        assert r.out_tokens == expect, (r.out_tokens, expect)


def test_logprobs_match_rescoring(engine):
    """A greedy request with logprobs=True returns one log-softmax value
    per sampled token (device loop for block steps + host path for the
    admission's first token), matching an independent re-score of the
    full sequence through Engine.hydrate's target-logprob path. Tokens
    must equal a logprobs=False scheduler's output (no behavior change).
    """
    toks = engine.tokenizer.encode("hello world", bos=True)

    base = BatchScheduler(engine, batch_size=2)
    r0 = Request(prompt_tokens=list(toks), max_new_tokens=6,
                 temperature=0.0)
    base.submit(r0)
    base.run()

    sched = BatchScheduler(engine, batch_size=2, logprobs=True)
    r = Request(prompt_tokens=list(toks), max_new_tokens=6,
                temperature=0.0, logprobs=True)
    sched.submit(r)
    sched.run()

    assert r.out_tokens == r0.out_tokens
    assert len(r.out_logprobs) == len(r.out_tokens)
    assert all(lp <= 0.0 for lp in r.out_logprobs)

    # re-score: feeding seq[:-1] with target seq[i+1] gives
    # log P(seq[i+1] | seq[:i+1]); generated tokens start at prompt end
    seq = list(toks) + r.out_tokens
    cache = engine.new_cache(batch=1)
    _, _, lps, _ = engine.hydrate(cache, seq[:-1], 0,
                                  target_tokens=seq[1:])
    want = np.asarray(lps)[len(toks) - 1:]
    np.testing.assert_allclose(r.out_logprobs, want, atol=2e-2)


def test_logprobs_off_scheduler_leaves_requests_empty(engine):
    """logprobs on the Request but not the scheduler: documented no-op."""
    sched = BatchScheduler(engine, batch_size=2)
    r = Request(prompt_tokens=engine.tokenizer.encode("abc", bos=True),
                max_new_tokens=3, temperature=0.0, logprobs=True)
    sched.submit(r)
    sched.run()
    assert len(r.out_tokens) == 3 and r.out_logprobs == []


# ---------------------------------------------------------------- spec serving

@pytest.fixture(scope="module")
def engine_spec(tmp_path_factory):
    """Wider ring window so fused speculation rounds have room to run
    (the module engine's 32-slot window fits barely one spec span)."""
    d = tmp_path_factory.mktemp("srvspec")
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=256,
                      rs_original_max_position_embeddings=128)
    codec.save_checkpoint(
        str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 55))],
        tiny_metadata(cfg))
    return Engine(str(d), seed=0, prefill_chunk=8, decode_block=1)


def test_spec_serving_greedy_matches_plain(engine_spec):
    """Speculative continuous batching is lossless: greedy outputs through
    a spec='ngram' scheduler are token-identical to the plain scheduler,
    across slot reuse and mixed prompt lengths. Prompts embed the model's
    own greedy continuation so the drafter actually accepts (the
    test_ngram_accepts_on_context_echo trick, batched)."""
    engine = engine_spec
    seed = engine.tokenizer.encode("ab ab ab", bos=True)
    cont, _ = engine.generate(seed, num_steps=48, temperature=0.0)
    prompts = [seed + cont[:32], seed + cont[:24],
               engine.tokenizer.encode("xyz", bos=True)]
    n = 12

    want = []
    for p in prompts:
        out, _ = engine.generate(p, num_steps=n, temperature=0.0)
        want.append(out)

    sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                           spec_k=4, spec_rounds=2)
    reqs = [Request(prompt_tokens=list(p), max_new_tokens=n,
                    temperature=0.0) for p in prompts]
    for r in reqs:
        sched.submit(r)
    sched.run()
    for r, expect in zip(reqs, want):
        assert r.out_tokens == expect, (r.out_tokens, expect)
    assert sched.spec_stats["dispatches"] >= 1
    assert sched.spec_stats["accepted"] >= 1  # echo prompts drafted well


def test_spec_serving_window_fallback(engine):
    """Slots near the ring-window edge force plain-decode fallback; greedy
    outputs stay identical through the transition (window = 32 here, so a
    long generation crosses it)."""
    p = engine.tokenizer.encode("ab ab ab", bos=True)
    n = 30                                # crosses window 32 with prompt
    want, _ = engine.generate(p, num_steps=n, temperature=0.0)
    sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                           spec_k=3, spec_rounds=2)
    r = Request(prompt_tokens=list(p), max_new_tokens=n, temperature=0.0)
    sched.submit(r)
    sched.run()
    assert r.out_tokens == want


def test_spec_serving_sampled_runs(engine):
    """Sampled slots coexist with greedy slots in one spec dispatch."""
    sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                           spec_k=3, spec_rounds=2)
    reqs = [Request(prompt_tokens=engine.tokenizer.encode("ab ab", bos=True),
                    max_new_tokens=8, temperature=0.9, top_p=0.9),
            Request(prompt_tokens=engine.tokenizer.encode("ba", bos=True),
                    max_new_tokens=8, temperature=0.0)]
    for r in reqs:
        sched.submit(r)
    sched.run()
    for r in reqs:
        assert 1 <= len(r.out_tokens) <= 8
        assert all(0 <= t < engine.cfg.vocab_size for t in r.out_tokens)
    # the greedy slot must still match plain decode exactly
    want, _ = engine.generate(reqs[1].prompt_tokens, num_steps=8,
                              temperature=0.0)
    assert reqs[1].out_tokens == want


def test_spec_serving_warmup_and_admission_interleave(engine):
    """warmup() + more requests than slots: slot reuse, admissions
    interleaving with spec dispatches, all greedy-exact."""
    prompts = ["ab ab ab", "ba", "ab", "q"]
    want = []
    for p in prompts:
        toks = engine.tokenizer.encode(p, bos=True)
        out, _ = engine.generate(toks, num_steps=5, temperature=0.0)
        want.append(out)
    sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                           spec_k=3, spec_rounds=2)
    sched.warmup()
    reqs = [Request(prompt_tokens=engine.tokenizer.encode(p, bos=True),
                    max_new_tokens=5, temperature=0.0) for p in prompts]
    for r in reqs:
        sched.submit(r)
    sched.run()
    for r, expect in zip(reqs, want):
        assert r.out_tokens == expect, (r.out_tokens, expect)


def test_spec_rejects_bad_combos(engine):
    with pytest.raises(ValueError):
        BatchScheduler(engine, batch_size=2, spec="medusa")
    if len(jax.devices()) >= 8:
        from deepseek_tpu.parallel import make_mesh
        with pytest.raises(ValueError):
            BatchScheduler(engine, batch_size=2, spec="ngram",
                           mesh=make_mesh(data=2, seq=2))


def test_spec_serving_with_logprobs(engine_spec):
    """VERDICT r4 #5b: spec='ngram' composes with logprobs — accepted
    tokens' raw log-softmax values come from the verify chunks and match
    an independent re-score of the full sequence."""
    engine = engine_spec
    seed = engine.tokenizer.encode("ab ab ab", bos=True)
    cont, _ = engine.generate(seed, num_steps=48, temperature=0.0)
    p = seed + cont[:32]
    n = 10

    base = BatchScheduler(engine, batch_size=2, spec="ngram",
                          spec_k=4, spec_rounds=2)
    r0 = Request(prompt_tokens=list(p), max_new_tokens=n, temperature=0.0)
    base.submit(r0)
    base.run()

    sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                           spec_k=4, spec_rounds=2, logprobs=True)
    r = Request(prompt_tokens=list(p), max_new_tokens=n, temperature=0.0,
                logprobs=True)
    sched.submit(r)
    sched.run()
    assert sched.spec_stats["accepted"] >= 1   # the spec path actually ran

    assert r.out_tokens == r0.out_tokens       # logprobs change nothing
    assert len(r.out_logprobs) == len(r.out_tokens)
    assert all(lp <= 0.0 for lp in r.out_logprobs)

    seq = list(p) + r.out_tokens
    cache = engine.new_cache(batch=1)
    _, _, lps, _ = engine.hydrate(cache, seq[:-1], 0,
                                  target_tokens=seq[1:])
    want = np.asarray(lps)[len(p) - 1:]
    np.testing.assert_allclose(r.out_logprobs, want, atol=2e-2)


def test_spec_serving_dp_mesh_matches_unsharded(engine_spec):
    """VERDICT r4 #5a: spec='ngram' continuous batching over a data-
    sharded mesh — greedy outputs match the single-device spec scheduler,
    and the fused rounds actually dispatch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deepseek_tpu.parallel import make_mesh

    engine = engine_spec
    seed = engine.tokenizer.encode("ab ab ab", bos=True)
    cont, _ = engine.generate(seed, num_steps=48, temperature=0.0)
    prompts = [seed + cont[:32], seed + cont[:24]]
    n = 10

    def run(mesh):
        sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                               spec_k=4, spec_rounds=2, mesh=mesh)
        reqs = [Request(prompt_tokens=list(p), max_new_tokens=n,
                        temperature=0.0) for p in prompts]
        for r in reqs:
            sched.submit(r)
        sched.run()
        assert sched.spec_stats["dispatches"] >= 1
        return [r.out_tokens for r in reqs]

    want = run(None)
    got = run(make_mesh(data=2, tensor=2))
    assert got == want


def test_spec_serving_composes_with_prefix_cache(engine_spec):
    """Prefix-cache admissions + spec decode in one scheduler: greedy
    outputs stay exact and the cache registers its hit."""
    engine = engine_spec
    seed = engine.tokenizer.encode("ab ab ab", bos=True)
    cont, _ = engine.generate(seed, num_steps=24, temperature=0.0)
    p = seed + cont[:16]
    want, _ = engine.generate(p, num_steps=6, temperature=0.0)
    sched = BatchScheduler(engine, batch_size=2, spec="ngram",
                           spec_k=3, spec_rounds=2,
                           prefix_cache_mb=8.0, prefix_block=4)
    for _ in range(2):
        r = Request(prompt_tokens=list(p), max_new_tokens=6,
                    temperature=0.0)
        sched.submit(r)
        sched.run()
        assert r.out_tokens == want
    assert sched.prefix_cache.stats["hits"] == 1


def test_prefix_restore_dispatch_count_is_logarithmic(engine):
    """VERDICT r4 #7: restoring an N-block chain must cost O(log N) jitted
    dispatches (power-of-2 chunked write_many), not one per block — each
    dispatch is a full device round trip on the TTFT path. Also pins that
    the chunked restore equals the block-by-block restore exactly."""
    from deepseek_tpu.serving import PrefixCache

    prompt = engine.tokenizer.encode(
        "one two three four five six seven eight nine ten eleven twelve",
        bos=True)[:20]               # within the 32-slot ring window
    pc = PrefixCache(block_tokens=2, budget_mb=8.0)
    cache = engine.new_cache()
    cache, _, _, _ = engine.hydrate(cache, prompt, 0)
    pc.insert(prompt, cache)
    reused, frags = pc.match(prompt)
    n_blocks = len(frags)
    assert n_blocks >= 5                      # needs a non-power-of-2 chain

    calls = {"many": 0}
    real_many = pc._write_many

    def counting_many(c, fr, off):
        calls["many"] += 1
        return real_many(c, fr, off)

    pc._write_many = counting_many
    restored = pc.restore(engine.new_cache(), frags)
    assert calls["many"] == bin(n_blocks).count("1")   # popcount dispatches

    # equality vs the one-block-per-dispatch path
    ref = engine.new_cache()
    for j, frag in enumerate(frags):
        ref = pc._write(ref, frag, jnp.int32(j * pc.block))
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def engine_mtp(tmp_path_factory):
    """MTP-equipped checkpoint with a window wide enough for fused spec
    spans (the batched MTP rounds need pos + R*(k+1) + 1 < window)."""
    import os

    from deepseek_tpu import convert as cv
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config(dim=64, hidden=96, q_lora=48, kv_lora=32, nope=16,
                    rope=16, v_dim=16, layers=2, vocab=300)
    cfg["rope_scaling"]["original_max_position_embeddings"] = 128  # window
    d = str(tmp_path_factory.mktemp("srvmtp"))
    hf_dir = os.path.join(d, "hf")
    write_hf_dir(hf_dir, cfg, hf_weights(cfg, seed=9, scale=0.15, mtp=True))
    out = os.path.join(d, "ck")
    cv.convert(hf_dir, out, quant="fp32", use_mla=True)
    return Engine(out, seed=0, prefill_chunk=8, decode_block=1)


def test_mtp_serving_greedy_matches_plain(engine_mtp):
    """VERDICT r4 #5c: spec='mtp' continuous batching is lossless — greedy
    outputs through the MTP-drafting scheduler are token-identical to the
    plain scheduler across slot reuse, and the fused rounds dispatch."""
    engine = engine_mtp
    prompts = [engine.tokenizer.encode(t, bos=True)
               for t in ("ab", "ba xy", "q")]
    n = 10

    want = []
    for p in prompts:
        out, _ = engine.generate(p, num_steps=n, temperature=0.0)
        want.append(out)

    sched = BatchScheduler(engine, batch_size=2, spec="mtp",
                           spec_k=2, spec_rounds=2)
    reqs = [Request(prompt_tokens=list(p), max_new_tokens=n,
                    temperature=0.0) for p in prompts]
    for r in reqs:
        sched.submit(r)
    sched.run()
    for r, expect in zip(reqs, want):
        assert r.out_tokens == expect, (r.out_tokens, expect)
    assert sched.spec_stats["dispatches"] >= 1


def test_mtp_serving_with_logprobs(engine_mtp):
    """spec='mtp' composes with per-token logprobs (verify-chunk gather)."""
    engine = engine_mtp
    p = engine.tokenizer.encode("ab", bos=True)
    n = 8
    sched = BatchScheduler(engine, batch_size=2, spec="mtp",
                           spec_k=2, spec_rounds=2, logprobs=True)
    r = Request(prompt_tokens=list(p), max_new_tokens=n, temperature=0.0,
                logprobs=True)
    sched.submit(r)
    sched.run()
    assert len(r.out_logprobs) == len(r.out_tokens)
    assert all(lp <= 0.0 for lp in r.out_logprobs)

    seq = list(p) + r.out_tokens
    cache = engine.new_cache(batch=1)
    _, _, lps, _ = engine.hydrate(cache, seq[:-1], 0,
                                  target_tokens=seq[1:])
    want = np.asarray(lps)[len(p) - 1:]
    np.testing.assert_allclose(r.out_logprobs, want, atol=2e-2)


def test_mtp_serving_rejects_without_module(engine):
    with pytest.raises(ValueError):
        BatchScheduler(engine, batch_size=2, spec="mtp")


def test_mtp_serving_sampled_runs(engine_mtp):
    """Sampled slots through the batched MTP rounds: valid tokens, correct
    count (the vmapped full-q acceptance path at temperature > 0)."""
    engine = engine_mtp
    sched = BatchScheduler(engine, batch_size=2, spec="mtp",
                           spec_k=2, spec_rounds=2)
    reqs = [Request(prompt_tokens=engine.tokenizer.encode(t, bos=True),
                    max_new_tokens=8, temperature=0.8, top_p=0.9)
            for t in ("ab", "xy")]
    for r in reqs:
        sched.submit(r)
    sched.run()
    for r in reqs:
        assert 1 <= len(r.out_tokens) <= 8
        assert all(0 <= t < engine.cfg.vocab_size for t in r.out_tokens)
    assert sched.spec_stats["dispatches"] >= 1


def test_serving_mixed_workload_soak(engine_spec):
    """Integration soak: one spec='ngram' scheduler with logprobs enabled
    digests a mixed queue — greedy, sampled, stop-sequence, logprobs
    requests of different lengths — across repeated slot reuse. Greedy
    requests must match their individual runs token-for-token; everything
    terminates; stats stay consistent."""
    engine = engine_spec
    seed = engine.tokenizer.encode("ab ab ab", bos=True)
    cont, _ = engine.generate(seed, num_steps=32, temperature=0.0)
    echo = seed + cont[:24]

    sched = BatchScheduler(engine, batch_size=2, spec="ngram", spec_k=3,
                           spec_rounds=2, logprobs=True,
                           prefix_cache_mb=4.0, prefix_block=4)
    reqs = []
    for i in range(10):
        kind = i % 4
        if kind == 0:      # greedy echo (speculation-friendly)
            r = Request(prompt_tokens=list(echo), max_new_tokens=6,
                        temperature=0.0)
        elif kind == 1:    # sampled
            r = Request(prompt_tokens=engine.tokenizer.encode(
                f"x{i}", bos=True), max_new_tokens=5, temperature=0.9,
                top_p=0.9, top_k=8)
        elif kind == 2:    # greedy + logprobs
            r = Request(prompt_tokens=list(echo), max_new_tokens=4,
                        temperature=0.0, logprobs=True)
        else:              # greedy + stop (likely no match; exercises scan)
            r = Request(prompt_tokens=engine.tokenizer.encode(
                f"y{i}", bos=True), max_new_tokens=5, temperature=0.0,
                stop=["\x00zz"])
        sched.submit(r)
        reqs.append(r)
    sched.run()

    want6, _ = engine.generate(list(echo), num_steps=6, temperature=0.0)
    want4, _ = engine.generate(list(echo), num_steps=4, temperature=0.0)
    for i, r in enumerate(reqs):
        assert r.done
        assert 1 <= len(r.out_tokens) <= 6
        if i % 4 == 0:
            assert r.out_tokens == want6
        if i % 4 == 2:
            assert r.out_tokens == want4[:len(r.out_tokens)]
            assert len(r.out_logprobs) == len(r.out_tokens)
    st = sched.spec_stats
    assert st["accepted"] <= st["drafted"]


def test_idle_block_escalation_matches_plain(engine):
    """idle_block escalation: with an empty queue the scheduler runs long
    decode blocks; outputs must be token-identical to the small-block
    scheduler, and escalation must actually engage (and de-escalate when
    a queue forms or a slot nears its budget)."""
    toks = engine.tokenizer.encode("hello world", bos=True)
    want, _ = engine.generate(toks, num_steps=12, temperature=0.0)

    sched = BatchScheduler(engine, batch_size=2, decode_block=2,
                           idle_block=8)
    r = Request(prompt_tokens=list(toks), max_new_tokens=12,
                temperature=0.0)
    sched.submit(r)
    picked = []
    real_pick = sched._pick_block
    sched._pick_block = lambda: picked.append(real_pick()) or picked[-1]
    while sched.has_work:
        sched.step()
    assert r.out_tokens == want
    assert 8 in picked                    # escalated while idle
    # de-escalated once the slot neared its budget (ignore trailing picks
    # from the empty-batch teardown step)
    assert 2 in picked[picked.index(8) + 1:]

    # queued work disables escalation
    sched2 = BatchScheduler(engine, batch_size=1, decode_block=2,
                            idle_block=8)
    sched2.submit(Request(prompt_tokens=list(toks), max_new_tokens=12,
                          temperature=0.0))
    sched2.submit(Request(prompt_tokens=list(toks), max_new_tokens=4,
                          temperature=0.0))
    sched2.step()                          # admits first; second queued
    assert sched2.queue and sched2._pick_block() == 2
