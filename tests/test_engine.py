import numpy as np
import jax.numpy as jnp
import pytest

from deepseek_tpu.engine import Engine
from deepseek_tpu.utils import codec
from tests.util_tinymodel import (
    tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=24)
    codec.save_checkpoint(
        str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 42))],
        tiny_metadata(cfg))
    return str(d)


@pytest.fixture(scope="module")
def engine(ckpt_dir):
    return Engine(ckpt_dir, seed=0, prefill_chunk=8)


def test_generate_greedy_deterministic(engine):
    toks = engine.tokenizer.encode("hello", bos=True)
    out1, st = engine.generate(toks, num_steps=6, temperature=0.0)
    out2, _ = engine.generate(toks, num_steps=6, temperature=0.0)
    assert out1 == out2
    assert st.prompt_tokens == len(toks)
    assert 0 < st.generated_tokens <= 6
    assert st.active_bytes_per_token > 0


def test_hydrate_chunked_equals_stepwise(engine):
    """Chunked/padded hydrate must produce the same logits as pure decode."""
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 250, size=11).tolist()  # 11 = chunk(8) + partial(3)
    cache = engine.new_cache()
    cache, logits, _, pos = engine.hydrate(cache, tokens, 0)
    assert pos == len(tokens)

    step = engine.fwd(False, "last")
    cache2 = engine.new_cache()
    want = None
    for p, t in enumerate(tokens):
        out, cache2 = step(engine.params, cache2, jnp.asarray([[t]], jnp.int32), p)
        want = np.asarray(out[0])
    np.testing.assert_allclose(logits, want, rtol=1e-4, atol=1e-4)


def test_hydrate_past_window_equals_stepwise(engine):
    """Prompt longer than the 24-slot window: prefill + ring decode fallback."""
    rng = np.random.default_rng(1)
    tokens = rng.integers(3, 250, size=40).tolist()
    cache = engine.new_cache()
    cache, logits, _, _ = engine.hydrate(cache, tokens, 0)

    step = engine.fwd(False, "last")
    cache2 = engine.new_cache()
    want = None
    for p, t in enumerate(tokens):
        out, cache2 = step(engine.params, cache2, jnp.asarray([[t]], jnp.int32), p)
        want = np.asarray(out[0])
    np.testing.assert_allclose(logits, want, rtol=2e-3, atol=2e-3)


def test_hydrate_near_window_stays_chunked(ckpt_dir):
    """A prompt ending just inside the 24-slot window must hydrate with
    boundary-clamped prefill chunks (min(C, window - pos)), not collapse to
    one-token decode dispatches (each a full round trip on real hardware)."""
    eng = Engine(ckpt_dir, seed=0, prefill_chunk=16)
    rng = np.random.default_rng(5)
    tokens = rng.integers(3, 250, size=21).tolist()  # ends at window-3

    calls = []
    orig = eng.fwd

    def counting_fwd(prefill, mode):
        f = orig(prefill, mode)

        def wrapped(*a, **k):
            calls.append(prefill)
            return f(*a, **k)
        return wrapped

    eng.fwd = counting_fwd
    cache, logits, _, pos = eng.hydrate(eng.new_cache(), tokens, 0)
    assert pos == len(tokens)
    # chunk 16 then the clamped 8-slot boundary chunk — no decode fallback
    assert calls == [True, True], calls

    step = orig(False, "last")
    cache2 = eng.new_cache()
    want = None
    for p, t in enumerate(tokens):
        out, cache2 = step(eng.params, cache2, jnp.asarray([[t]], jnp.int32), p)
        want = np.asarray(out[0])
    np.testing.assert_allclose(logits, want, rtol=1e-4, atol=1e-4)


def test_perplexity_matches_stepwise(engine):
    rng = np.random.default_rng(2)
    tokens = rng.integers(3, 250, size=13).tolist()
    ppl, err, n = engine.perplexity(tokens)
    assert n == len(tokens) - 1

    # independent computation via raw decode steps + numpy softmax
    step = engine.fwd(False, "last")
    cache = engine.new_cache()
    s = 0.0
    for p in range(len(tokens) - 1):
        out, cache = step(engine.params, cache, jnp.asarray([[tokens[p]]], jnp.int32), p)
        logits = np.asarray(out[0], np.float64)
        e = np.exp(logits - logits.max())
        prob = e[tokens[p + 1]] / e.sum()
        s += -np.log(prob)
    want_ppl = np.exp(s / n)
    np.testing.assert_allclose(ppl, want_ppl, rtol=1e-3)
    assert err > 0


def test_fused_projections_match_unfused(ckpt_dir):
    """loader.fuse_projections ([w1;w3], [wq_rope_b;wc], [wkv_a;wq_a]) is a
    pure layout change: greedy tokens and perplexity match the unfused
    engine, and unfuse_projections round-trips exactly."""
    import jax
    import jax.numpy as jnp
    from deepseek_tpu.models.loader import fuse_projections, unfuse_projections

    e_fused = Engine(ckpt_dir, seed=0, prefill_chunk=8)           # default
    e_plain = Engine(ckpt_dir, seed=0, prefill_chunk=8, fuse=False)
    lp = e_fused.params.layers[0]
    assert lp.wcr is not None and lp.wkvq is not None and lp.wc is None

    toks = e_plain.tokenizer.encode("hello world", bos=True)
    out1, _ = e_plain.generate(toks, num_steps=8, temperature=0.0)
    out2, _ = e_fused.generate(toks, num_steps=8, temperature=0.0)
    assert out1 == out2
    p1 = e_plain.perplexity(toks + out1)[0]
    p2 = e_fused.perplexity(toks + out1)[0]
    np.testing.assert_allclose(p2, p1, rtol=1e-4)

    # exact unfuse round trip
    back = unfuse_projections(e_fused.params, e_fused.cfg)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(e_plain.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_session_save_resume_matches_uninterrupted(ckpt_dir, tmp_path):
    """save_session after hydrate + a few decode steps, reload in a FRESH
    engine, continue — greedy output must equal the uninterrupted run
    (ring/sink state and positions persist exactly)."""
    eng = Engine(ckpt_dir, seed=0, prefill_chunk=8)
    prompt = eng.tokenizer.encode("hello world", bos=True)
    want, _ = eng.generate(prompt, num_steps=8, temperature=0.0)

    # interrupted run: hydrate, decode 3 tokens, persist
    cache = eng.new_cache()
    cache, logits, _, pos = eng.hydrate(cache, prompt, 0)
    out = []
    tok = int(np.argmax(logits))
    out.append(tok)
    step = eng.fwd(False, "last")
    for _ in range(2):
        lg, cache = step(eng.params, cache,
                         jnp.asarray([[tok]], jnp.int32), pos)
        pos += 1
        tok = int(np.argmax(np.asarray(lg[0])))
        out.append(tok)
    sess = str(tmp_path / "session.dseek")
    eng.save_session(sess, cache, pos, tokens=prompt + out)

    # fresh engine resumes and finishes the generation
    eng2 = Engine(ckpt_dir, seed=0, prefill_chunk=8)
    cache2, pos2, toks2 = eng2.load_session(sess)
    assert pos2 == pos and toks2 == prompt + out
    step2 = eng2.fwd(False, "last")
    tok = out[-1]
    for _ in range(len(want) - len(out)):
        lg, cache2 = step2(eng2.params, cache2,
                           jnp.asarray([[tok]], jnp.int32), pos2)
        pos2 += 1
        tok = int(np.argmax(np.asarray(lg[0])))
        out.append(tok)
    assert out == want

    # incompatible config fails loudly
    eng3 = Engine(ckpt_dir, seed=0, prefill_chunk=8, context=16)
    with pytest.raises(ValueError, match="incompatible"):
        eng3.load_session(sess)


def test_cli_completion_smoke(ckpt_dir, capsys):
    from deepseek_tpu.cli import main
    main([ckpt_dir, "-m", "completion", "-i", "hi", "-n", "3", "-t", "0",
          "--chunk", "8", "--seed", "1"])
    out = capsys.readouterr().out
    assert "Generation stats" in out and "throughput" in out


def test_cli_perplexity_smoke(ckpt_dir, capsys):
    from deepseek_tpu.cli import main
    main([ckpt_dir, "-m", "perplexity", "-i", "hello world test", "--chunk", "8"])
    out = capsys.readouterr().out
    assert "perplexity:" in out


def test_cli_rejects_bad_flags(ckpt_dir):
    from deepseek_tpu.cli import main
    with pytest.raises(SystemExit):
        main([ckpt_dir, "-m", "completion"])  # no prompt
    with pytest.raises(SystemExit):
        main([ckpt_dir, "-m", "nope"])
    with pytest.raises(SystemExit):
        main([ckpt_dir, "-m", "perplexity", "-i", "a", "-w"])  # two sources


def test_debug_capture_and_diff(engine, tmp_path):
    """Activation-diff harness (DEBUG_MODEL parity): captures layerwise
    activations in eager mode, round-trips through safetensors, diffs."""
    import jax.numpy as jnp
    from deepseek_tpu.models import init_cache, make_forward
    from deepseek_tpu.utils.debug import DebugCapture, debug_capture

    fwd = make_forward(engine.cfg, prefill=False, logits_mode="last", jit=False)
    tok = jnp.asarray([[5]], jnp.int32)
    with debug_capture() as cap:
        fwd(engine.params, init_cache(engine.cfg, 1), tok, 0)
    assert "embed" in cap.tensors and "logits" in cap.tensors
    assert "l0.attn" in cap.tensors and "l2.ffn" in cap.tensors

    path = str(tmp_path / "acts.safetensors")
    cap.save(path)
    cap2 = DebugCapture.load(path)
    errs = cap.max_err(cap2)
    assert errs and all(v == 0.0 for v in errs.values())

    # a second capture from an identical run diffs to zero too
    with debug_capture() as cap3:
        fwd(engine.params, init_cache(engine.cfg, 1), tok, 0)
    assert max(cap.max_err(cap3).values()) == 0.0


def test_profile_scopes_capture_hot_paths(ckpt_dir, capsys):
    """DSEEK_PROFILE parity: scoped timers cover hydrate + decode, and the
    CLI dumps the aggregate at the end of a completion run."""
    from deepseek_tpu.utils import profiling

    profiling.reset_profile()
    profiling.enable_profiling(True)
    try:
        from deepseek_tpu.cli import main
        main([ckpt_dir, "-i", "hi there", "-n", "3", "-t", "0",
              "--chunk", "8", "--seed", "1"])
    finally:
        profiling.enable_profiling(False)
    rep = profiling.profile_report()
    assert any(k.startswith("hydrate.") for k in rep)
    assert any(k.startswith("generate.") for k in rep)
    out = capsys.readouterr().out
    assert "Profile total times" in out
