import jax
import jax.numpy as jnp
import numpy as np

from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.ops.sampling import sample_token

from tests.test_model import build
from tests.util_tinymodel import tiny_config


def test_device_sampling_greedy_and_nucleus():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[1.0, 5.0, 0.0, 4.9]], jnp.float32)
    # temperature 0 -> argmax
    assert int(sample_token(logits, key, 0.0, 0.95)[0]) == 1
    # tight nucleus: top token holds ~97% mass, must always win
    big = jnp.asarray([[10.0, 6.0, 0.0, 0.0]], jnp.float32)
    for i in range(20):
        k = jax.random.PRNGKey(i)
        assert int(sample_token(big, k, 1.0, 0.5)[0]) == 0


def test_device_sampling_distribution():
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]], jnp.float32))
    counts = np.zeros(3)
    key = jax.random.PRNGKey(42)
    f = jax.jit(lambda l, k: sample_token(l, k, 1.0, 1.0))
    for _ in range(2000):
        key, sub = jax.random.split(key)
        counts[int(f(logits, sub)[0])] += 1
    np.testing.assert_allclose(counts / 2000, [0.6, 0.3, 0.1], atol=0.06)


def test_decode_loop_greedy_matches_stepwise():
    cfg = tiny_config(use_mla=True)
    wd, params = build(cfg, seed=30)
    step = make_forward(cfg, prefill=False, logits_mode="last")
    loop = make_decode_loop(cfg, n_steps=5)

    # stepwise greedy from token 7 at pos 0
    cache = init_cache(cfg, batch=1)
    tok = 7
    want = []
    for pos in range(5):
        lg, cache = step(params, cache, jnp.asarray([[tok]], jnp.int32), pos)
        tok = int(np.argmax(np.asarray(lg)[0]))
        want.append(tok)

    cache2 = init_cache(cfg, batch=1)
    toks, last_logits, cache2 = loop(
        params, cache2, jnp.asarray([[7]], jnp.int32), 0,
        jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(1.0))
    got = np.asarray(toks)[0].tolist()
    assert got == want
    # caches agree afterwards
    np.testing.assert_allclose(
        np.asarray(cache2.ckv), np.asarray(cache.ckv), rtol=1e-3, atol=1e-3)


def test_engine_block_decode_matches_stepwise(tmp_path):
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.utils import codec
    from tests.util_tinymodel import (
        tiny_checkpoint_tensors, tiny_metadata, tiny_weights)
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=64)
    codec.save_checkpoint(
        str(tmp_path), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 31))],
        tiny_metadata(cfg))
    e_block = Engine(str(tmp_path), seed=0, prefill_chunk=8, decode_block=4)
    e_step = Engine(str(tmp_path), seed=0, prefill_chunk=8, decode_block=1)
    prompt = e_block.tokenizer.encode("hello", bos=True)
    out1, _ = e_block.generate(prompt, num_steps=9, temperature=0.0)
    out2, _ = e_step.generate(prompt, num_steps=9, temperature=0.0)
    assert out1 == out2


def test_decode_loop_active_mask_parity():
    """Inactive rows (continuous-batching idle slots) must not change the
    active rows' tokens: their routing collapses to expert 0 / weight 0
    (deepseek._ffn active mask) while everything else runs batched."""
    cfg = tiny_config(use_mla=True)
    wd, params = build(cfg, seed=33)
    loop = make_decode_loop(cfg, n_steps=4)

    key = jax.random.PRNGKey(1)
    args = (key, jnp.float32(0.0), jnp.float32(1.0))

    cache1 = init_cache(cfg, batch=2)
    toks_all, _, _ = loop(params, cache1,
                          jnp.asarray([[7], [9]], jnp.int32),
                          jnp.asarray([0, 0], jnp.int32), *args)

    cache2 = init_cache(cfg, batch=2)
    toks_mask, _, _ = loop(params, cache2,
                           jnp.asarray([[7], [123]], jnp.int32),
                           jnp.asarray([0, 0], jnp.int32), *args,
                           jnp.asarray([True, False]))
    # row 0 (active) decodes identically despite the garbage row 1
    assert np.asarray(toks_all)[0].tolist() == \
        np.asarray(toks_mask)[0].tolist()
    # masked garbage row still produces finite logits (no NaN poisoning)
    assert np.isfinite(np.asarray(toks_mask)).all()


def test_scheduler_low_occupancy_active_mask():
    """BatchScheduler at batch 4 with one request: idle slots are masked
    and the request's greedy output matches Engine.generate."""
    import tempfile
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.serving import BatchScheduler, Request
    from deepseek_tpu.utils import codec
    from tests.util_tinymodel import (
        tiny_checkpoint_tensors, tiny_metadata, tiny_weights)
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=64)
    with tempfile.TemporaryDirectory() as d:
        codec.save_checkpoint(
            str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 35))],
            tiny_metadata(cfg))
        eng = Engine(str(d), seed=0, prefill_chunk=8, decode_block=2)
        prompt = eng.tokenizer.encode("hello world", bos=True)
        want, _ = eng.generate(prompt, num_steps=6, temperature=0.0)

        sched = BatchScheduler(eng, batch_size=4, decode_block=2)
        sched.submit(Request(prompt_tokens=list(prompt), max_new_tokens=6,
                             temperature=0.0))
        done = sched.run()
        assert len(done) == 1
        assert done[0].out_tokens[:6] == want[:6]


def test_decode_loop_active_bucket_truncation_parity():
    """active_bucket statically truncates the expert pair list to bucket*k;
    with one live row and bucket=1 the kept pairs are exactly that row's —
    greedy output must match the untruncated loop."""
    cfg = tiny_config(use_mla=True)
    wd, params = build(cfg, seed=34)
    key = jax.random.PRNGKey(2)
    args = (key, jnp.float32(0.0), jnp.float32(1.0))
    act = jnp.asarray([True, False, False, False])

    full = make_decode_loop(cfg, n_steps=4)
    c1 = init_cache(cfg, batch=4)
    toks_full, _, _ = full(params, c1, jnp.asarray([[7], [1], [2], [3]], jnp.int32),
                           jnp.zeros(4, jnp.int32), *args, act)

    trunc = make_decode_loop(cfg, n_steps=4, active_bucket=1)
    c2 = init_cache(cfg, batch=4)
    toks_tr, _, _ = trunc(params, c2, jnp.asarray([[7], [1], [2], [3]], jnp.int32),
                          jnp.zeros(4, jnp.int32), *args, act)
    assert np.asarray(toks_full)[0].tolist() == np.asarray(toks_tr)[0].tolist()
