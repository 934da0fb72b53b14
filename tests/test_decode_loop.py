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
