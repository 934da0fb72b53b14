import numpy as np

from deepseek_tpu.sampler import Sampler, nucleus_probs


def test_argmax_when_temperature_zero():
    s = Sampler(vocab_size=5, seed=0)
    logits = np.array([0.1, 3.0, -1.0, 2.9, 0.0], dtype=np.float32)
    for _ in range(5):
        assert s.sample(logits, temperature=0.0) == 1


def test_sample_prob_is_softmax():
    s = Sampler(vocab_size=4, seed=0)
    logits = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    e = np.exp(logits - logits.max())
    p = e / e.sum()
    for i in range(4):
        np.testing.assert_allclose(s.sample_prob(i, logits), p[i], rtol=1e-6)


def test_nucleus_restricts_to_top_mass():
    s = Sampler(vocab_size=4, seed=123)
    # token 0 has ~97% of the mass; top_p=0.5 must always return it
    logits = np.array([10.0, 6.0, 0.0, 0.0], dtype=np.float32)
    for _ in range(50):
        assert s.sample(logits, temperature=1.0, top_p=0.5) == 0


def test_full_distribution_sampling_frequencies():
    s = Sampler(vocab_size=3, seed=7)
    logits = np.log(np.array([0.6, 0.3, 0.1], dtype=np.float32))
    counts = np.zeros(3)
    n = 4000
    for _ in range(n):
        counts[s.sample(logits, temperature=1.0, top_p=1.0)] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.05)


def test_host_device_nucleus_same_support():
    """The host nucleus_probs and the device _nucleus_mask must select the
    SAME keep set (incl. boundary ties), so decode_block=1 and
    decode_block>1 paths sample from the same distribution."""
    import jax.numpy as jnp
    from deepseek_tpu.ops.sampling import _nucleus_mask

    rng = np.random.default_rng(3)
    for trial in range(20):
        v = 64
        logits = rng.normal(size=v).astype(np.float32)
        # inject ties so the boundary case is exercised
        logits[10:14] = logits[10]
        temperature = float(rng.uniform(0.3, 1.5))
        top_p = float(rng.uniform(0.2, 0.95))

        host = nucleus_probs(logits, temperature, top_p)
        scaled = jnp.asarray(logits)[None] / temperature
        probs = np.asarray(jnp.exp(scaled - jnp.max(scaled)))
        probs = probs / probs.sum()
        dev_keep = np.asarray(_nucleus_mask(jnp.asarray(probs), top_p))[0]
        host_keep = host > 0
        assert (host_keep == dev_keep).all(), (
            trial, temperature, top_p,
            np.nonzero(host_keep != dev_keep))


def test_nucleus_keeps_boundary_ties():
    # three equiprobable tokens; top_p small enough that one would "cover"
    # the mass — ties at the cut must ALL be kept (device semantics)
    logits = np.log(np.array([0.3, 0.3, 0.3, 0.1], dtype=np.float32))
    p = nucleus_probs(logits, 1.0, 0.3)
    assert (p[:3] > 0).all() and p[3] == 0


def test_temperature_sharpens():
    s = Sampler(vocab_size=3, seed=11)
    logits = np.array([2.0, 1.0, 0.0], dtype=np.float32)
    cold = [s.sample(logits, temperature=0.1, top_p=1.0) for _ in range(200)]
    assert np.mean(np.array(cold) == 0) > 0.95


def test_top_k_keeps_k_highest():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=32).astype(np.float32)
    p = nucleus_probs(logits, temperature=1.0, top_p=1.0, top_k=5)
    assert (p > 0).sum() == 5
    kept = set(np.nonzero(p > 0)[0])
    assert kept == set(np.argsort(logits)[-5:])
    # k=1 == argmax regardless of temperature
    p1 = nucleus_probs(logits, temperature=2.0, top_p=1.0, top_k=1)
    assert np.argmax(p1) == np.argmax(logits) and (p1 > 0).sum() == 1
    # k >= vocab = off
    pall = nucleus_probs(logits, temperature=1.0, top_p=1.0, top_k=999)
    assert (pall > 0).all()


def test_min_p_threshold():
    logits = np.log(np.array([0.5, 0.3, 0.15, 0.05], np.float32))
    p = nucleus_probs(logits, temperature=1.0, top_p=1.0, min_p=0.25)
    # keeps tokens with prob >= 0.25 * 0.5 = 0.125: the first three
    assert (p > 0).tolist() == [True, True, True, False]
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-12)


def test_host_device_topk_minp_same_support():
    """Composed top-k/min-p/top-p keep sets must agree host vs device
    (same criterion as the nucleus agreement test above)."""
    import jax.numpy as jnp
    from deepseek_tpu.ops.sampling import _keep_mask

    rng = np.random.default_rng(7)
    for trial in range(20):
        v = 64
        logits = rng.normal(size=v).astype(np.float32)
        logits[20:23] = logits[20]                     # ties
        temperature = float(rng.uniform(0.3, 1.5))
        top_p = float(rng.uniform(0.3, 1.0))
        top_k = int(rng.integers(0, 12))               # 0 = off
        min_p = float(rng.choice([0.0, 0.02, 0.1]))

        host = nucleus_probs(logits, temperature, top_p, top_k, min_p)
        scaled = jnp.asarray(logits)[None] / temperature
        probs = np.asarray(jnp.exp(scaled - jnp.max(scaled)))
        probs = probs / probs.sum()
        dev_keep = np.asarray(_keep_mask(
            jnp.asarray(probs),
            jnp.full((1, 1), top_p, jnp.float32),
            jnp.full((1, 1), float(top_k), jnp.float32),
            jnp.full((1, 1), min_p, jnp.float32)))[0]
        host_keep = host > 0
        assert (host_keep == dev_keep).all(), (
            trial, temperature, top_p, top_k, min_p,
            np.nonzero(host_keep != dev_keep))


def test_device_sample_token_topk_per_slot():
    """Per-slot top_k in one batched sample_token call: slot 0 greedy,
    slot 1 top_k=1 (== argmax), slot 2 unrestricted."""
    import jax
    import jax.numpy as jnp
    from deepseek_tpu.ops.sampling import sample_token

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(3, 50)).astype(np.float32)
    toks = sample_token(
        jnp.asarray(logits), jax.random.PRNGKey(0),
        temperature=jnp.asarray([0.0, 1.0, 1.0], jnp.float32),
        top_p=jnp.ones((3,), jnp.float32),
        top_k=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        min_p=jnp.zeros((3,), jnp.float32))
    toks = np.asarray(toks)
    assert toks[0] == np.argmax(logits[0])
    assert toks[1] == np.argmax(logits[1])   # top_k=1 forces the argmax
    assert 0 <= toks[2] < 50
