"""HTTP serving daemon: health, completion, streaming, concurrency."""

import json
import threading
import urllib.request

import pytest

from deepseek_tpu.server import Server

from tests.test_engine import ckpt_dir, engine  # noqa: F401 — fixtures


@pytest.fixture(scope="module")
def served(engine):
    srv = Server(engine, batch_size=2)
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", srv
    httpd.shutdown()
    srv.shutdown()


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url + "/v1/completions", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_health(served):
    url, _ = served
    with urllib.request.urlopen(url + "/health", timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["n_layers"] >= 1


def test_completion(served):
    url, srv = served
    with _post(url, {"prompt": "ab", "max_tokens": 4,
                     "temperature": 0.0}) as r:
        body = json.loads(r.read())
    assert body["completion_tokens"] == len(body["tokens"])
    assert 1 <= body["completion_tokens"] <= 4
    # greedy determinism against the engine directly
    toks = srv.engine.tokenizer.encode("ab", bos=True)
    want, _ = srv.engine.generate(toks, num_steps=4, temperature=0.0)
    assert body["tokens"] == want


def test_streaming(served):
    url, _ = served
    with _post(url, {"prompt": "ab", "max_tokens": 3, "temperature": 0.0,
                     "stream": True}) as r:
        lines = [l for l in r.read().decode().splitlines() if l.startswith("data: ")]
    assert lines[-1] == "data: [DONE]"
    pieces = [json.loads(l[6:])["text"] for l in lines[:-1]]
    assert 1 <= len(pieces) <= 3


def test_concurrent_requests(served):
    url, _ = served
    results = {}

    def go(name, prompt):
        with _post(url, {"prompt": prompt, "max_tokens": 3,
                         "temperature": 0.0}) as r:
            results[name] = json.loads(r.read())

    threads = [threading.Thread(target=go, args=(i, p))
               for i, p in enumerate(["ab", "ba", "aa"])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3
    for body in results.values():
        assert body["completion_tokens"] >= 1


def test_stop_sequence_over_http(served):
    url, srv = served
    # baseline greedy text
    with _post(url, {"prompt": "ab", "max_tokens": 8,
                     "temperature": 0.0}) as r:
        base = json.loads(r.read())
    assert base["finish_reason"] == "length"
    full = base["text"]
    assert len(full) > 3
    stop = full[len(full) // 2:len(full) // 2 + 2]
    with _post(url, {"prompt": "ab", "max_tokens": 8,
                     "temperature": 0.0, "stop": stop}) as r:
        body = json.loads(r.read())
    assert body["finish_reason"] == "stop"
    assert stop not in body["text"]
    assert full.startswith(body["text"])

    # invalid stop type -> 400
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"prompt": "ab", "stop": 5}).read()
    assert e.value.code == 400


def test_prefix_cache_hits_over_http(served):
    """Server default enables the prompt-prefix cache; repeated
    shared-prefix prompts register hits in /health and outputs stay
    greedy-identical across the hit."""
    url, srv = served
    assert srv.scheduler.prefix_cache is not None
    prompt = "hello world abc xyz"
    bodies = []
    for tail in (" one", " two", " one"):
        with _post(url, {"prompt": prompt + tail, "max_tokens": 3,
                         "temperature": 0.0}) as r:
            bodies.append(json.loads(r.read()))
    assert bodies[0]["tokens"] == bodies[2]["tokens"]
    with urllib.request.urlopen(url + "/health", timeout=60) as r:
        health = json.loads(r.read())
    pc = health["prefix_cache"]
    assert pc["hits"] >= 1 and pc["tokens_reused"] >= 1


def test_top_k_one_is_greedy_over_http(served):
    url, srv = served
    with _post(url, {"prompt": "ab", "max_tokens": 4,
                     "temperature": 1.0, "top_k": 1}) as r:
        body = json.loads(r.read())
    toks = srv.engine.tokenizer.encode("ab", bos=True)
    want, _ = srv.engine.generate(toks, num_steps=4, temperature=0.0)
    assert body["tokens"] == want


def test_logprobs_over_http(served):
    url, _ = served
    with _post(url, {"prompt": "ab", "max_tokens": 4, "temperature": 0.0,
                     "logprobs": True}) as r:
        body = json.loads(r.read())
    assert len(body["logprobs"]) == len(body["tokens"])
    assert all(isinstance(x, float) and x <= 0.0 for x in body["logprobs"])
    # not requested -> absent
    with _post(url, {"prompt": "ab", "max_tokens": 2,
                     "temperature": 0.0}) as r:
        body = json.loads(r.read())
    assert "logprobs" not in body


def test_spec_serving_over_http(engine):
    """-m serve --serve-spec equivalent: greedy completions match the
    plain server token-for-token and /health reports spec stats."""
    srv = Server(engine, batch_size=2, warmup=False, spec="ngram",
                 spec_k=3, spec_rounds=2)
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        with _post(url, {"prompt": "ab", "max_tokens": 4,
                         "temperature": 0.0}) as r:
            body = json.loads(r.read())
        toks = srv.engine.tokenizer.encode("ab", bos=True)
        want, _ = srv.engine.generate(toks, num_steps=4, temperature=0.0)
        assert body["tokens"] == want
        with urllib.request.urlopen(url + "/health", timeout=60) as r:
            health = json.loads(r.read())
        assert "spec" in health
    finally:
        httpd.shutdown()
        srv.shutdown()


def test_spec_server_serves_logprobs(engine):
    """VERDICT r4 #5b: --serve-spec composes with the per-request
    logprobs field (values ride the fused verify chunks)."""
    srv = Server(engine, batch_size=2, warmup=False, spec="ngram")
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        out = json.load(_post(
            f"http://127.0.0.1:{port}",
            {"prompt": "ab", "max_tokens": 3, "temperature": 0,
             "logprobs": True}))
        assert len(out["logprobs"]) == len(out["tokens"]) == 3
        assert all(lp <= 0.0 for lp in out["logprobs"])
    finally:
        httpd.shutdown()
        srv.shutdown()
