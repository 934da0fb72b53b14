"""Chat templates: rendering, converter embedding, CLI/server surface."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from deepseek_tpu.chat import ChatTemplateError, render_chat

# a small HF-convention template exercising loops, role dispatch, bos/eos
# substitution, add_generation_prompt, and raise_exception
TPL = (
    "{{ bos_token }}"
    "{% for m in messages %}"
    "{% if m.role == 'system' %}[SYS]{{ m.content }}[/SYS]"
    "{% elif m.role == 'user' %}<U>{{ m.content }}</U>"
    "{% elif m.role == 'assistant' %}<A>{{ m.content }}{{ eos_token }}"
    "{% else %}{{ raise_exception('unknown role ' + m.role) }}"
    "{% endif %}"
    "{% endfor %}"
    "{% if add_generation_prompt %}<A>{% endif %}"
)


def test_render_basic():
    out = render_chat(
        TPL,
        [{"role": "system", "content": "be nice"},
         {"role": "user", "content": "hi"},
         {"role": "assistant", "content": "hello"},
         {"role": "user", "content": "bye"}],
        bos_token="<bos>", eos_token="<eos>")
    assert out == ("<bos>[SYS]be nice[/SYS]<U>hi</U>"
                   "<A>hello<eos><U>bye</U><A>")


def test_render_no_generation_prompt():
    out = render_chat(TPL, [{"role": "user", "content": "x"}],
                      add_generation_prompt=False)
    assert out == "<U>x</U>"


def test_render_raise_exception_and_bad_messages():
    with pytest.raises(ChatTemplateError, match="unknown role"):
        render_chat(TPL, [{"role": "tool", "content": "x"}])
    with pytest.raises(ChatTemplateError, match="role"):
        render_chat(TPL, [{"content": "missing role"}])
    with pytest.raises(ChatTemplateError, match="render"):
        render_chat("{{ messages|bogusfilter }}",
                    [{"role": "user", "content": "x"}])


def test_converter_embeds_chat_template(tmp_path):
    from deepseek_tpu import convert as cv
    from deepseek_tpu.utils import codec
    from tests.util_hf import hf_config, hf_weights, write_hf_dir

    cfg = hf_config()
    src = tmp_path / "hf"
    write_hf_dir(str(src), cfg, hf_weights(cfg), tokenizer_config={
        "chat_template": TPL,
        "bos_token": {"content": "<bos>"},      # AddedToken form
        "eos_token": "<eos>",
    })
    out = tmp_path / "out"
    cv.convert(str(src), str(out), quant="fp16")
    data = codec.load_checkpoint(str(out))
    assert data.metadata["chat_template"] == TPL
    assert data.metadata["chat_bos_token"] == "<bos>"
    assert data.metadata["chat_eos_token"] == "<eos>"


@pytest.fixture(scope="module")
def chat_engine(tmp_path_factory):
    """Tiny engine whose checkpoint metadata carries the test template."""
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.utils import codec
    from tests.util_tinymodel import (
        tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
    )
    d = tmp_path_factory.mktemp("chat_ckpt")
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=128,
                      rs_original_max_position_embeddings=32)
    md = tiny_metadata(cfg)
    md["chat_template"] = TPL
    md["chat_bos_token"] = "<bos>"
    md["chat_eos_token"] = "<eos>"
    codec.save_checkpoint(
        str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 11))], md)
    return Engine(str(d), seed=0, prefill_chunk=8, decode_block=1)


def test_engine_render_chat(chat_engine):
    out = chat_engine.render_chat([{"role": "user", "content": "hi"}])
    assert out == "<bos><U>hi</U><A>"


def test_engine_without_template_raises(tmp_path_factory):
    from deepseek_tpu.engine import Engine
    from deepseek_tpu.utils import codec
    from tests.util_tinymodel import (
        tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
    )
    d = tmp_path_factory.mktemp("plain_ckpt")
    cfg = tiny_config(use_mla=True, vocab_size=300, max_seq_len=64,
                      rs_original_max_position_embeddings=32)
    codec.save_checkpoint(
        str(d), [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 11))],
        tiny_metadata(cfg))
    eng = Engine(str(d), seed=0, prefill_chunk=8, decode_block=1)
    assert eng.chat_template is None
    with pytest.raises(ChatTemplateError, match="no chat_template"):
        eng.render_chat([{"role": "user", "content": "x"}])


def test_chat_completions_endpoint(chat_engine):
    from deepseek_tpu.server import Server
    srv = Server(chat_engine, batch_size=2)
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}/v1/chat/completions"

        def post(payload):
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req, timeout=300)

        with post({"messages": [{"role": "user", "content": "hi"}],
                   "max_tokens": 4, "temperature": 0.0}) as r:
            body = json.loads(r.read())
        assert body["message"]["role"] == "assistant"
        assert body["finish_reason"] in ("stop", "length")
        assert 1 <= body["completion_tokens"] <= 4

        # greedy equivalence vs rendering + bos-less generate directly
        prompt = chat_engine.render_chat(
            [{"role": "user", "content": "hi"}])
        toks = chat_engine.tokenizer.encode(prompt, bos=False)
        want, _ = chat_engine.generate(toks, num_steps=4, temperature=0.0)
        assert body["tokens"] == want

        # malformed messages -> 400 with the template error surfaced
        with pytest.raises(urllib.error.HTTPError) as e:
            post({"messages": [{"role": "alien", "content": "x"}]}).read()
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        srv.shutdown()
