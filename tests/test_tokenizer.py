from deepseek_tpu.tokenizer import Tokenizer
from deepseek_tpu.utils.codec import CheckpointData, TensorView, pack_tokenizer_tokens


def make_vocab():
    vocab = [b"<unk>", b"<s>", b"</s>"]
    vocab += [f"<0x{i:02X}>".encode() for i in range(256)]  # byte fallback at 3
    vocab += [b" ", b"he", b"hello", b"ll", b"o", b" world", b"wor", b"<|im_end|>"]
    return vocab


def make_tokenizer():
    return Tokenizer(make_vocab(), bos_id=1, eos_id=2)


def test_greedy_longest_prefix():
    tok = make_tokenizer()
    v = make_vocab()
    ids = tok.encode("hello world")
    # greedy longest prefix: "hello" (not "he"+"ll"+"o"), then " world"
    assert ids == [v.index(b"hello"), v.index(b" world")]


def test_bos_and_decode_strip():
    tok = make_tokenizer()
    v = make_vocab()
    ids = tok.encode(" world", bos=True)
    assert ids[0] == 1
    # decoding " world" right after BOS strips the leading space
    assert tok.decode_one(1, v.index(b" world")) == b"world"
    assert tok.decode_one(0, v.index(b" world")) == b" world"


def test_byte_fallback():
    tok = make_tokenizer()
    ids = tok.encode("h\xe9")  # 'h' matches "he"? no: next byte is 0xC3 -> 'h' has no single-char token
    # "h" alone is not in vocab; bytes fall back
    decoded = tok.decode(ids)
    assert decoded == "h\xe9".encode("utf-8")


def test_eot_detection():
    tok = make_tokenizer()
    v = make_vocab()
    assert tok.eot_id == v.index(b"<|im_end|>")
    assert tok.is_eos_or_eot(tok.eot_id)
    assert tok.is_eos_or_eot(2)
    assert not tok.is_eos_or_eot(0)


def test_roundtrip_arbitrary_text():
    tok = make_tokenizer()
    for text in ["hello world", "unseen bytes é中文!", "  ", ""]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text.encode("utf-8")


def test_from_checkpoint():
    vocab = make_vocab()
    arr = pack_tokenizer_tokens(vocab)
    data = CheckpointData(
        metadata={"bos_token_id": "1", "eos_token_id": "2"},
        tensors={"tokenizer.tokens": TensorView("tokenizer.tokens", "U8", arr.shape, arr)},
    )
    tok = Tokenizer.from_checkpoint(data)
    assert tok.bos_id == 1 and tok.eos_id == 2
    assert tok.vocab == vocab
    assert tok.byte_fallback_start == 3
