import numpy as np
import pytest

from deepseek_tpu.utils import codec


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((16, 32)).astype(np.float32),
        "b.weight": rng.standard_normal((8, 8)).astype(np.float16),
        "c.bytes": rng.integers(0, 255, size=(4, 100), dtype=np.uint8),
    }
    md = {"dim": "32", "quant": "fp16"}
    path = tmp_path / "shard_000.dseek"
    codec.save_shard(str(path), tensors, metadata=md)

    loaded_md, loaded = codec.load_shard(str(path), read_metadata=True)
    assert loaded_md == md
    for name, arr in tensors.items():
        out = loaded[name].array
        assert out.dtype == arr.dtype
        assert out.shape == arr.shape
        np.testing.assert_array_equal(np.asarray(out), arr)


def test_multi_shard_checkpoint(tmp_path):
    codec.save_checkpoint(
        str(tmp_path),
        shards=[
            {"x": np.arange(10, dtype=np.float32)},
            {"y": np.arange(5, dtype=np.int32)},
        ],
        metadata={"n_layers": "2"},
    )
    ckpt = codec.load_checkpoint(str(tmp_path))
    assert ckpt.metadata == {"n_layers": "2"}
    assert set(ckpt.tensors) == {"x", "y"}
    np.testing.assert_array_equal(np.asarray(ckpt["x"]), np.arange(10, dtype=np.float32))
    assert len(ckpt.files) == 2


def test_duplicate_tensor_rejected(tmp_path):
    codec.save_checkpoint(
        str(tmp_path),
        shards=[{"x": np.zeros(3, np.float32)}, {"x": np.ones(3, np.float32)}],
        metadata={},
    )
    with pytest.raises(ValueError, match="duplicate"):
        codec.load_checkpoint(str(tmp_path))


def test_fp8_dtype_roundtrip(tmp_path):
    import ml_dtypes
    arr = np.array([[1.0, -2.0], [0.5, 4.0]], dtype=ml_dtypes.float8_e5m2)
    codec.save_shard(str(tmp_path / "s.dseek"), {"w": arr})
    _, loaded = codec.load_shard(str(tmp_path / "s.dseek"), read_metadata=False)
    assert loaded["w"].dtype_str == "F8_E5M2"
    np.testing.assert_array_equal(
        np.asarray(loaded["w"].array).view(np.uint8), arr.view(np.uint8))


def test_tokenizer_tokens_pack_unpack():
    vocab = [b"<unk>", b"hello", b"", b" world", bytes([0xE2, 0x96, 0x81]) + b"t"]
    arr = codec.pack_tokenizer_tokens(vocab)
    assert arr.dtype == np.uint8
    out = codec.unpack_tokenizer_tokens(arr)
    assert out == vocab


def test_safetensors_interop(tmp_path):
    """Files we write are readable by the safetensors library and vice versa."""
    st = pytest.importorskip("safetensors.numpy")
    tensors = {"w": np.random.default_rng(1).standard_normal((4, 6)).astype(np.float32)}
    # ours -> theirs
    codec.save_shard(str(tmp_path / "ours.dseek"), tensors, metadata={"k": "v"})
    theirs = st.load_file(str(tmp_path / "ours.dseek"))
    np.testing.assert_array_equal(theirs["w"], tensors["w"])
    # theirs -> ours
    st.save_file(tensors, str(tmp_path / "theirs.dseek"), metadata={"k": "v"})
    md, loaded = codec.load_shard(str(tmp_path / "theirs.dseek"), read_metadata=True)
    assert md == {"k": "v"}
    np.testing.assert_array_equal(np.asarray(loaded["w"].array), tensors["w"])


def test_loader_rejects_mismatched_shapes(tmp_path):
    """Checkpoint/config shape validation (reference check_tensor,
    model.cpp:131-147): a tensor whose logical shape contradicts the
    config metadata fails the load with a clear error."""
    import pytest
    from deepseek_tpu.config import ModelConfig
    from deepseek_tpu.models.loader import load_params
    from tests.util_tinymodel import (
        tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
    )

    cfg = tiny_config(use_mla=True, vocab_size=64)
    wd = tiny_weights(cfg, seed=9)
    # corrupt one projection: wrong output rows
    bad = wd["model.layers.1.attn.wo.weight"]
    wd["model.layers.1.attn.wo.weight"] = bad[:-1]
    d = str(tmp_path / "bad")
    codec.save_checkpoint(d, [tiny_checkpoint_tensors(cfg, wd)],
                          tiny_metadata(cfg))
    data = codec.load_checkpoint(d)
    rcfg = ModelConfig.from_metadata(data.metadata)
    with pytest.raises(ValueError, match="attn.wo.*shape"):
        load_params(data, rcfg)
