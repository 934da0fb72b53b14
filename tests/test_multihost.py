"""Multi-host execution proof: 2 localhost jax.distributed processes.

The reference has no distributed execution at all (SURVEY.md §2b); here a
coordinator + 2 worker processes (2 virtual CPU devices each) build a
global mesh whose 'data' axis crosses the process boundary — the DCN axis
on a real pod — and reproduce the single-process logits exactly. This
exercises parallel.mesh.init_multihost and the global-array placement in
parallel.sharding._place end to end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from deepseek_tpu.utils import codec
from tests.util_tinymodel import (
    tiny_checkpoint_tensors, tiny_config, tiny_metadata, tiny_weights,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    finally:
        s.close()


def test_two_process_data_parallel_matches_single(tmp_path):
    # tiny MLA checkpoint both processes load deterministically
    cfg = tiny_config(use_mla=True, vocab_size=64)
    ckpt = str(tmp_path / "ckpt")
    codec.save_checkpoint(
        ckpt, [tiny_checkpoint_tensors(cfg, tiny_weights(cfg, 60))],
        tiny_metadata(cfg))

    # single-process reference (batch 2 = the global batch)
    import jax.numpy as jnp
    from deepseek_tpu.config import ModelConfig
    from deepseek_tpu.models import init_cache, make_forward
    from deepseek_tpu.models.loader import load_params
    from deepseek_tpu.utils.codec import load_checkpoint

    data = load_checkpoint(ckpt)
    rcfg = ModelConfig.from_metadata(data.metadata)
    params = load_params(data, rcfg)
    step = make_forward(rcfg, prefill=False, logits_mode="last")
    cache = init_cache(rcfg, batch=2)
    tokens = np.asarray([1, 9, 22, 40, 3], np.int32)
    lg = None
    for pos, t in enumerate(tokens.tolist()):
        lg, cache = step(params, cache,
                         jnp.asarray([[t]] * 2, jnp.int32), pos)
    ref_path = str(tmp_path / "ref.npz")
    np.savez(ref_path, tokens=tokens, logits=np.asarray(lg))

    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost port available")
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    # the workers pin their own platform/device-count; drop inherited knobs
    # (conftest exports an 8-device XLA_FLAGS that would override theirs)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), "2", ckpt, ref_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode("utf-8", errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK pid={pid}" in out, out[-4000:]
