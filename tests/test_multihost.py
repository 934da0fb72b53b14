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


def _fail_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


_FAILWORKER = os.path.join(_REPO, "tests", "multihost_failworker.py")


def test_multihost_missing_peer_fails_cleanly():
    """A host that never shows up must kill the job after the bounded
    initialization_timeout — non-zero exit, no hang (SURVEY.md §5 failure
    posture; the reference has nothing to distribute)."""
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost port available")
    coord = f"127.0.0.1:{port}"
    # only the coordinator (pid 0) starts; it expects 2 processes
    p = subprocess.Popen(
        [sys.executable, _FAILWORKER, "solo", coord, "0", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=_fail_env())
    try:
        out, _ = p.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        p.kill()
        pytest.fail("init with a missing peer hung past its timeout")
    text = out.decode("utf-8", errors="replace")
    assert p.returncode != 0, f"expected clean failure, got rc=0:\n{text[-2000:]}"
    assert "INIT_OK" not in text, text[-2000:]


def test_multihost_dead_peer_detected():
    """A host that dies MID-RUN (exit with no shutdown handshake) must be
    declared dead within heartbeat_timeout_seconds; the survivor's next
    barrier raises instead of blocking forever."""
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost port available")
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, _FAILWORKER, "die", coord, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=_fail_env())
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode("utf-8", errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        pytest.fail("survivor hung after peer death (no bounded detection)")
    # pid 1 crashed on purpose
    assert procs[1].returncode == 1, outs[1][-2000:]
    # pid 0 (coordinator) must terminate non-zero within the bound — not
    # hang, not report success. The error reaches it one of two ways:
    # the barrier raises (our except prints the marker) or the async
    # error-polling thread aborts the process with the coordination
    # service's crash report; both are clean bounded failure.
    assert "NO_FAILURE_SEEN" not in outs[0], outs[0][-2000:]
    assert procs[0].returncode != 0, outs[0][-2000:]
    assert ("CLEAN_FAIL_DETECTED pid=0" in outs[0]
            or "crashed" in outs[0] or "CoordinationService" in outs[0]), \
        outs[0][-2000:]
