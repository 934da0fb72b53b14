"""Activation-capture debug harness.

Parity with the reference's DEBUG_MODEL machinery (model.h:481-501,
infer.cpp:10-119): capture named intermediate activations during a forward
pass, dump them as a safetensors file, and diff two captures with per-tensor
max error — the de-facto model-correctness tool for comparing against a
HuggingFace / numpy reference run.

Capture requires eager (non-jit) execution so values can escape the trace —
use ``make_forward(cfg, jit=False)`` inside the context:

    with debug_capture() as cap:
        fwd = make_forward(cfg, jit=False)
        fwd(params, cache, tokens, 0)
    cap.save("acts.safetensors")

The ``dbg()`` hook is a no-op when no capture is active (zero cost in jitted
runs: the flag is checked at trace time).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator, Optional

import numpy as np

from deepseek_tpu.utils import codec

_active: Optional["DebugCapture"] = None


class DebugCapture:
    def __init__(self):
        self.tensors: Dict[str, np.ndarray] = {}

    def add(self, name: str, value) -> None:
        base = name
        i = 1
        while name in self.tensors:  # repeated layers/steps get suffixes
            i += 1
            name = f"{base}#{i}"
        self.tensors[name] = np.asarray(value, dtype=np.float32)

    def save(self, path: str) -> None:
        codec.save_shard(path, self.tensors)

    @classmethod
    def load(cls, path: str) -> "DebugCapture":
        cap = cls()
        _, tensors = codec.load_shard(path, read_metadata=False)
        cap.tensors = {k: np.asarray(v.array, np.float32) for k, v in tensors.items()}
        return cap

    def max_err(self, other: "DebugCapture") -> Dict[str, float]:
        """Per-tensor max abs error vs another capture (DebugTensor::max_err)."""
        out = {}
        for k in self.tensors:
            if k in other.tensors:
                a, b = self.tensors[k], other.tensors[k]
                if a.shape != b.shape:
                    out[k] = float("inf")
                else:
                    out[k] = float(np.abs(a - b).max())
        return out


@contextlib.contextmanager
def debug_capture() -> Iterator[DebugCapture]:
    global _active
    cap = DebugCapture()
    prev, _active = _active, cap
    try:
        yield cap
    finally:
        _active = prev


def dbg(name: str, value) -> None:
    """Record an activation if a capture is active (trace-time no-op otherwise)."""
    if _active is not None:
        _active.add(name, value)


def capture_active() -> bool:
    """True while a debug capture is recording. Scanned layer stacks
    fall back to a static unroll when this is set so every layer keeps
    its own dbg label (models.deepseek.run_layer_stack)."""
    return _active is not None
