"""Device mesh construction.

The reference's only parallelism is OpenMP threads inside one process
(SURVEY.md §2b); here the scaling story is a ``jax.sharding.Mesh`` over the
slice with three logical axes:

- ``data``    — batch (DP / continuous batching)
- ``expert``  — routed-expert axis (EP); all-to-all rides ICI
- ``tensor``  — attention heads + FFN hidden dim (TP)

XLA/GSPMD inserts the collectives (psum for row-parallel matmuls,
all-to-all for expert dispatch) from the shardings alone.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "expert", "tensor", "seq")


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   initialization_timeout: int = 300,
                   heartbeat_timeout_seconds: int = 100) -> int:
    """Initialize multi-host execution (jax.distributed).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly elsewhere. After this, ``jax.devices()`` spans all hosts and
    ``make_mesh``/``default_mesh_shape`` operate on the global device set —
    sharding rules are axis-based so nothing else changes. Lay meshes out so
    the 'tensor' and 'expert' axes map to intra-slice ICI and only 'data'
    crosses DCN (the mesh device order from jax.devices() already groups by
    process). Returns the process index.

    Failure posture (the reference is single-process; SURVEY.md §5 asks
    multi-host runs to at least fail cleanly): both timeouts are
    pass-throughs to the coordination service, so a host that never shows
    up kills the job after ``initialization_timeout`` seconds and a host
    that dies mid-run is detected within ``heartbeat_timeout_seconds`` —
    the surviving processes raise instead of hanging in a collective
    (tests/test_multihost.py clean-fail tests pin this behavior).

    Single-process callers can skip this entirely; it is idempotent-safe to
    guard with ``jax.process_count() > 1`` checks in launch scripts.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
        heartbeat_timeout_seconds=heartbeat_timeout_seconds)
    return jax.process_index()


def make_mesh(
    data: int = 1,
    expert: int = 1,
    tensor: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """DP x EP x TP x SP device mesh. The 'seq' axis shards the MLA latent
    KV cache along the window (sequence-parallel decode attention with a
    flash-style combine); it defaults to 1 and is fully orthogonal to the
    other axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = data * expert * tensor * seq
    if n > len(devices):
        raise ValueError(
            f"mesh ({data},{expert},{tensor},{seq}) needs {n} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, expert, tensor, seq)
    return Mesh(grid, AXES)


def default_mesh_shape(n_devices: int, cfg=None) -> Tuple[int, int, int]:
    """Balanced (data, expert, tensor) factorization for n devices.

    Prime factors are assigned round-robin expert -> tensor -> data (expert
    parallelism first: routed-expert GEMMs dominate decode bytes for MoE),
    respecting divisibility of n_routed_experts / n_heads when a config is
    given. Any factor that fits nowhere lands on data.
    """
    factors = []
    n = n_devices
    for p in (2, 3, 5, 7):
        while n % p == 0:
            factors.append(p)
            n //= p
    if n > 1:
        factors.append(n)

    data = expert = tensor = 1
    moe = cfg is None or cfg.n_routed_experts > 0
    order = 0
    for f in sorted(factors, reverse=True):
        placed = False
        for _ in range(3):
            which = ("expert", "tensor", "data")[order % 3]
            order += 1
            if which == "expert":
                if moe and (cfg is None or cfg.n_routed_experts % (expert * f) == 0):
                    expert *= f
                    placed = True
                    break
            elif which == "tensor":
                if cfg is None or cfg.n_heads % (tensor * f) == 0:
                    tensor *= f
                    placed = True
                    break
            else:
                data *= f
                placed = True
                break
        if not placed:
            data *= f
    return (data, expert, tensor)
