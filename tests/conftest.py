"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard way to test TP/EP/DP sharding without TPU hardware
(SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# K-quant golden tests compare against a locally-built reference shared lib
os.environ.setdefault("DSEEK_REFERENCE_DIR", "/root/reference")
