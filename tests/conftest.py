"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard way to test TP/EP/DP sharding without TPU hardware
(SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# JAX >= 0.5 spells this JAX_NUM_CPU_DEVICES; keep the XLA_FLAGS spelling too
# for the driver's dryrun environment.
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax at interpreter startup (sitecustomize
# registering a TPU plugin) — in that case env vars set above were read too
# late and tests would silently run on the real chip with remote compilation
# (~20s per jit). Force the config objects directly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
# K-quant golden tests compare against a locally-built reference shared lib
os.environ.setdefault("DSEEK_REFERENCE_DIR", "/root/reference")

# Persistent compilation cache: the suite is compile-dominated (hundreds of
# tiny-model jit programs); cached re-runs skip all of it. Keyed on HLO +
# compile options, so virtual-mesh/CPU programs never collide with TPU ones.
from deepseek_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.environ.get("DSEEK_TEST_COMPILE_CACHE",
                                    "/tmp/dseek_test_jaxcache"))
