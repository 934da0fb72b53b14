"""Worker for the multi-host CLEAN-FAIL tests (test_multihost).

Usage: python tests/multihost_failworker.py <mode> <coord> <pid> <nprocs>

Modes:
- "solo": call init_multihost expecting <nprocs> processes while the peers
  never start. The coordination service must give up after the (short)
  initialization_timeout and raise — the process exits non-zero instead of
  hanging (SURVEY.md §5: multi-host runs should at least fail cleanly;
  the reference has no distributed execution at all).
- "die": all processes init; non-coordinator processes then exit(1) with
  no shutdown handshake (simulated host crash). The surviving coordinator
  keeps hitting the cross-process barrier; the coordination service must
  declare the dead peer within heartbeat_timeout_seconds and error the
  barrier — the survivor prints CLEAN_FAIL_DETECTED and exits 7.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_NUM_CPU_DEVICES"] = "2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 2)
except Exception:
    pass


def main():
    mode, coord, pid, nprocs = sys.argv[1:5]
    from deepseek_tpu.parallel.mesh import init_multihost

    # short timeouts: a missing host fails init in ~10s, a dead host is
    # declared within ~10s of its last heartbeat
    init_multihost(coordinator_address=coord, num_processes=int(nprocs),
                   process_id=int(pid),
                   initialization_timeout=10,
                   heartbeat_timeout_seconds=10)
    print(f"INIT_OK pid={pid}", flush=True)

    if mode == "die" and int(pid) != 0:
        os._exit(1)  # crash: no shutdown handshake, heartbeats stop

    # survivor: cross-process barriers until the dead peer is reported
    import time

    from jax.experimental import multihost_utils
    try:
        for i in range(240):
            multihost_utils.sync_global_devices(f"hb{i}")
            time.sleep(0.5)
    except Exception as e:
        print(f"CLEAN_FAIL_DETECTED pid={pid}: {type(e).__name__}",
              flush=True)
        sys.exit(7)
    print("NO_FAILURE_SEEN", flush=True)
    sys.exit(8)


if __name__ == "__main__":
    main()
