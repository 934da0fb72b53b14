"""Worker process for the 2-process jax.distributed test (test_multihost).

Usage: python tests/multihost_worker.py <coord> <pid> <nprocs> <ckpt> <ref.npz>

Each process hosts 2 virtual CPU devices; the mesh's 'data' axis spans the
two processes (the cross-DCN axis on real pods) and 'tensor' stays
process-local (the ICI axis) — the layout rule init_multihost documents.
The worker runs a short greedy decode with the GSPMD global-array path and
asserts its ADDRESSABLE logits shards match the single-process reference.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", ""))

os.environ["JAX_NUM_CPU_DEVICES"] = "2"

import jax  # noqa: E402

# a sitecustomize may pre-import jax before this file runs; force the
# config objects directly (same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 2)
except Exception:
    pass


def main():
    coord, pid, nprocs, ckpt_dir, ref_path = sys.argv[1:6]
    import numpy as np

    from deepseek_tpu.parallel.mesh import init_multihost

    got_pid = init_multihost(coordinator_address=coord,
                             num_processes=int(nprocs),
                             process_id=int(pid))
    assert got_pid == int(pid)
    assert jax.process_count() == int(nprocs)
    assert len(jax.devices()) == 2 * int(nprocs)

    import jax.numpy as jnp

    from deepseek_tpu.config import ModelConfig
    from deepseek_tpu.models import init_cache, make_forward
    from deepseek_tpu.models.loader import load_params
    from deepseek_tpu.parallel import make_mesh, shard_cache, shard_params
    from deepseek_tpu.utils.codec import load_checkpoint

    data = load_checkpoint(ckpt_dir)
    cfg = ModelConfig.from_metadata(data.metadata)
    params = load_params(data, cfg)

    # 'data' axis crosses the two processes; 'tensor' is process-local
    mesh = make_mesh(data=int(nprocs), expert=1, tensor=2)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, batch=int(nprocs)), cfg, mesh)

    ref = np.load(ref_path)
    tokens = ref["tokens"]
    B = int(nprocs)

    from jax.sharding import NamedSharding, PartitionSpec as P
    tok_sharding = NamedSharding(mesh, P("data", None))

    step = make_forward(cfg, prefill=False, logits_mode="last")
    lg = None
    for pos, t in enumerate(tokens.tolist()):
        tk_np = np.full((B, 1), t, np.int32)
        tk = jax.make_array_from_callback(
            (B, 1), tok_sharding, lambda idx: tk_np[idx])
        lg, sc = step(sp, sc, tk, pos)

    # every process checks the logits shards it can address (GSPMD may
    # shard rows over 'data' AND vocab over 'tensor')
    want = ref["logits"]                     # (B, V) single-process result
    for shard in lg.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), want[shard.index],
            rtol=2e-3, atol=2e-3)
    print(f"WORKER_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
