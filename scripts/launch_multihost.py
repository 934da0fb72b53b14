"""Multi-host launch helper for deepseek_tpu.

On Cloud TPU pods, run the SAME command on every host (the pod runtime
fills in coordinator/process topology automatically):

    python scripts/launch_multihost.py <ckpt_dir> -m completion -i "..." ...

Elsewhere (e.g. CPU hosts over TCP), give the topology explicitly on each
host:

    python scripts/launch_multihost.py --coord host0:9999 --nprocs 2 \
        --pid <this host's index> <ckpt_dir> ...

After initialization, jax.devices() spans every host; the mesh layout rule
is: 'tensor'/'expert' axes stay intra-host (ICI), only 'data' crosses DCN
(parallel.mesh.init_multihost). All remaining arguments are the standard
CLI surface (deepseek_tpu.cli).
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    coord = nprocs = pid = None
    rest = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--coord":
            i += 1
            coord = argv[i]
        elif a == "--nprocs":
            i += 1
            nprocs = int(argv[i])
        elif a == "--pid":
            i += 1
            pid = int(argv[i])
        else:
            rest.append(a)
        i += 1

    from deepseek_tpu.parallel.mesh import init_multihost

    idx = init_multihost(coordinator_address=coord, num_processes=nprocs,
                         process_id=pid)
    import jax
    print(f"[multihost] process {idx}/{jax.process_count()}, "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices", file=sys.stderr)

    from deepseek_tpu.cli import main as cli_main
    cli_main(rest)


if __name__ == "__main__":
    main()
