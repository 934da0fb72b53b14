"""Bounded-RSS conversion check on a synthetic multi-shard checkpoint.

The converter memmaps every input shard and fetches one tensor at a time
(convert._read_safetensors), releasing consumed pages after each output
shard (convert._release_mapped_pages) — peak RSS must stay ~one output
shard plus the largest single tensor, independent of checkpoint size.
This script builds a multi-GB synthetic HF checkpoint (several
.safetensors files), then runs the conversion in a SUBPROCESS (so the
builder's own memory use cannot pollute ru_maxrss) and reports the
converter's peak RSS vs the checkpoint size.

Usage: python scripts/check_convert_rss.py [target_gb] [workdir]
"""

import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.util_hf import hf_config, hf_weights, write_hf_dir

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from deepseek_tpu import convert as cv

def status(key):   # NOTE: ru_maxrss survives execve on Linux (the child
    # would inherit the fixture-building parent's peak); VmHWM resets
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith(key):
                return int(ln.split()[1]) / 1e6

rel = cv._release_mapped_pages
n = [0]
def traced(mms):
    before = status("VmRSS")
    rel(mms)
    n[0] += 1
    print(f"release {{n[0]}} ({{len(mms)}} maps): rss {{before:.2f}} -> "
          f"{{status('VmRSS'):.2f}} GB", flush=True)
cv._release_mapped_pages = traced
t0 = time.perf_counter()
cv.convert({hf_dir!r}, {out_dir!r}, quant="fp16", use_mla=True)
print(f"CONVERT_S {{time.perf_counter()-t0:.1f}} releases={{n[0]}}")
print(f"PEAK_RSS_GB {{status('VmHWM'):.3f}}")
"""


def main():
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/convert_rss"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.rmtree(work, ignore_errors=True)
    hf_dir = os.path.join(work, "hf")
    out_dir = os.path.join(work, "out")

    # size one layer, then scale the layer count to the target
    probe_cfg = hf_config(dim=1024, hidden=4096, q_lora=512, kv_lora=512,
                          nope=128, rope=64, v_dim=128, moe_inter=512,
                          layers=1, n_experts=8, n_active=2, vocab=8192)
    probe = hf_weights(probe_cfg, seed=0)
    per_layer = sum(v.nbytes for k, v in probe.items()
                    if k.startswith("model.layers.0."))
    fixed = sum(v.nbytes for k, v in probe.items()
                if not k.startswith("model.layers.0."))
    n_layers = max(2, int((target_gb * 1e9 - fixed) / per_layer))
    cfg = hf_config(dim=1024, hidden=4096, q_lora=512, kv_lora=512,
                    nope=128, rope=64, v_dim=128, moe_inter=512,
                    layers=n_layers, n_experts=8, n_active=2, vocab=8192)

    t0 = time.perf_counter()
    wd = hf_weights(cfg, seed=0)
    total = sum(v.nbytes for v in wd.values())
    write_hf_dir(hf_dir, cfg, wd, n_files=8)
    del wd
    print(f"built {total/1e9:.2f} GB checkpoint ({n_layers} layers, "
          f"8 files) in {time.perf_counter()-t0:.0f}s")

    child = _CHILD.format(repo=repo, hf_dir=hf_dir, out_dir=out_dir)
    out = subprocess.run([sys.executable, "-c", child], text=True,
                         capture_output=True)
    print(out.stdout, end="")
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        return out.returncode
    peak = float([ln for ln in out.stdout.splitlines()
                  if ln.startswith("PEAK_RSS_GB")][0].split()[1])
    # budget: interpreter+jax baseline (~1.5 GB) + one 8-layer output
    # shard + slack — NOT proportional to the input size
    shard_gb = 8 * per_layer / 2 / 1e9   # fp16 output of 8 layers
    budget = 2.0 + shard_gb + 1.0
    verdict = "BOUNDED" if peak < budget else "UNBOUNDED"
    print(f"converter peak RSS {peak:.2f} GB on a {total/1e9:.2f} GB input "
          f"-> {verdict} (budget {budget:.2f} GB = 2 GB runtime + "
          f"{shard_gb:.2f} GB output shard + 1 GB slack)")
    shutil.rmtree(work, ignore_errors=True)
    return 0 if verdict == "BOUNDED" else 1


if __name__ == "__main__":
    sys.exit(main())
