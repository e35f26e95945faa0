"""Sweep the device merge-sweep tier's (message cap, lanes) knobs on DVS.

The Pallas merge kernel's lane count (timesteps swept in parallel) is
VMEM-capped by the static per-step message capacity; smaller caps admit
more lanes but send more burst steps to the exact host fallback. This
script times DVS-gesture detailed throughput for several combinations,
each in its own subprocess (env-dependent kernel builds + crash
isolation). Not part of the test suite.

Usage: python scripts/measure_merge.py [steps]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REF = Path("/root/reference")

# Offline model on 1000 captured DVS steps (msgs/step: median 3150,
# p90 6322, p99 14881, max 18963; chunk 500, waves sorted by count,
# wave cost ~ max count in wave):
#
#   cap   lanes  VMEM   fallback%  host-msgs/st  dev-iters/st
#  16384    8    9.1MB     0.6          105          485
#  12288   16   13.8MB     1.7          263          237
#   8192   16    9.3MB     5.8          659          210
#   6144   16    7.0MB    10.7         1002          185
#   6144   32   14.0MB    10.7         1002           93
#   4608   32   10.7MB    20.3         1504           79
#   3072   32    7.3MB    51.5         2662           39
#
# Host side carries ~0.09 ms/step of build+traces plus ~160 ns/msg for
# fallback sweeps; the best combo depends on the kernel's measured
# per-iteration cost (pipeline steady state = max(host, device)).
COMBOS = [
    (16384, 8),
    (12288, 16),
    (8192, 16),
    (6144, 16),
    (6144, 32),
    (4608, 32),
    (3072, 32),
]


def worker(steps: int) -> None:
    import sanafe_tpu as sf

    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chunk = int(os.environ.get("SANAFE_BENCH_DVS_CHUNK", "500"))
    with tempfile.TemporaryDirectory() as td:
        kw = dict(timing_model="detailed", heartbeat=0, chunk=chunk,
                  device_sweep=True,
                  spike_trace=str(Path(td) / "spikes.csv"))
        chip.sim(chunk, **kw)  # warmup/compile
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            chip.sim(steps, **kw)
            best = max(best, steps / (time.perf_counter() - t0))
    print(f"RESULT {best:.2f}", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "_worker":
        worker(int(sys.argv[2]))
        return
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    for cap, lanes in COMBOS:
        env = dict(os.environ)
        # an ambient merge-specific override would silently win over the
        # per-combo cap (default_merge_cap checks it first)
        env.pop("SANAFE_TPU_MERGE_CAP", None)
        env["SANAFE_TPU_SWEEP_CAP"] = str(cap)
        env["SANAFE_TPU_MERGE_LANES"] = str(lanes)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "_worker",
                 str(steps)],
                capture_output=True, text=True, timeout=3000, env=env,
            )
        except subprocess.TimeoutExpired:
            print(f"cap={cap} lanes={lanes}: TIMEOUT")
            continue
        val = None
        for line in out.stdout.splitlines()[::-1]:
            if line.startswith("RESULT "):
                val = float(line.split()[1])
                break
        if val is None:
            tail = (out.stderr or out.stdout)[-300:].replace("\n", " | ")
            print(f"cap={cap} lanes={lanes}: FAILED rc={out.returncode} "
                  f"{tail}")
        else:
            print(f"cap={cap} lanes={lanes}: {val:,.1f} ts/s", flush=True)


if __name__ == "__main__":
    main()
