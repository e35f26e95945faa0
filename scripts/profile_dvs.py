"""Profile the DVS-gesture detailed-tier hot path on the real device.

Runs the acceptance workload (1000 steps, spike trace, detailed timing,
host sweep) once cold and N times warm, then prints the per-phase wall
breakdown chip.sim tracks (dispatch / fetch-wait / mask+wire decode /
native sweep / exact energy) plus the residual (trace rows + Python
loop). This is the measurement tool behind the >=100x north-star work:
optimize whatever phase tops this list, re-run, repeat.

Usage: python scripts/profile_dvs.py [reps] [steps] [chunk]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import sanafe_tpu as sf

REF = Path("/root/reference")

WALLS = (
    "neuron_processing_wall",  # chunk dispatch (device enqueue)
    "fetch_wait_wall",         # blocking wait on the fetch-ahead thread
    "message_processing_wall", # wire decode + mask reconstruction
    "scheduler_wall",          # native detailed sweep
    "energy_stats_wall",       # exact float64 energy replay
)


def snap(chip):
    return {w: getattr(chip, w) for w in WALLS}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    kwargs = dict(timing_model="detailed", heartbeat=0, chunk=chunk)

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        chip.sim(steps, spike_trace=str(Path(td) / "warm.csv"), **kwargs)
        print(f"cold: {time.perf_counter() - t0:.1f}s "
              f"({steps / (time.perf_counter() - t0):.0f} ts/s)",
              flush=True)
        for i in range(reps):
            before = snap(chip)
            t0 = time.perf_counter()
            chip.sim(
                steps, spike_trace=str(Path(td) / f"r{i}.csv"), **kwargs
            )
            wall = time.perf_counter() - t0
            deltas = {w: getattr(chip, w) - before[w] for w in WALLS}
            accounted = sum(deltas.values())
            print(f"rep {i}: {wall:.3f}s = {steps / wall:.0f} ts/s "
                  f"({steps / wall / 16.07:.1f}x)")
            for w in WALLS:
                print(f"    {w:<24} {deltas[w] * 1e3 / steps:7.4f} ms/step "
                      f"({deltas[w] / wall * 100:4.1f}%)")
            print(f"    {'residual':<24} "
                  f"{(wall - accounted) * 1e3 / steps:7.4f} ms/step "
                  f"({(wall - accounted) / wall * 100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
