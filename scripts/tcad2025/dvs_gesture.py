"""DVS-gesture acceptance benchmark (TCAD'25 experiment).

TPU-native rewrite of /root/reference/scripts/tcad2025/dvs_gesture.py:
runs the flagship DVS-gesture workload (loihi.yaml + snn/dvs.yaml, 1000
timesteps, detailed timing + spike traces) and reports energy, latency,
and the energy-delay product the paper compares against measured Loihi.

Usage: python scripts/tcad2025/dvs_gesture.py [timesteps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import sanafe_tpu as sf

REF = Path("/root/reference")


def main(timesteps: int = 1000) -> int:
    arch = sf.load_arch(REF / "arch/loihi.yaml")
    net = sf.load_net(REF / "snn/dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    t0 = time.perf_counter()
    results = chip.sim(
        timesteps, timing_model="detailed", spike_trace=True, heartbeat=0
    )
    wall = time.perf_counter() - t0
    energy = results["energy"]["total"]
    latency = results["sim_time"]
    print(f"neurons fired:       {results['neurons_fired']}")
    print(f"total energy:        {energy:.6e} J")
    print(f"simulated latency:   {latency:.6e} s")
    print(f"energy-delay product:{energy * latency:.6e} Js")
    print(f"wall clock:          {wall:.1f} s "
          f"({timesteps / wall:.0f} timesteps/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000))
