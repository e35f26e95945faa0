"""Capture DVS-gesture packed masks to an .npz for host-sweep profiling.

Runs the DVS workload on the CPU backend, hooks run_chunk_packed to
record every packed-mask chunk, and saves the concatenated [T, 2, B]
uint8 array plus the sync delay. Downstream profiling scripts
(measure_sweep_lanes.py, perf experiments) can then re-time the native
sweep without re-running the simulator.

Usage: python scripts/capture_dvs_masks.py [steps] [out.npz]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import sanafe_tpu as sf
from sanafe_tpu.native import NativeScheduler

REF = Path("/root/reference")


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        tempfile.gettempdir()) / "dvs_masks.npz"

    captured: list[np.ndarray] = []
    syncs: list[float] = []
    orig = NativeScheduler.run_chunk_packed

    def hook(self, masks, sync_delay, n_threads=0):
        captured.append(np.array(masks))
        syncs.append(float(sync_delay))
        return orig(self, masks, sync_delay, n_threads)

    NativeScheduler.run_chunk_packed = hook
    try:
        arch = sf.load_arch(REF / "arch" / "loihi.yaml")
        net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
        chip = sf.SpikingChip(arch)
        chip.load(net)
        with tempfile.TemporaryDirectory() as td:
            chip.sim(steps, timing_model="detailed", heartbeat=0,
                     chunk=min(steps, 250),
                     spike_trace=str(Path(td) / "spikes.csv"))
    finally:
        NativeScheduler.run_chunk_packed = orig
    if not captured:
        print("no packed-mask chunks captured (lite path not taken?)")
        sys.exit(1)
    masks = np.concatenate(captured, axis=0)
    np.savez_compressed(out, masks=masks, sync=np.float64(syncs[0]))
    print(f"saved {masks.shape[0]} steps ({masks.nbytes / 1e6:.2f} MB) "
          f"to {out}")


if __name__ == "__main__":
    main()
