"""Measure the host NoC sweep's interleave-lane speedup on DVS-gesture.

The detailed-timing host sweep (native_src/scheduler.cpp) can interleave
the event sweeps of N independent timesteps through one loop
(sweep_timestep_lite_group) to hide their data-dependent load stalls.
This script captures real DVS packed masks from a short CPU-backend run,
then times sched_bench_packed at several lane counts on this host. The
best lane count becomes the SANAFE_SWEEP_LANES default.

Runs entirely on the host CPU (no TPU needed): the sweep being measured
is host code, and the mask capture uses JAX_PLATFORMS=cpu.

Usage: python scripts/measure_sweep_lanes.py [steps] [iters]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    captured: list[tuple[NativeScheduler, np.ndarray, float]] = []
    orig = NativeScheduler.run_chunk_packed

    def hook(self, masks, sync_delay, n_threads=0):
        captured.append((self, np.array(masks), float(sync_delay)))
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

    sched = captured[0][0]
    sync = captured[0][2]
    masks = np.concatenate([m for _, m, _ in captured], axis=0)
    T = masks.shape[0]
    print(f"captured {T} steps of packed masks "
          f"({masks.nbytes / 1e6:.2f} MB)")

    # correctness cross-check first: every lane count must give the exact
    # run_chunk_packed outputs (the group sweep is bit-identical per step)
    base = None
    try:
        for lanes in (1, 2, 4, 8):
            os.environ["SANAFE_SWEEP_LANES"] = str(lanes)
            out = orig(sched, masks, sync)
            if base is None:
                base = out
            elif not np.array_equal(base, out):
                print(f"MISMATCH at lanes={lanes}")
                sys.exit(1)
    finally:
        os.environ.pop("SANAFE_SWEEP_LANES", None)
    print("bit-exactness: lanes 1/2/4/8 identical")

    results = {}
    for phase in (1, 2, 3, 4, 6, 8):
        warm = sched.bench_packed(masks, sync, iters=1, phase=phase)
        if warm < 0:
            # bench_packed returns -1.0 on chips without monotone receive
            # times (scheduler.cpp) — timing it would report absurd rates
            print("bench_packed unsupported on this chip "
                  "(non-monotone receive path); cannot measure lanes")
            sys.exit(1)
        t0 = time.perf_counter()
        sched.bench_packed(masks, sync, iters=iters, phase=phase)
        dt = time.perf_counter() - t0
        per = dt / (iters * T) * 1e3
        results[phase] = per
        label = "serial sweep" if phase == 1 else f"{phase}-lane group"
        print(f"{label:>14}: {per:7.4f} ms/step "
              f"({results[1] / per:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
