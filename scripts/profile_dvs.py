"""Profile the DVS-gesture detailed-timing hot loop phase by phase.

Prints a per-step wall breakdown of one TPU run: device dispatch, wire
fetch (device compute + D2H transfer), the host NoC sweep, trace writing,
and the raw tunnel bandwidth for a wire-sized buffer. Used to decide
which phase to optimize next; not part of the test suite.

Usage: python scripts/profile_dvs.py [steps] [chunk] [timing_model]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

# synchronous fetch so the wall counters see the transfer
os.environ.setdefault("SANAFE_TPU_ASYNC_FETCH", "0")

try:
    os.nice(-10)  # outprioritize the tunnel proxy (see bench.py _worker)
except (OSError, AttributeError):
    pass

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    # run from a checkout, not installed
    sys.path.insert(0, str(REPO))

import sanafe_tpu as sf

REF = Path("/root/reference")


def _run_one(chip, steps, chunk, timing, spikes: bool,
             device_sweep: bool = False, async_fetch: bool = False) -> None:
    os.environ["SANAFE_TPU_ASYNC_FETCH"] = "1" if async_fetch else "0"
    with tempfile.TemporaryDirectory() as td:
        kw = dict(timing_model=timing, heartbeat=0, chunk=chunk,
                  device_sweep=device_sweep)
        if spikes:
            kw["spike_trace"] = str(Path(td) / "warm.csv")
        chip.sim(steps, **kw)
        for name in ("neuron_processing", "message_processing", "scheduler",
                     "energy_stats", "fetch_wait"):
            setattr(chip, f"{name}_wall", 0.0)
        if spikes:
            kw["spike_trace"] = str(Path(td) / "spikes.csv")
        t0 = time.perf_counter()
        chip.sim(steps, **kw)
        total = time.perf_counter() - t0

    per = 1e3 / steps
    print(f"--- timing={timing} spikes={spikes} steps={steps} chunk={chunk}"
          f" device_sweep={device_sweep} async={async_fetch}")
    print(f"total            {total * per:8.3f} ms/step  "
          f"({steps / total:,.0f} ts/s)")
    print(f"dispatch         {chip.neuron_processing_wall * per:8.3f} ms/step")
    print(f"wire fetch (C+X) {chip.message_processing_wall * per:8.3f} ms/step")
    print(f"host sweep       {chip.scheduler_wall * per:8.3f} ms/step")
    print(f"energy/stats     {chip.energy_stats_wall * per:8.3f} ms/step")
    print(f"fetch wait       {chip.fetch_wait_wall * per:8.3f} ms/step")
    other = (total - chip.neuron_processing_wall
             - chip.message_processing_wall - chip.scheduler_wall
             - chip.energy_stats_wall - chip.fetch_wait_wall)
    print(f"other (traces..) {other * per:8.3f} ms/step", flush=True)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    configs = sys.argv[3] if len(sys.argv) > 3 else "all"

    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)

    # wire sizes: simple/no-trace = stats only; simple/trace adds the
    # packed spike log; detailed/trace adds the fired+updated masks and
    # the host sweep
    if configs in ("all", "simple"):
        _run_one(chip, steps, chunk, "simple", False)
        _run_one(chip, steps, chunk, "simple", True)
        _run_one(chip, steps, chunk, "simple", True, async_fetch=True)
    if configs in ("all", "detailed"):
        _run_one(chip, steps, chunk, "detailed", True)
        _run_one(chip, steps, chunk, "detailed", True, async_fetch=True)
        _run_one(chip, steps, 2 * chunk, "detailed", True, async_fetch=True)
    if configs in ("all", "device_sweep"):
        _run_one(chip, steps, chunk, "detailed", True, device_sweep=True,
                 async_fetch=True)

    # raw tunnel D2H bandwidth for a wire-sized buffer
    import jax
    import jax.numpy as jnp

    nbytes = (chip.compiled.n_neurons + 7) // 8
    wire_cols = 2 * nbytes + 44
    buf = jnp.zeros((chunk, wire_cols), dtype=jnp.uint8) + jnp.uint8(1)
    np.asarray(buf)  # warm
    best = float("inf")
    for _ in range(3):
        buf = buf + jnp.uint8(1)
        t0 = time.perf_counter()
        np.asarray(buf)
        best = min(best, time.perf_counter() - t0)
    mb = buf.size / 1e6
    print(f"tunnel: {mb:.2f} MB wire fetch = {best * 1e3:.1f} ms "
          f"({mb / best:.1f} MB/s, {best * 1e3 / chunk:.3f} ms/step)")


if __name__ == "__main__":
    main()
