"""Time the native host sweep's phases on captured DVS masks.

Phases: 0 = message-list build only, 1 = build + event sweep. Reports
ms/step and derived ns/message so sweep optimizations can be compared
without the simulator in the loop.

Usage: python scripts/profile_sweep.py [masks.npz] [iters]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import sanafe_tpu as sf

REF = Path("/root/reference")


def main() -> None:
    masks_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dvs_masks.npz"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data = np.load(masks_path)
    masks = data["masks"]
    sync = float(data["sync"])
    T = masks.shape[0]

    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    sched = chip._get_native_scheduler()
    if sched is None:
        print("native scheduler unavailable")
        sys.exit(1)

    # message count (phase 0 returns sum of per-step message counts)
    n_msgs = sched.bench_packed(masks, sync, iters=1, phase=0)
    if n_msgs < 0:
        print("bench_packed unavailable for this chip (not monotone_recv)")
        sys.exit(1)
    print(f"{T} steps, {n_msgs / T:.0f} messages/step")

    for phase, label in ((0, "build only"), (1, "build+sweep")):
        sched.bench_packed(masks, sync, iters=1, phase=phase)  # warm
        t0 = time.perf_counter()
        rv = sched.bench_packed(masks, sync, iters=iters, phase=phase)
        dt = time.perf_counter() - t0
        assert rv >= 0
        per_step = dt / (iters * T) * 1e3
        per_msg = dt / (iters * n_msgs) * 1e9
        print(f"{label:>12}: {per_step:7.4f} ms/step  {per_msg:6.1f} ns/msg")

    prof = sched.sweep_profile(masks, sync, iters=iters)
    if prof is None:
        print("sweep_profile unavailable")
        return
    total = sum(prof[k] for k in
                ("pop_cycles", "retire_cycles", "send_cycles", "push_cycles"))
    ev = prof["events"]
    print(f"\nsection profile ({ev:.0f} events, "
          f"{prof['retire_calls']:.0f} retire calls, "
          f"{prof['drains']:.0f} drains):")
    for k in ("pop_cycles", "retire_cycles", "send_cycles", "push_cycles"):
        c = prof[k]
        print(f"{k:>14}: {c / ev:7.1f} cyc/event  {c / total * 100:5.1f}%")


if __name__ == "__main__":
    main()
