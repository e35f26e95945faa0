"""Capture native-scheduler inputs for the ASan/UBSan replay harness.

The reference's CI runs its C++ under Valgrind memcheck
(/root/reference/CMakeLists.txt:335-336, tests/README.md:16). Running
this repo's Python suite under ASan is a dead end — ASan's allocator
aborts inside XLA's compiler — so the memory-safety gate is built
capture-then-replay instead: this script runs real simulations on the
CPU backend WITHOUT sanitizers, records every byte crossing the ctypes
boundary into ``sanafe_tpu/native_src/scheduler.cpp``, and writes a flat
binary replay file. ``native_src/sanitize_harness.cpp`` (a pure C++
``main()``, no Python) then replays those exact calls under
``-fsanitize=address,undefined`` — see ``ci/run.py``'s sanitize gate.

Replay file format (little-endian, host-order):
  magic          u64   0x314e41534e415341 ("ASANASN1" LE)
  n_scheds       i32
  per scheduler:
    7 x i32      noc_w noc_h links_per_tile buffer_size n_cores n_axons
                 n_neurons
    10 x i32[n_axons]   src_slot src_core dest_core src_x src_y dest_x
                        dest_y src_core_offset hops ordinal
    3  x f64[n_axons]   latency_out proc_delay min_hop_delay
    2  x i32[n_cores]   core_slot_lo core_slot_hi
    3  x f64[n_neurons] lat_base lat_update lat_spike
    n_calls i32
    per call: kind i32
      kind 0 (packed)   T i32, B i32, sync f64, u8[T*2*B]
      kind 1 (unpacked) T i32, sync f64, u8[T*n_axons], f64[T*n_neurons]
      kind 2 (cycle)    T i32, B i32, sync f64, u8[T*2*B]
      kind 3 (trace)    sync f64, u8[n_axons], f64[n_neurons]

Usage: python scripts/capture_sanitize_replay.py [out.bin]
"""

from __future__ import annotations

import os
import struct
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import __graft_entry__ as ge
from sanafe_tpu.native import NativeScheduler, _f64

MAGIC = 0x314E41534E415341


class _Recorder:
    """Hooks every NativeScheduler entry point, keyed by instance."""

    def __init__(self):
        self.scheds: list[tuple[NativeScheduler, list[tuple]]] = []
        self._calls: dict[int, list[tuple]] = {}

    def _calls_of(self, sched) -> list[tuple]:
        key = id(sched)
        if key not in self._calls:
            self._calls[key] = []
            self.scheds.append((sched, self._calls[key]))
        return self._calls[key]

    def install(self):
        rec = self

        def wrap(name, pack):
            orig = getattr(NativeScheduler, name)

            def hooked(self, *args, **kwargs):
                rec._calls_of(self).append(pack(self, *args, **kwargs))
                return orig(self, *args, **kwargs)

            setattr(NativeScheduler, name, hooked)
            return orig

        self._origs = {
            "run_chunk_packed": wrap(
                "run_chunk_packed",
                lambda s, m, sync, n_threads=0: (
                    0, np.ascontiguousarray(m, dtype=np.uint8), float(sync)),
            ),
            "run_chunk": wrap(
                "run_chunk",
                lambda s, fired, gen, sync, n_threads=0: (
                    1, np.ascontiguousarray(fired, dtype=np.uint8),
                    _f64(gen), float(sync)),
            ),
            "run_chunk_cycle": wrap(
                "run_chunk_cycle",
                lambda s, m, sync, n_threads=0: (
                    2, np.ascontiguousarray(m, dtype=np.uint8), float(sync)),
            ),
            "run_timestep_trace": wrap(
                "run_timestep_trace",
                lambda s, fired, gen, sync: (
                    3, np.ascontiguousarray(fired, dtype=np.uint8),
                    _f64(gen), float(sync)),
            ),
        }

    def uninstall(self):
        for name, orig in self._origs.items():
            setattr(NativeScheduler, name, orig)


def _write_sched(fh, sched: NativeScheduler, calls: list[tuple]) -> None:
    c = sched.compiled
    arch = c.arch
    links_per_tile = 4 + max(arch.max_cores_per_tile, 1)
    fh.write(struct.pack(
        "<7i", arch.noc_width_in_tiles, arch.noc_height_in_tiles,
        links_per_tile, arch.noc_buffer_size, c.n_cores,
        len(c.axon_src_slot), c.n_neurons,
    ))
    # _keep holds the create arrays in declaration order (native.py:308).
    for arr in sched._keep:
        fh.write(np.ascontiguousarray(arr).tobytes())
    fh.write(struct.pack("<i", len(calls)))
    for call in calls:
        kind = call[0]
        fh.write(struct.pack("<i", kind))
        if kind in (0, 2):
            _, masks, sync = call
            T, planes, B = masks.shape
            assert planes == 2
            fh.write(struct.pack("<iid", T, B, sync))
            fh.write(masks.tobytes())
        elif kind == 1:
            _, fired, gen, sync = call
            T = fired.shape[0]
            fh.write(struct.pack("<id", T, sync))
            fh.write(fired.tobytes())
            fh.write(gen.tobytes())
        else:
            _, fired, gen, sync = call
            fh.write(struct.pack("<d", sync))
            fh.write(fired.tobytes())
            fh.write(gen.tobytes())


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.gettempdir()) / "sanitize_replay.bin"

    rec = _Recorder()
    rec.install()
    try:
        # 1) tie-heavy monotone chip: packed lite sweep + message trace +
        #    cycle tier (the three hot native paths)
        chip = ge._build_chip(tiles_x=3, tiles_y=3, cores_per_tile=3,
                              neurons_per_core=48, layers=4)
        if chip._get_native_scheduler() is None:
            print("native scheduler unavailable; nothing to capture")
            sys.exit(1)
        with tempfile.TemporaryDirectory() as td:
            chip.sim(24, timing_model="detailed", heartbeat=0,
                     message_trace=str(Path(td) / "messages.csv"))
            chip.reset()
            chip.sim(16, timing_model="cycle", heartbeat=0)

        # 2) non-monotone chip (negative processing latency): forces the
        #    full-scan retirement path through run_chunk's unpacked entry
        #    (same mutation as tests/test_native_sweep.py::negate)
        chip2 = ge._build_chip(tiles_x=2, tiles_y=2, cores_per_tile=2,
                               neurons_per_core=32, layers=3)
        c2 = chip2.compiled
        c2.axon_const_processing_latency = -np.abs(
            c2.axon_const_processing_latency)
        chip2._native = None
        chip2._programs.clear()
        chip2._scan_cache.clear()
        chip2.sim(16, timing_model="detailed", heartbeat=0)

        # 3) sched_run_chunk (unpacked entry, no production callers but
        #    exported API): drive it directly with deterministic masks
        sched = chip2._get_native_scheduler()
        rng = np.random.default_rng(0)
        T = 8
        fired = (rng.random((T, sched._n_axons)) < 0.1).astype(np.uint8)
        gen = rng.random((T, sched._n_neurons)) * 1e-7
        sched.run_chunk(fired, gen, 0.0)
    finally:
        rec.uninstall()

    scheds = [(s, calls) for s, calls in rec.scheds if calls]
    if not scheds:
        print("no native calls captured (device sweep path taken?)")
        sys.exit(1)
    with open(out, "wb") as fh:
        fh.write(struct.pack("<Qi", MAGIC, len(scheds)))
        for sched, calls in scheds:
            _write_sched(fh, sched, calls)
    n_calls = sum(len(c) for _, c in scheds)
    kinds = sorted({k for _, cs in scheds for (k, *_) in cs})
    print(f"captured {len(scheds)} scheduler(s), {n_calls} calls "
          f"(kinds {kinds}) -> {out} ({out.stat().st_size / 1e3:.1f} KB)")


if __name__ == "__main__":
    main()
