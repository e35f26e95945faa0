"""ctypes bindings for the native detailed-timing scheduler.

The hot host-side component — the per-timestep NoC event sweep
(reference ``src/schedule.cpp:208-611``) — is implemented in C++
(``sanafe_tpu/native_src/scheduler.cpp``) and parallelized across the timesteps of a device
chunk with OpenMP. This module compiles the shared library on demand (g++,
cached by mtime) and exposes a :class:`NativeScheduler` bound to one compiled
chip. Falls back cleanly: importers should catch ``NativeUnavailable``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Union

import numpy as np

_SRC_DIR = Path(__file__).resolve().parent / "native_src"
_SRC = _SRC_DIR / "scheduler.cpp"


def _build_dir() -> Path:
    """Build next to the sources when writable (dev checkout), else in a
    per-user cache (installed package in a read-only site-packages)."""
    candidate = _SRC_DIR / "build"
    try:
        candidate.mkdir(parents=True, exist_ok=True)
        return candidate
    except OSError:
        cache = Path(
            os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
        ) / "sanafe_tpu"
        cache.mkdir(parents=True, exist_ok=True)
        return cache


_BUILD_DIR = _build_dir()
_LIB = _BUILD_DIR / "libsanafe_sched.so"

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _compile_library() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
        # -ffp-contract=off: -march=native would otherwise contract the
        # scheduler's a*b+c sequences into FMAs, changing float64 rounding
        # vs the reference binary (built without FMA) — the detailed
        # sim_time must match it bit-for-bit.
        "-shared", "-fPIC", "-fopenmp", str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError as exc:
        raise NativeUnavailable("g++ not available") from exc
    except subprocess.CalledProcessError as exc:
        raise NativeUnavailable(
            f"native scheduler build failed:\n{exc.stderr}"
        ) from exc


def get_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    override = os.environ.get("SANAFE_NATIVE_LIB")
    if override:
        # CI points this at an instrumented build (ASan/UBSan gate in
        # ci/run.py); the file must already exist — no rebuild-on-mtime.
        if not Path(override).exists():
            raise NativeUnavailable(f"SANAFE_NATIVE_LIB not found: {override}")
        lib = ctypes.CDLL(override)
        return _bind(lib)
    if not _SRC.exists():
        raise NativeUnavailable(f"missing source {_SRC}")
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _compile_library()
    lib = ctypes.CDLL(str(_LIB))
    return _bind(lib)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare every exported symbol's signature and cache the library."""
    global _lib

    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.sched_create.restype = ctypes.c_int64
    lib.sched_create.argtypes = (
        [ctypes.c_int32] * 7
        + [i32p] * 10
        + [f64p] * 3
        + [i32p] * 2
        + [f64p] * 3
    )
    lib.sched_destroy.restype = None
    lib.sched_destroy.argtypes = [ctypes.c_int64]
    lib.sched_run_chunk.restype = ctypes.c_int32
    lib.sched_run_chunk.argtypes = [
        ctypes.c_int64, ctypes.c_int32, u8p, f64p, ctypes.c_double, f64p,
        ctypes.c_int32,
    ]
    lib.sched_run_chunk_packed.restype = ctypes.c_int32
    lib.sched_run_chunk_packed.argtypes = [
        ctypes.c_int64, ctypes.c_int32, u8p, ctypes.c_int32,
        ctypes.c_double, f64p, ctypes.c_int32,
    ]
    lib.sched_bench_packed.restype = ctypes.c_double
    lib.sched_bench_packed.argtypes = [
        ctypes.c_int64, ctypes.c_int32, u8p, ctypes.c_int32,
        ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.sched_sweep_profile.restype = ctypes.c_int32
    lib.sched_sweep_profile.argtypes = [
        ctypes.c_int64, ctypes.c_int32, u8p, ctypes.c_int32,
        ctypes.c_double, ctypes.c_int32, f64p,
    ]
    lib.sched_run_chunk_cycle.restype = ctypes.c_int32
    lib.sched_run_chunk_cycle.argtypes = [
        ctypes.c_int64, ctypes.c_int32, u8p, ctypes.c_int32,
        ctypes.c_double, f64p, ctypes.c_int32,
    ]
    lib.sched_run_timestep_trace.restype = ctypes.c_int32
    lib.sched_run_timestep_trace.argtypes = [
        ctypes.c_int64, u8p, f64p, ctypes.c_double, f64p,
        i32p, i32p, f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p,
    ]
    lib.sort_message_trace_order.restype = ctypes.c_int32
    lib.sort_message_trace_order.argtypes = [
        ctypes.POINTER(ctypes.c_int64), u8p, ctypes.c_int32, i32p,
    ]
    lib.serial_keyed_sum_f64.restype = None
    lib.serial_keyed_sum_f64.argtypes = [f64p, i32p, ctypes.c_int64, f64p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.cycle_noc_run.restype = ctypes.c_int64
    lib.cycle_noc_run.argtypes = (
        [ctypes.c_int32] * 9 + [i32p] * 4 + [i64p] * 2 + [i64p]
    )
    lib.format_spike_rows.restype = ctypes.c_int64
    lib.format_spike_rows.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, i32p,
        ctypes.c_int32, u8p, i64p, u8p, ctypes.c_int64,
    ]
    lib.count_mask_bits.restype = ctypes.c_int64
    lib.count_mask_bits.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def format_spike_rows(
    packed_bits: "np.ndarray",
    row_stride: int,
    n_bytes: int,
    t0: int,
    bit_of_label: "np.ndarray",
    blob: bytes,
    label_off: "np.ndarray",
    max_row_bytes: int,
    as_bytes: bool = False,
) -> Optional[Union[str, bytes]]:
    """spikes.csv rows ("label,timestep\\n") formatted in C from bit-packed
    fired masks (numpy packbits MSB-first layout), replacing the ~1 us/row
    Python f-string loop. `packed_bits` must be C-contiguous with one
    timestep's fired bits every `row_stride` bytes; label j fires when bit
    `bit_of_label[j]` of its row is set. Returns the CSV text ("" when no
    rows) — raw UTF-8 bytes when ``as_bytes`` (skips the decode/encode
    round-trip on the megabyte-scale DVS blobs) — or None if the native
    library is unavailable."""
    lib = get_library()
    T = packed_bits.shape[0]
    base = packed_bits.reshape(-1).view(np.uint8)
    count = lib.count_mask_bits(
        _ptr(base, ctypes.c_uint8), np.int64(row_stride), np.int32(T),
        np.int32(n_bytes),
    )
    if count == 0:
        return b"" if as_bytes else ""
    out = np.empty(int(count) * max_row_bytes, dtype=np.uint8)
    blob_arr = np.frombuffer(blob, dtype=np.uint8)
    n = lib.format_spike_rows(
        _ptr(base, ctypes.c_uint8), np.int64(row_stride), np.int32(T),
        np.int64(t0), _ptr(bit_of_label, ctypes.c_int32),
        np.int32(len(bit_of_label)), _ptr(blob_arr, ctypes.c_uint8),
        label_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(out, ctypes.c_uint8), np.int64(len(out)),
    )
    if n < 0:
        return None
    data = out[:n].tobytes()
    return data if as_bytes else data.decode("utf-8")


def cycle_noc_run(
    src_router, dest_router, src_core, dest_core, ready_cycle, proc_cycles,
    width=8, height=4, cores_per_router=4, buffer_size=8, router_delay=2,
    link_delay=1, subnets=1, n_cores=None,
):
    """Run one packet batch through the flit-level cmesh NoC
    (sanafe_tpu/native_src/cycle_noc.h) and return (last_cycle, done_cycles). Test
    hook for exact cycle-count validation. ``subnets`` defaults to 1 so
    hand-traced single-network schedules stay pinnable; the production
    cycle tier runs subnets=2, matching the reference's shipped
    booksim.config (see cycle_noc::Params::subnets for the model)."""
    lib = get_library()
    src_router = _i32(src_router)
    dest_router = _i32(dest_router)
    src_core = _i32(src_core)
    dest_core = _i32(dest_core)
    ready = np.ascontiguousarray(ready_cycle, dtype=np.int64)
    proc = np.ascontiguousarray(proc_cycles, dtype=np.int64)
    n = len(src_router)
    if n_cores is None:
        n_cores = int(max(src_core.max(initial=0),
                          dest_core.max(initial=0))) + 1
    done = np.empty(n, dtype=np.int64)
    i64 = ctypes.c_int64
    last = lib.cycle_noc_run(
        np.int32(width), np.int32(height), np.int32(cores_per_router),
        np.int32(buffer_size), np.int32(router_delay), np.int32(link_delay),
        np.int32(subnets), np.int32(n_cores), np.int32(n),
        _ptr(src_router, ctypes.c_int32), _ptr(dest_router, ctypes.c_int32),
        _ptr(src_core, ctypes.c_int32), _ptr(dest_core, ctypes.c_int32),
        _ptr(ready, i64), _ptr(proc, i64), _ptr(done, i64),
    )
    return int(last), done


def serial_keyed_sum(values: "np.ndarray", keys: "np.ndarray",
                     n_keys: int) -> "np.ndarray":
    """out[k] = sum of values[i] with keys[i]==k, accumulated one float64
    add per event IN INDEX ORDER (numpy reductions are pairwise and do not
    reproduce the reference's serial rounding). Keys < 0 are skipped.
    Falls back to a Python loop when the native library is unavailable."""
    values = np.ascontiguousarray(values, dtype=np.float64)
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    out = np.zeros(n_keys, dtype=np.float64)
    try:
        lib = get_library()
    except NativeUnavailable:
        acc = out.tolist()
        for k, v in zip(keys.tolist(), values.tolist()):
            if k >= 0:
                acc[k] += v
        return np.asarray(acc)
    lib.serial_keyed_sum_f64(
        _ptr(values, ctypes.c_double), _ptr(keys, ctypes.c_int32),
        np.int64(len(values)), _ptr(out, ctypes.c_double),
    )
    return out


def sort_message_trace_order(mids, placeholders) -> "np.ndarray":
    """Permutation sorting a timestep's messages for the trace, replicating
    the reference's std::sort + CompareMessagesByID exactly (including the
    unstable ordering of equivalent placeholder entries). Raises
    NativeUnavailable when the library cannot be built."""
    lib = get_library()
    mids = np.ascontiguousarray(mids, dtype=np.int64)
    placeholders = np.ascontiguousarray(placeholders, dtype=np.uint8)
    perm = np.empty(len(mids), dtype=np.int32)
    lib.sort_message_trace_order(
        mids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(placeholders, ctypes.c_uint8),
        np.int32(len(mids)),
        _ptr(perm, ctypes.c_int32),
    )
    return perm


def _i32(arr) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.int32)


def _f64(arr) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.float64)


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class NativeScheduler:
    """One compiled chip registered with the native scheduler library."""

    def __init__(self, compiled):
        lib = get_library()
        c = compiled
        n_axons = len(c.axon_src_slot)
        core_lo = np.full(c.n_cores, -1, dtype=np.int32)
        core_hi = np.full(c.n_cores, -1, dtype=np.int32)
        for core in c.cores:
            if core.neuron_slots:
                core_lo[core.core_id] = core.neuron_slots[0]
                core_hi[core.core_id] = core.neuron_slots[-1]

        # Per-neuron generation-latency components (float64), mirroring
        # process_neuron's accumulation (src/chip.cpp:710-736)
        lat_base = _f64(
            c.soma_lat_access
            + c.dendrite_in_neuron_phase * c.dendrite_lat_update
        )
        self._keep = [
            _i32(c.axon_src_slot), _i32(c.axon_src_core),
            _i32(c.axon_dest_core), _i32(c.axon_src_x), _i32(c.axon_src_y),
            _i32(c.axon_dest_x), _i32(c.axon_dest_y),
            _i32(c.axon_src_core_offset), _i32(c.axon_hops),
            _i32(c.axon_ordinal_in_neuron),
            _f64(c.axon_latency_out), _f64(c.axon_const_processing_latency),
            _f64(c.axon_min_hop_delay), core_lo, core_hi,
            lat_base, _f64(c.soma_lat_update), _f64(c.soma_lat_spike),
        ]
        arch = c.arch
        links_per_tile = 4 + max(arch.max_cores_per_tile, 1)
        args = (
            [
                np.int32(arch.noc_width_in_tiles),
                np.int32(arch.noc_height_in_tiles),
                np.int32(links_per_tile),
                np.int32(arch.noc_buffer_size),
                np.int32(c.n_cores),
                np.int32(n_axons),
                np.int32(c.n_neurons),
            ]
            + [_ptr(a, ctypes.c_int32) for a in self._keep[:10]]
            + [_ptr(a, ctypes.c_double) for a in self._keep[10:13]]
            + [_ptr(a, ctypes.c_int32) for a in self._keep[13:15]]
            + [_ptr(a, ctypes.c_double) for a in self._keep[15:]]
        )
        self._lib = lib
        self._handle = lib.sched_create(*args)
        self._n_axons = n_axons
        self._n_neurons = c.n_neurons
        self._n_cores = c.n_cores
        self.compiled = compiled

    def run_chunk(
        self,
        fired: np.ndarray,
        gen_lat: np.ndarray,
        sync_delay: float,
        n_threads: int = 0,
    ) -> np.ndarray:
        """Detailed sim_time for T timesteps. fired: [T, A] bool/uint8,
        gen_lat: [T, N] float64."""
        fired = np.ascontiguousarray(fired, dtype=np.uint8)
        gen_lat = _f64(gen_lat)
        T = fired.shape[0]
        sim_time = np.empty(T, dtype=np.float64)
        rc = self._lib.sched_run_chunk(
            self._handle, np.int32(T), _ptr(fired, ctypes.c_uint8),
            _ptr(gen_lat, ctypes.c_double), float(sync_delay),
            _ptr(sim_time, ctypes.c_double), np.int32(n_threads),
        )
        if rc != 0:
            raise RuntimeError("native scheduler run_chunk failed")
        return sim_time

    def run_chunk_packed(
        self,
        masks_packed: np.ndarray,
        sync_delay: float,
        n_threads: int = 0,
    ) -> np.ndarray:
        """Detailed sim_time for T timesteps from the device's bit-packed
        masks tensor [T, 2, mask_bytes] (plane 0 fired, plane 1 updated)."""
        masks_packed = np.ascontiguousarray(masks_packed, dtype=np.uint8)
        T, planes, mask_bytes = masks_packed.shape
        assert planes == 2
        sim_time = np.empty(T, dtype=np.float64)
        rc = self._lib.sched_run_chunk_packed(
            self._handle, np.int32(T), _ptr(masks_packed, ctypes.c_uint8),
            np.int32(mask_bytes), float(sync_delay),
            _ptr(sim_time, ctypes.c_double), np.int32(n_threads),
        )
        if rc != 0:
            raise RuntimeError("native scheduler packed run failed")
        return sim_time

    def bench_packed(
        self,
        masks_packed: np.ndarray,
        sync_delay: float,
        iters: int = 1,
        phase: int = 1,
    ) -> float:
        """Profiling hook: re-run the packed chunk `iters` times. phase
        0 times the message build alone; phase 1 times build + the serial
        sweep; phase N>=2 times build + the N-lane interleaved group sweep
        (capped at 8 lanes — scheduler.cpp sweep_timestep_lite_group).
        Returns -1.0 when the chip lacks the monotone-receive fast path
        (bench requires the lite sweep); callers must check for this."""
        masks_packed = np.ascontiguousarray(masks_packed, dtype=np.uint8)
        T, planes, mask_bytes = masks_packed.shape
        assert planes == 2
        return float(self._lib.sched_bench_packed(
            self._handle, np.int32(T), _ptr(masks_packed, ctypes.c_uint8),
            np.int32(mask_bytes), float(sync_delay), np.int32(iters),
            np.int32(phase),
        ))

    def sweep_profile(
        self,
        masks_packed: np.ndarray,
        sync_delay: float,
        iters: int = 1,
    ) -> Optional[dict]:
        """Section-level rdtsc profile of the lite event sweep (the
        kProf=true template instantiation — bit-identical float64 path,
        extra counter instructions). Returns cycles per section plus event
        counts, or None when the chip lacks the lite fast path. Profiling
        tool only; never on the simulation path."""
        masks_packed = np.ascontiguousarray(masks_packed, dtype=np.uint8)
        T, planes, mask_bytes = masks_packed.shape
        assert planes == 2
        out = np.zeros(12, dtype=np.float64)
        rc = self._lib.sched_sweep_profile(
            self._handle, np.int32(T), _ptr(masks_packed, ctypes.c_uint8),
            np.int32(mask_bytes), float(sync_delay), np.int32(iters),
            _ptr(out, ctypes.c_double),
        )
        if rc != 0:
            return None
        return {
            "pop_cycles": out[0], "retire_cycles": out[1],
            "send_cycles": out[2], "push_cycles": out[3],
            "events": out[4], "retire_calls": out[5], "drains": out[6],
            "checksum": out[7],
        }

    def run_chunk_cycle(
        self,
        masks_packed: np.ndarray,
        sync_delay: float,
        n_threads: int = 0,
    ) -> np.ndarray:
        """Cycle-accurate sim_time for T timesteps via the flit-level cmesh
        NoC model (sanafe_tpu/native_src/cycle_noc.h)."""
        masks_packed = np.ascontiguousarray(masks_packed, dtype=np.uint8)
        T, planes, mask_bytes = masks_packed.shape
        assert planes == 2
        sim_time = np.empty(T, dtype=np.float64)
        rc = self._lib.sched_run_chunk_cycle(
            self._handle, np.int32(T), _ptr(masks_packed, ctypes.c_uint8),
            np.int32(mask_bytes), float(sync_delay),
            _ptr(sim_time, ctypes.c_double), np.int32(n_threads),
        )
        if rc != 0:
            raise RuntimeError("native scheduler cycle run failed")
        return sim_time

    def run_timestep_trace(
        self, fired: np.ndarray, gen_lat: np.ndarray, sync_delay: float
    ) -> tuple[float, dict[str, np.ndarray]]:
        """One timestep, returning sim_time and per-message fields in
        creation (core-major) order."""
        fired = np.ascontiguousarray(fired, dtype=np.uint8)
        gen_lat = _f64(gen_lat)
        max_msgs = int(fired.sum()) + self._n_cores
        out = {
            "axon": np.empty(max_msgs, dtype=np.int32),
            "src_core": np.empty(max_msgs, dtype=np.int32),
            "generation_delay": np.empty(max_msgs, dtype=np.float64),
            "processing_delay": np.empty(max_msgs, dtype=np.float64),
            "network_delay": np.empty(max_msgs, dtype=np.float64),
            "blocking_delay": np.empty(max_msgs, dtype=np.float64),
            "sent_timestamp": np.empty(max_msgs, dtype=np.float64),
            "received_timestamp": np.empty(max_msgs, dtype=np.float64),
            "processed_timestamp": np.empty(max_msgs, dtype=np.float64),
            "route_density": np.empty(max_msgs, dtype=np.float64),
        }
        sim_time = np.empty(1, dtype=np.float64)
        count = self._lib.sched_run_timestep_trace(
            self._handle, _ptr(fired, ctypes.c_uint8),
            _ptr(gen_lat, ctypes.c_double), float(sync_delay),
            _ptr(sim_time, ctypes.c_double),
            _ptr(out["axon"], ctypes.c_int32),
            _ptr(out["src_core"], ctypes.c_int32),
            _ptr(out["generation_delay"], ctypes.c_double),
            _ptr(out["processing_delay"], ctypes.c_double),
            _ptr(out["network_delay"], ctypes.c_double),
            _ptr(out["blocking_delay"], ctypes.c_double),
            _ptr(out["sent_timestamp"], ctypes.c_double),
            _ptr(out["received_timestamp"], ctypes.c_double),
            _ptr(out["processed_timestamp"], ctypes.c_double),
            _ptr(out["route_density"], ctypes.c_double),
        )
        if count < 0:
            raise RuntimeError("native scheduler trace run failed")
        return float(sim_time[0]), {k: v[:count] for k, v in out.items()}

    def __del__(self):
        try:
            if getattr(self, "_handle", -1) >= 0:
                self._lib.sched_destroy(self._handle)
        except Exception:
            pass
