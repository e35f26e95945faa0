"""SpikingChip: the user-facing simulator object.

Host orchestration equivalent of the reference's ``SpikingChip``
(``src/chip.hpp:56-210``, ``src/pymodule.cpp:549-706``): owns the compiled
chip program, runs the jitted timestep scan on device in chunks, streams
per-chunk outputs back for trace writing and RunData accumulation, and runs
the chosen timing model (simple on device; detailed via the native C++
event sweep with an exact Python fallback; ``cycle`` via the native
flit-level cmesh NoC model in ``sanafe_tpu/native_src/cycle_noc.h``, the Booksim2-tier
equivalent).

``sim()`` keyword surface matches the reference Python module
(``src/pymodule.cpp:1198-1209``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import os
import sys
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import numpy as np

from .arch import Architecture
from .compile import CompiledChip, compile_chip
from .network import SpikingNetwork
from .ops.step import DeviceProgram, make_device_program
from .ops.timing import (
    MessageRecord,
    build_timestep_messages,
    records_from_native,
    schedule_timestep_detailed,
    schedule_timestep_simple_messages,
    write_message_rows_fast,
)
from .trace import (
    MessageTrace,
    NeuronAddress,
    NeuronTrace,
    PerfTrace,
    PotentialTrace,
    SpikeTrace,
    TraceSink,
    fmt_e,
    fmt_g,
    message_to_dict,
    write_message_header,
    write_message_row,
    write_neuron_trace_header,
    write_perf_header,
    write_potential_header,
    write_spike_header,
)

TIMING_MODELS = ("simple", "detailed", "cycle")
HEARTBEAT_TIMESTEPS = 100  # src/chip.hpp:38
# chunk outputs that stay on the device unless a fallback needs them
DEVICE_RESIDENT = ("masks_device", "spikes_device")


# Sparse-spike overflow fallback: gather burst-step rows from a
# device-resident plane. The index argument has a FIXED capacity so the
# gather compiles exactly once per plane shape — a naive
# ``jnp.take(plane, over)`` recompiles for every distinct overflow count,
# and each recompile costs ~0.6 s over the tunneled backend (this was the
# round-3 simple-tier throughput regression).
_OVERFLOW_GATHER_CAP = 128


@jax.jit
def _gather_rows_padded(plane, idx):
    rows = jnp.take(plane, idx, axis=0)
    if rows.dtype == jnp.bool_:
        # bool tensors take a pathological transfer path on the tunneled
        # backend; widen on device
        rows = rows.astype(jnp.uint8)
    return rows


def _fetch_rows(plane, over: np.ndarray) -> np.ndarray:
    """Fetch ``plane[over]`` to host numpy with shape-stable compiles."""
    out = []
    for i in range(0, len(over), _OVERFLOW_GATHER_CAP):
        batch = over[i : i + _OVERFLOW_GATHER_CAP]
        idx = np.zeros(_OVERFLOW_GATHER_CAP, dtype=np.int32)
        idx[: len(batch)] = batch
        got = np.asarray(_gather_rows_padded(plane, jnp.asarray(idx)))
        out.append(got[: len(batch)])
    return np.concatenate(out, axis=0)


class _FetchAhead:
    """Drains one chunk's device outputs to host numpy on a worker thread.

    On a transfer-bound link (the tunnel-attached TPU) the blocking read at
    ``np.asarray()`` time is the real cost — ``copy_to_host_async`` alone
    does not hide it — so the read of chunk k+1 runs on this thread while
    the main thread sweeps chunk k. ``masks_device`` stays device-resident
    (only fetched if the device sweep overflows). Disable with
    ``SANAFE_TPU_ASYNC_FETCH=0``.
    """

    def __init__(self, outputs: dict):
        self._outputs = outputs
        self._fetched: Optional[dict] = None
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None
        if os.environ.get("SANAFE_TPU_ASYNC_FETCH", "1") != "0":
            self._thread = threading.Thread(target=self._drain, daemon=True)
            self._thread.start()

    def _drain(self) -> None:
        try:
            self._fetched = {
                key: np.asarray(value)
                for key, value in self._outputs.items()
                if key not in DEVICE_RESIDENT
                and isinstance(value, jax.Array)
            }
        except BaseException as exc:  # re-raised on the consumer thread
            self._error = exc

    def get(self) -> dict:
        if self._thread is not None:
            self._thread.join()
            if self._error is not None:
                raise self._error
            if self._fetched:
                return {**self._outputs, **self._fetched}
        return self._outputs


class _AsyncTraceWriter:
    """Order-preserving background writer for trace-file blobs.

    The host has ONE CPU: the detailed sweep (pure CPU, GIL released) and
    the spikes.csv disk writes (I/O wait) serialize if both run on the
    simulation thread. Routing the formatted row blobs through this FIFO
    thread overlaps the disk wait with the next chunk's sweep. Drained
    before sim() returns so trace files are complete when the call ends.
    Disable with ``SANAFE_TPU_ASYNC_TRACE=0``.
    """

    def __init__(self):
        import queue

        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            sink, data = item
            try:
                if self._error is None:
                    if isinstance(data, bytes):
                        sink.write_bytes(data)
                    else:
                        sink.write(data)
            except BaseException as exc:  # re-raised at drain()
                self._error = exc

    def submit(self, sink, data) -> None:
        if self._error is not None:
            error, self._error = self._error, None
            raise error
        self._queue.put((sink, data))

    def drain(self) -> None:
        """Block until every queued write hit its sink, then stop."""
        self._queue.put(None)
        self._thread.join()
        if self._error is not None:
            error, self._error = self._error, None
            raise error


DEFAULT_CHUNK = 1024


def _plan_chunks(total: int, chunk: int, taper: int) -> list:
    """Chunk schedule for one sim() call. With a host-side timing sweep the
    per-chunk pipeline is: dispatch -> device compute + fetch (overlapped
    with the PREVIOUS chunk's sweep) -> sweep. Two bubbles remain: the
    HEAD (nothing to sweep while the first chunk computes/transfers) and
    the TAIL (the last chunk's sweep overlaps nothing). Tapering both to
    ``taper`` steps shrinks each bubble ~3x at DVS scale while middle
    chunks stay full-size; distinct lengths are kept to <=3 extra compiles.
    """
    sizes = []
    rem = total
    if taper > 0 and rem > taper:
        sizes.append(taper)  # head
        rem -= taper
    mid = rem - taper if taper > 0 and rem > taper else rem
    while mid > 0:
        step = min(chunk, mid)
        sizes.append(step)
        mid -= step
    if taper > 0 and rem > taper:
        sizes.append(taper)  # tail
    return sizes


def _masks_to_fired_gen(c, masks: np.ndarray):
    """Unpack a chunk's [T, 2, nbytes] fired/updated bitmaps into the
    per-step fired-axon matrix and per-neuron float64 generation
    latencies (access + update + spike + neuron-phase dendrite costs),
    mirroring process_neuron (src/chip.cpp:710-736). Shared by every
    host-side timing tier so the latency formula lives in one place."""
    n = c.n_neurons
    fired_n = np.unpackbits(masks[:, 0, :], axis=1)[:, :n].astype(bool)
    updated_n = np.unpackbits(masks[:, 1, :], axis=1)[:, :n].astype(bool)
    fired_axons = fired_n[:, c.axon_src_slot]
    gen_latency = (
        c.soma_lat_access[None, :]
        + updated_n * c.soma_lat_update[None, :]
        + fired_n * c.soma_lat_spike[None, :]
        + c.dendrite_in_neuron_phase[None, :]
        * c.dendrite_lat_update[None, :]
    )
    return fired_axons, gen_latency


@dataclass
class RunData:
    """Accumulated results of one sim() call (src/chip.hpp RunData)."""

    timestep_start: int = 0
    timesteps_executed: int = 0
    total_energy: float = 0.0
    synapse_energy: float = 0.0
    dendrite_energy: float = 0.0
    soma_energy: float = 0.0
    network_energy: float = 0.0
    sim_time: float = 0.0
    spikes: int = 0
    packets_sent: int = 0
    neurons_updated: int = 0
    neurons_fired: int = 0

    def to_dict(self) -> dict:
        """Matches run_data_to_dict (src/pymodule.cpp:268-288)."""
        return {
            "timestep_start": self.timestep_start,
            "timesteps_executed": self.timesteps_executed,
            "energy": {
                "total": self.total_energy,
                "synapse": self.synapse_energy,
                "dendrite": self.dendrite_energy,
                "soma": self.soma_energy,
                "network": self.network_energy,
            },
            "sim_time": self.sim_time,
            "spikes": self.spikes,
            "packets_sent": self.packets_sent,
            "neurons_updated": self.neurons_updated,
            "neurons_fired": self.neurons_fired,
        }


@dataclass
class _TraceState:
    sink: TraceSink
    memory: Any = None


class MappedNeuron:
    """View of one neuron mapped onto a loaded chip; ``set_attributes``
    mutates the chip's compiled arrays in place (reference
    ``MappedNeuron::set_attributes``, src/pymodule.cpp:502-527)."""

    def __init__(self, chip: "SpikingChip", ref):
        self._chip = chip
        self._ref = ref

    @property
    def group_name(self) -> str:
        return self._ref.group_name

    @property
    def offset(self) -> int:
        return self._ref.offset

    @property
    def id(self) -> int:
        return self._ref.global_id

    def get_potential(self) -> float:
        state = self._chip._device_state
        if state is None:
            return float(self._chip.compiled.initial_potential[self._ref.slot])
        return float(np.asarray(state["potential"])[self._ref.slot])

    def set_attributes(self, model_attributes: dict | None = None) -> None:
        from .compile import (
            _apply_lif_attribute,
            _apply_truenorth_attribute,
            _plugin_param_array,
        )
        from .models import (
            SOMA_MODEL_LIF,
            SOMA_MODEL_PLUGIN_BASE,
            SOMA_MODEL_TRUENORTH,
        )
        from .network import _wrap_attribute_dict

        chip = self._chip
        c = chip.compiled
        ref = self._ref
        slot = ref.slot
        attrs = _wrap_attribute_dict(model_attributes or {})
        model_id = ref.soma_unit.spec.soma_model_id
        for key, attribute in attrs.items():
            if not attribute.forward_to_soma:
                continue
            if model_id == SOMA_MODEL_LIF:
                _apply_lif_attribute(c, slot, key, attribute)
            elif model_id == SOMA_MODEL_TRUENORTH:
                _apply_truenorth_attribute(c, slot, key, attribute)
            elif model_id >= SOMA_MODEL_PLUGIN_BASE:
                spec = ref.soma_unit.spec
                if key in spec.param_defaults:
                    _plugin_param_array(c, spec, key)[slot] = (
                        attribute.as_float()
                    )
        # 'potential' writes live state directly (the reference sets
        # cx.potential on the loaded compartment)
        if "potential" in attrs and chip._device_state is not None:
            state = dict(chip._device_state)
            potential = np.asarray(state["potential"]).copy()
            potential[slot] = attrs["potential"].as_float()
            state["potential"] = jax.numpy.asarray(
                potential, dtype=np.asarray(state["potential"]).dtype
            )
            chip._device_state = state
        chip._invalidate_programs()

    def __repr__(self) -> str:
        return f"MappedNeuron({self.group_name}.{self.offset})"


class SpikingChip:
    def __init__(self, arch: Architecture):
        # first point a user actually runs compute: set up the persistent
        # XLA compilation cache here rather than at package import
        import sanafe_tpu

        sanafe_tpu._enable_compilation_cache()
        self.arch = arch
        self.compiled: Optional[CompiledChip] = None
        self.total_timesteps = 0
        self.total_energy = 0.0
        self.synapse_energy = 0.0
        self.dendrite_energy = 0.0
        self.soma_energy = 0.0
        self.network_energy = 0.0
        self.total_sim_time = 0.0
        self.total_spikes = 0
        self.total_messages_sent = 0
        self.total_neurons_updated = 0
        self.total_neurons_fired = 0
        # simulator wall-time breakdown (run_summary.yaml wall_time section)
        self.setup_wall = 0.0
        self.neuron_processing_wall = 0.0
        self.message_processing_wall = 0.0
        self.scheduler_wall = 0.0
        self.energy_stats_wall = 0.0
        # diagnostic (not part of run_summary): time the sim loop spent
        # blocked waiting for a chunk's device outputs to land on host
        self.fetch_wait_wall = 0.0

        self._device_state = None
        self._nets: list[SpikingNetwork] = []
        self._programs: dict[tuple, DeviceProgram] = {}
        self._scan_cache: dict[tuple, Any] = {}
        self._trace_states: dict[str, _TraceState] = {}
        # Multi-device scale-out (sim(mesh=...)): the padded compiled view
        # programs are built from, and which mesh the live state is placed
        # on (None = single-device).
        self._mesh = None
        self._padded_compiled: Optional[CompiledChip] = None
        self._state_mesh = None
        # neuron count of the ACTIVE device program (padded when sharded);
        # _process_chunk_outputs uses it to decode padded mask planes
        self._prog_n_neurons: Optional[int] = None

    # --- loading -------------------------------------------------------------
    def load(self, net: SpikingNetwork, overwrite: bool = False) -> None:
        """Map an SNN onto the chip (src/chip.cpp:129-184). With
        ``overwrite=True`` (or on a fresh chip) the chip is reprogrammed
        from scratch; with ``overwrite=False`` on an already-loaded chip the
        new network augments it — new neurons map into the remaining slots
        and existing neurons keep their live state."""
        start = time.perf_counter()
        if self.compiled is not None and not overwrite:
            for name in net.groups:
                if name in self._merged_groups():
                    raise ValueError(
                        f"Group {name!r} already mapped on this chip; "
                        "augmenting requires unique group names"
                    )
            # renumber mapping orders so the new net maps after existing ones
            base = max(
                (
                    neuron.mapping_order
                    for loaded in self._nets
                    for group in loaded.groups.values()
                    for neuron in group.neurons
                ),
                default=0,
            )
            for group in net.groups.values():
                for neuron in group.neurons:
                    if neuron.core_address is not None:
                        neuron.mapping_order += base
            self._nets.append(net)
            old_compiled = self.compiled
            old_state = self._device_state
            self.compiled = compile_chip(self.arch, self._merged_network())
            self._programs.clear()
            self._scan_cache.clear()
            if old_state is not None:
                self._device_state = self._migrate_state(
                    old_compiled, old_state
                )
        else:
            self._nets = [net]
            self.compiled = compile_chip(self.arch, net)
            self._programs.clear()
            self._scan_cache.clear()
            self._device_state = None
        # spike-trace caches are keyed on label COUNT; a different network
        # with the same number of logged neurons would stream stale labels
        self._spike_labels = None
        self._spike_blob = None
        self._spike_addresses = None
        self.setup_wall += time.perf_counter() - start

    def _merged_groups(self) -> set:
        return {
            name for loaded in self._nets for name in loaded.groups
        }

    def _merged_network(self):
        """A view combining every loaded network's groups."""

        class _MergedNetwork:
            pass

        merged = _MergedNetwork()
        merged.groups = {}
        merged.name = self._nets[0].name if self._nets else ""
        for loaded in self._nets:
            merged.groups.update(loaded.groups)
        return merged

    def _migrate_state(self, old_compiled, old_state) -> dict:
        """Carry live per-neuron state across a recompile: existing neurons
        keep their values at their (possibly shifted) new slots; new
        neurons start from init."""
        prog = make_device_program(self.compiled)
        new_state = {k: np.asarray(v).copy() for k, v in prog.init_state().items()}
        new_slot_of = {
            (ref.group_name, ref.offset): ref.slot
            for ref in self.compiled.neurons
        }
        old_slots, new_slots = [], []
        for ref in old_compiled.neurons:
            new_slot = new_slot_of.get((ref.group_name, ref.offset))
            if new_slot is not None:
                old_slots.append(ref.slot)
                new_slots.append(new_slot)
        old_slots = np.asarray(old_slots, dtype=np.int64)
        new_slots = np.asarray(new_slots, dtype=np.int64)
        for key, old_value in old_state.items():
            if key not in new_state:
                continue
            old_np = np.asarray(old_value)
            if key == "delay_ring":
                new_state[key][:, new_slots] = old_np[:, old_slots]
            else:
                new_state[key][new_slots] = old_np[old_slots]
        return {
            k: jax.numpy.asarray(v) for k, v in new_state.items()
        }

    @property
    def mapped_neuron_groups(self) -> dict[str, list]:
        """Group name → list of MappedNeuron views supporting runtime
        attribute updates between sim() calls (src/pymodule.cpp:502-527)."""
        if self.compiled is None:
            return {}
        groups: dict[str, list] = {}
        for name, slots in self.compiled.groups.items():
            groups[name] = [
                MappedNeuron(self, self.compiled.neurons[s]) for s in slots
            ]
        return groups

    def _invalidate_programs(self) -> None:
        """Force device programs to rebuild from the (mutated) compiled
        arrays on the next sim() call; live state is preserved."""
        self._programs.clear()
        self._scan_cache.clear()
        self._padded_compiled = None

    def set_mesh(self, mesh) -> None:
        """Shard (or unshard, ``mesh=None``) this chip over a
        ``jax.sharding.Mesh``. Device programs rebuild on the next sim();
        live neuron state is migrated (padded slots are inert, so the
        round-trip single→sharded→single is lossless)."""
        self._mesh = mesh
        self._state_mesh = None
        self._invalidate_programs()

    def _compiled_for_programs(self) -> CompiledChip:
        """The compiled view device programs are built from: the chip's
        compiled arrays, padded to a device-count multiple when a mesh is
        active (sanafe_tpu/parallel.pad_compiled; pad slots never update,
        fire, or carry energy)."""
        if self._mesh is None:
            return self.compiled
        if self._padded_compiled is None:
            import math

            from .parallel import pad_compiled

            n_dev = math.prod(self._mesh.shape.values())
            self._padded_compiled = pad_compiled(
                self.compiled, multiple=n_dev
            )
        return self._padded_compiled

    def _adapt_state(self, prog: DeviceProgram):
        """Fit the live device state to the active program: grow (pad) or
        shrink (unpad) the neuron axis, then place it on the active mesh.
        Pad slots hold init values and are never read by real slots, so
        both directions preserve every real neuron's state exactly."""
        state = self._device_state
        n_want = prog.compiled.n_neurons
        n_have = int(np.asarray(state["potential"]).shape[0])
        if n_have != n_want:
            init = prog.init_state()
            m = min(n_have, n_want)
            new = {}
            for key, value in init.items():
                arr = np.asarray(value).copy()
                if key in state:
                    old = np.asarray(state[key])
                    if key == "delay_ring":
                        arr[:, :m] = old[:, :m]
                    else:
                        arr[:m] = old[:m]
                new[key] = jax.numpy.asarray(arr)
            state = new
            self._state_mesh = None
        if self._mesh is not None and self._state_mesh is not self._mesh:
            from .parallel import shard_state

            state = shard_state(state, self._mesh)
            self._state_mesh = self._mesh
        return state

    # --- simulation ----------------------------------------------------------
    def sim(
        self,
        timesteps: int = 1,
        timing_model: str = "detailed",
        processing_threads: int = 0,
        scheduler_threads: int = 0,
        spike_trace: Any = None,
        potential_trace: Any = None,
        neuron_trace: Any = None,
        perf_trace: Any = None,
        message_trace: Any = None,
        write_trace_headers: bool = True,
        heartbeat: int = HEARTBEAT_TIMESTEPS,
        chunk: int = DEFAULT_CHUNK,
        device_sweep: Optional[bool] = None,
        mesh: Any = None,
    ) -> dict:
        """Run ``timesteps`` steps (src/chip.cpp:477-533 / pymodule.cpp:549).

        ``mesh``: a ``jax.sharding.Mesh`` shards the simulated-neuron axis
        of the device program across the mesh's devices (SPMD scale-out;
        see sanafe_tpu/parallel). The mesh is sticky across sim() calls;
        pass a different mesh or call ``set_mesh(None)`` to change it.
        Trace outputs, counters, and the detailed host sweep are
        byte-identical to the single-device run (padded slots are inert;
        tests/test_parallel.py::test_sim_sharded_trace_parity)."""
        if self.compiled is None:
            raise RuntimeError("No network loaded; call load() first")
        if mesh is not None and mesh is not self._mesh:
            self.set_mesh(mesh)
        if timing_model not in TIMING_MODELS:
            raise ValueError(f"Timing model not recognized: {timing_model}")
        if timing_model == "cycle" and self._get_native_scheduler() is None:
            print(
                "Warning: the cycle-accurate NoC model needs the native "
                "scheduler (C++ toolchain); falling back to the detailed "
                "model.",
                file=sys.stderr,
            )
            timing_model = "detailed"
        # processing_threads / scheduler_threads are accepted for API parity;
        # the device program is already fully parallel.
        del processing_threads, scheduler_threads

        rd = RunData(timestep_start=self.total_timesteps + 1)
        rd.timesteps_executed = timesteps

        # Trace objects are constructed per sim() call, matching the
        # reference Python module (src/pymodule.cpp:549-706 builds fresh
        # PyTrace objects each call)
        self.close()
        self._open_traces(
            spike_trace,
            potential_trace,
            neuron_trace,
            perf_trace,
            message_trace,
            write_trace_headers,
        )

        traces = self._trace_states
        self._trace_writer = None
        if os.environ.get("SANAFE_TPU_ASYNC_TRACE", "1") != "0" and any(
            state.sink.stream is not None for state in traces.values()
        ):
            self._trace_writer = _AsyncTraceWriter()
        record_spikes = traces["spike"].sink.enabled
        record_potentials = traces["potential"].sink.enabled
        record_u = traces["neuron"].sink.enabled
        need_messages = traces["message"].sink.enabled
        need_detailed = timing_model in ("detailed", "cycle")
        record_fired_axons = need_messages or need_detailed
        # Opt-in on-device detailed-timing tier (ops/device_sweep.py). The
        # exact float64 host sweep stays the default; the device tier keeps
        # spike rasters and energies untouched and deviates from the host
        # sim_time only in float round-off / tie order (<=1%, documented).
        # The message trace needs per-message fields, which only the host
        # sweep produces.
        if device_sweep is None:
            device_sweep = (
                os.environ.get("SANAFE_TPU_DEVICE_SWEEP", "0") == "1"
            )
        use_device_sweep = bool(
            device_sweep
            and timing_model == "detailed"
            and not need_messages
        )
        # Byte-exact perf energy columns (ops/exact_energy.py): active on
        # the float64 parity path whenever perf rows are produced; the
        # float32 TPU fast path keeps the fused device sums.
        self._exact_energy = None
        if (
            traces["perf"].sink.enabled
            and jax.config.jax_enable_x64
            and os.environ.get("SANAFE_TPU_EXACT_ENERGY", "1") != "0"
        ):
            self._exact_energy = self._get_exact_energy()
        record_fired_axons = (
            record_fired_axons or self._exact_energy is not None
        )

        prog_key = (
            record_fired_axons,
            record_potentials,
            record_spikes,
            record_u,
        )
        prog = self._programs.get(prog_key)
        if prog is None:
            start = time.perf_counter()
            prog = make_device_program(
                self._compiled_for_programs(),
                record_fired_axons=record_fired_axons,
                record_potentials=record_potentials,
                record_spikes=record_spikes,
                record_u=record_u,
            )
            if self._mesh is not None:
                from .parallel import shard_program

                shard_program(prog, self._mesh)
            self._programs[prog_key] = prog
            self.setup_wall += time.perf_counter() - start
        self._prog_n_neurons = prog.compiled.n_neurons
        if self._device_state is None:
            self._device_state = prog.init_state()
            if self._mesh is not None:
                from .parallel import shard_state

                self._device_state = shard_state(
                    self._device_state, self._mesh
                )
                self._state_mesh = self._mesh
        else:
            self._device_state = self._adapt_state(prog)

        remaining = timesteps
        t0 = self.total_timesteps + 1
        pending = None  # (lazy outputs, t0, length) — double buffering:
        # chunk k's host-side processing overlaps chunk k+1's device work
        interrupted: Optional[BaseException] = None
        try:
            perf_on = traces["perf"].sink.enabled
            # Head + tail taper on host-sweep timing models: the first
            # chunk's device compute + transfer and the last chunk's host
            # sweep are pipeline bubbles that overlap nothing, so both get
            # a small chunk; middle chunks stay full-size (see
            # _plan_chunks).
            taper = 0
            if timing_model in ("detailed", "cycle") and not use_device_sweep:
                taper = int(
                    os.environ.get("SANAFE_TPU_HEAD_CHUNK", "128")
                )
            for this_chunk in _plan_chunks(remaining, chunk, taper):
                # sparse_spike_k / mask-wire config are env-tunable between
                # sim() calls, so they must key the cache alongside the
                # structural flags
                scan_key = (prog_key, this_chunk, perf_on,
                            use_device_sweep, prog.sparse_spike_k(),
                            prog.sparse_over_rows(this_chunk),
                            os.environ.get("SANAFE_TPU_MASK_WIRE", "1"),
                            os.environ.get("SANAFE_TPU_MASK_WIRE_CAP",
                                           "768"))
                run_chunk = self._scan_cache.get(scan_key)
                if run_chunk is None:
                    run_chunk = self._make_chunk_runner(
                        prog, this_chunk, perf_on, use_device_sweep
                    )
                    self._scan_cache[scan_key] = run_chunk
                device_start = time.perf_counter()
                feeds = self._build_feeds(this_chunk)
                self._device_state, outputs = run_chunk(
                    self._device_state, np.int64(t0), feeds
                )
                self.neuron_processing_wall += (
                    time.perf_counter() - device_start
                )
                # Kick off the device->host copies immediately: they enqueue
                # behind the chunk's compute on the device stream, so the
                # transfer overlaps the PREVIOUS chunk's host-side sweep
                # instead of serializing with it at np.asarray() time.
                for key, value in outputs.items():
                    if key in DEVICE_RESIDENT:
                        # fetched only if a sweep/sparse-spike fallback
                        # trips
                        continue
                    copy_async = getattr(value, "copy_to_host_async", None)
                    if copy_async is not None:
                        copy_async()
                # On transfer-bound links (the TPU tunnel) the blocking
                # np.asarray() read itself is the cost, not just the device
                # wait — drain it on a worker thread so the transfer of
                # chunk k+1 overlaps chunk k's host-side sweep below.
                fetch = _FetchAhead(outputs)
                # Consume `pending` BEFORE processing it: if Ctrl-C lands
                # inside the host-side sweep, the drain below must not
                # process (and double-count) the same chunk again.
                to_process, pending = pending, None
                if to_process is not None:
                    wait_start = time.perf_counter()
                    got = to_process[0].get()
                    self.fetch_wait_wall += time.perf_counter() - wait_start
                    self._process_chunk_outputs(
                        got, to_process[1], to_process[2],
                        timing_model, rd, heartbeat,
                    )
                pending = (fetch, t0, this_chunk)
                t0 += this_chunk
                self.total_timesteps += this_chunk
        except KeyboardInterrupt as exc:
            # Graceful interruption between device chunks (the reference
            # polls SIGINT every 100 ms while simulating,
            # src/pymodule.cpp:638-652): stop issuing work, drain the chunk
            # already counted so totals and trace files stay consistent,
            # close the traces, then re-raise.
            interrupted = exc
        if pending is not None:
            wait_start = time.perf_counter()
            got = pending[0].get()
            self.fetch_wait_wall += time.perf_counter() - wait_start
            self._process_chunk_outputs(
                got, pending[1], pending[2], timing_model, rd, heartbeat,
            )
        self._drain_trace_writer()
        if interrupted is not None:
            executed = self.total_timesteps - rd.timestep_start + 1
            rd.timesteps_executed = executed
            self.close()
            print(
                f"Simulation interrupted after {executed} of {timesteps} "
                "timesteps; traces flushed.",
                file=sys.stderr,
            )
            raise interrupted

        # accumulate chip totals
        self.total_energy += rd.total_energy
        self.synapse_energy += rd.synapse_energy
        self.dendrite_energy += rd.dendrite_energy
        self.soma_energy += rd.soma_energy
        self.network_energy += rd.network_energy
        self.total_sim_time += rd.sim_time
        self.total_spikes += rd.spikes
        self.total_neurons_updated += rd.neurons_updated
        self.total_neurons_fired += rd.neurons_fired

        result = rd.to_dict()
        # which device engine ran this sim's chunks ("pallas_chunk", "dag",
        # or "scan") — tagged on the program when its chunk runner compiles
        # (make_scan / _make_chunk_runner) and sticky across cached reruns
        result["device_engine"] = getattr(prog, "engine", None)
        result["spike_trace"] = traces["spike"].memory
        result["potential_trace"] = traces["potential"].memory
        result["neuron_trace"] = traces["neuron"].memory
        result["perf_trace"] = traces["perf"].memory
        result["message_trace"] = traces["message"].memory
        return result

    def _make_chunk_runner(self, prog: DeviceProgram, chunk_len: int,
                           perf_on: bool, device_sweep: bool = False):
        """Pick the fastest device path for a chunk: the whole-chunk Pallas
        kernel on TPU for eligible small chips (ops/pallas_chunk.py), else
        the XLA ``lax.scan``. The perf trace needs per-step stats rows,
        which only the scan path produces."""
        if device_sweep:
            return prog.make_scan(chunk_len, wire=True, device_sweep=True)
        if getattr(prog, "mesh", None) is not None:
            # sharded program: the scan path is the GSPMD-partitioned one
            # (the whole-chunk Pallas kernel is a single-core VMEM design)
            return prog.make_scan(chunk_len, wire=True)
        if not perf_on:
            import os

            mode = os.environ.get("SANAFE_PALLAS_CHUNK", "1")
            interpret = mode == "interpret"
            if mode != "0" and (
                interpret or jax.default_backend() == "tpu"
            ):
                from .ops.pallas_chunk import make_pallas_chunk

                for ts_block in (256, 128, 512, 64, 32, chunk_len):
                    if ts_block <= 1024 and chunk_len % ts_block == 0:
                        run = make_pallas_chunk(
                            prog, chunk_len, ts_block=ts_block,
                            interpret=interpret,
                        )
                        if run is not None:
                            prog.engine = "pallas_chunk"
                            return run
                        break  # program ineligible; ts_block won't help
        return prog.make_scan(chunk_len, wire=True)

    def _open_traces(
        self,
        spike_trace,
        potential_trace,
        neuron_trace,
        perf_trace,
        message_trace,
        write_trace_headers: bool,
    ) -> None:
        c = self.compiled
        states = {
            "spike": _TraceState(TraceSink(spike_trace)),
            "potential": _TraceState(TraceSink(potential_trace)),
            "neuron": _TraceState(TraceSink(neuron_trace)),
            "perf": _TraceState(TraceSink(perf_trace)),
            "message": _TraceState(TraceSink(message_trace)),
        }
        if states["spike"].sink.in_memory:
            states["spike"].memory = SpikeTrace()
        if states["potential"].sink.in_memory:
            states["potential"].memory = PotentialTrace()
        if states["neuron"].sink.in_memory:
            states["neuron"].memory = NeuronTrace(
                data={"u": []} if len(c.u_log_labels) else {}
            )
        if states["perf"].sink.in_memory:
            from .trace import PERF_COLUMNS

            states["perf"].memory = PerfTrace(
                data={col: [] for col in PERF_COLUMNS}
            )
        if states["message"].sink.in_memory:
            states["message"].memory = MessageTrace()
        if write_trace_headers:
            if states["spike"].sink.stream:
                write_spike_header(states["spike"].sink)
            if states["potential"].sink.stream:
                write_potential_header(
                    states["potential"].sink, c.potential_log_labels
                )
            if states["neuron"].sink.stream:
                write_neuron_trace_header(
                    states["neuron"].sink, c.u_log_labels, ("u",)
                )
            if states["perf"].sink.stream:
                write_perf_header(states["perf"].sink, c.perf_col_names)
            if states["message"].sink.stream:
                write_message_header(states["message"].sink)
        self._trace_states = states

    def _process_chunk_outputs(
        self,
        outputs: dict[str, np.ndarray],
        t0: int,
        length: int,
        timing_model: str,
        rd: RunData,
        heartbeat: int,
    ) -> None:
        c = self.compiled
        traces = self._trace_states
        prog_sync = c.arch.ts_sync_delay_table.get(c.mapped_tiles)

        masks_device = outputs.get("masks_device")
        fetch_start = time.perf_counter()
        if "wire" in outputs:
            # Consolidated scan outputs: ONE device fetch, then split on
            # the host (ops/step.py decode_wire).
            from .ops.step import decode_wire

            wire = np.asarray(outputs["wire"])
            self.message_processing_wall += time.perf_counter() - fetch_start
            decoded = decode_wire(wire, outputs["wire_layout"])
            for key in DEVICE_RESIDENT + ("sim_device", "sweep_overflow"):
                if key in outputs and key not in decoded:
                    decoded[key] = outputs[key]
            outputs = decoded
            fetch_start = time.perf_counter()
        if "spike_idx" in outputs:
            # sparse spike wire: rebuild the packed plane host-side so the
            # byte-exact downstream writers are unchanged; burst steps
            # (count > K) fetch their full plane from the device
            outputs = dict(outputs)
            outputs["spike_log_packed"] = self._sparse_spikes_to_packed(
                outputs, masks_device
            )
        if "mw_presence" in outputs:
            # Sparse delta mask wire (ops/step.py make_scan): rebuild the
            # exact packed fired/updated planes from the presence bitmap +
            # compacted nonzero byte values, so every downstream consumer
            # (native sweep, spike rows, exact energy) sees byte-identical
            # masks. Deltas are chunk-local (XOR-cumsum seeds at zero).
            fetch_start = time.perf_counter()
            outputs = dict(outputs)
            if bool(np.asarray(outputs["mw_over"])[0]):
                # per-chunk value budget overflowed: fall back to the
                # dense device-resident planes (rare; costs one transfer)
                masks_np = np.asarray(masks_device)
            else:
                pres = np.unpackbits(
                    np.ascontiguousarray(outputs["mw_presence"]), axis=1
                )
                # planes are sized by the PROGRAM's neuron count, which is
                # padded when the chip is sharded (pad bits are zero)
                nb = ((self._prog_n_neurons or c.n_neurons) + 7) // 8
                pres = pres[:, : 2 * nb].astype(bool)
                counts = np.asarray(outputs["mw_counts"])
                vals = np.ascontiguousarray(
                    outputs["mw_values"]
                ).reshape(-1)
                enc = np.zeros(pres.shape, np.uint8)
                enc[pres] = vals[: int(counts.sum())]
                masks_np = np.ascontiguousarray(
                    np.stack(
                        [
                            enc[:, :nb],
                            np.bitwise_xor.accumulate(enc[:, nb:], axis=0),
                        ],
                        axis=1,
                    )
                )
            outputs["masks_packed"] = masks_np
            self.message_processing_wall += (
                time.perf_counter() - fetch_start
            )
        nb_real = (c.n_neurons + 7) // 8
        if self._prog_n_neurons and (
            (self._prog_n_neurons + 7) // 8 != nb_real
        ):
            # Sharded (padded) program: slice the mask planes back to the
            # real neuron count. Pad slots never fire/update, so the
            # boundary byte's pad bits are zero and the sliced bytes equal
            # the single-device planes exactly — every consumer below
            # (native sweep, exact energy, spike rows) stays byte-exact.
            mp = outputs.get("masks_packed")
            if mp is not None:
                outputs = dict(outputs)
                outputs["masks_packed"] = np.ascontiguousarray(
                    np.asarray(mp)[:, :, :nb_real]
                )
            if masks_device is not None:
                masks_device = masks_device[:, :, :nb_real]
        # the device sweep's outputs may ride the wire (one fetch/chunk)
        # or arrive as their own tensors (float64 named-output path)
        sim_device = outputs.get("sim_device")
        sweep_overflow = outputs.get("sweep_overflow")
        if "packed" in outputs:
            # Whole-chunk Pallas path (ops/pallas_chunk.py): ONE fetched
            # buffer carrying on-device counter/energy sums + the packed
            # per-step masks/logs.
            from .ops.pallas_chunk import decode_packed

            buf = np.asarray(outputs["packed"])
            self.message_processing_wall += time.perf_counter() - fetch_start
            energy_start = time.perf_counter()
            dec = decode_packed(buf, outputs["packed_layout"])
            cs = dec["counter_sums"]
            packets_total = int(cs[1])
            rd.spikes += int(cs[0])
            rd.packets_sent += packets_total
            self.total_messages_sent += packets_total
            rd.neurons_updated += int(cs[3])
            rd.neurons_fired += int(cs[4])
            es = dec["energy_sums"]
            rd.synapse_energy += float(es[0])
            rd.dendrite_energy += float(es[1])
            rd.soma_energy += float(es[2])
            rd.network_energy += float(es[3])
            rd.total_energy += float(es.sum())
            self.energy_stats_wall += time.perf_counter() - energy_start
            outputs = dec
            sim_times = np.array([dec["sim_time_sum"]])
        else:
            # One stats tensor per chunk: [T, 11] = (spike_ops, packets,
            # hops, updated, fired, synapse_e, dendrite_e, soma_e,
            # network_e, total_e, sim_time) — consolidated on device to
            # minimize link round-trips
            stats = np.asarray(outputs["stats"], dtype=np.float64)
            self.message_processing_wall += time.perf_counter() - fetch_start
            counters = np.round(stats[:, :5]).astype(np.int64)
            energies = stats[:, 5:11]
            energy_start = time.perf_counter()
            exact = getattr(self, "_exact_energy", None)
            masks_src = outputs.get("masks_packed", masks_device)
            if exact is not None and masks_src is not None:
                # Replay the reference's exact float64 accumulation tree
                # (ops/exact_energy.py) for the perf rows and run totals.
                masks_np = np.asarray(masks_src)
                n = c.n_neurons
                en = exact.chunk(
                    np.unpackbits(masks_np[:, 0, :], axis=1)[:, :n]
                    .astype(bool),
                    np.unpackbits(masks_np[:, 1, :], axis=1)[:, :n]
                    .astype(bool),
                )
                energies = energies.copy()
                energies[:, :5] = en
            packets_total = int(counters[:, 1].sum())
            rd.spikes += int(counters[:, 0].sum())
            rd.packets_sent += packets_total
            self.total_messages_sent += packets_total
            rd.neurons_updated += int(counters[:, 3].sum())
            rd.neurons_fired += int(counters[:, 4].sum())
            if exact is not None and masks_src is not None:
                # RunData accumulates per retired timestep, one float64 add
                # each (src/chip.cpp:410-438)
                for t in range(length):
                    rd.synapse_energy += energies[t, 0]
                    rd.dendrite_energy += energies[t, 1]
                    rd.soma_energy += energies[t, 2]
                    rd.network_energy += energies[t, 3]
                    rd.total_energy += energies[t, 4]
            else:
                rd.synapse_energy += float(energies[:, 0].sum())
                rd.dendrite_energy += float(energies[:, 1].sum())
                rd.soma_energy += float(energies[:, 2].sum())
                rd.network_energy += float(energies[:, 3].sum())
                rd.total_energy += float(energies[:, 4].sum())
            self.energy_stats_wall += time.perf_counter() - energy_start

            # timing model
            sim_times = energies[:, 5]
        messages_by_step: list[Optional[list[list[MessageRecord]]]] = [
            None
        ] * length
        need_messages = traces["message"].sink.enabled
        if sweep_overflow is not None:
            # Detailed timing already ran on device (ops/merge_sweep.py /
            # ops/device_sweep.py). Steps flagged by the sweep (message
            # count over the static capacity, in-flight ring overflow) are
            # re-swept exactly on the host; only the flagged steps' packed
            # masks cross the link.
            fetch_start = time.perf_counter()
            # writable copy: flagged steps are overwritten below
            sim_times = np.array(sim_device, dtype=np.float64)
            flagged = np.nonzero(np.asarray(sweep_overflow))[0]
            self.scheduler_wall += time.perf_counter() - fetch_start
            if len(flagged):
                sched_start = time.perf_counter()
                masks = np.asarray(
                    jax.numpy.take(
                        masks_device,
                        jax.numpy.asarray(flagged),
                        axis=0,
                    )
                )
                native = self._get_native_scheduler()
                if native is not None:
                    sim_times[flagged] = native.run_chunk_packed(
                        masks, prog_sync
                    )
                else:
                    fired_axons, gen_latency = _masks_to_fired_gen(c, masks)
                    for k, i in enumerate(flagged):
                        msgs, self._next_mid = build_timestep_messages(
                            c, fired_axons[k], gen_latency[k], t0 + int(i),
                            getattr(self, "_next_mid", 0),
                        )
                        sim_times[i] = schedule_timestep_detailed(
                            c, msgs, prog_sync
                        )
                self.scheduler_wall += time.perf_counter() - sched_start
        elif timing_model in ("detailed", "cycle") or need_messages:
            fetch_start = time.perf_counter()
            masks = np.asarray(outputs["masks_packed"])  # [T, 2, nbytes]
            self.message_processing_wall += (
                time.perf_counter() - fetch_start
            )
            sched_start = time.perf_counter()
            native = self._get_native_scheduler()
            if timing_model == "cycle" and native is not None:
                # Flit-level cmesh NoC (the reference's Booksim2 tier;
                # ~100x the detailed model's cost)
                sim_times = native.run_chunk_cycle(masks, prog_sync)
                if need_messages:
                    # message records (delays per the detailed sweep) are
                    # still produced for the trace surface
                    fired_axons, gen_latency = _masks_to_fired_gen(c, masks)
                    for i in range(length):
                        msgs, self._next_mid = build_timestep_messages(
                            c,
                            fired_axons[i],
                            gen_latency[i],
                            t0 + i,
                            getattr(self, "_next_mid", 0),
                        )
                        schedule_timestep_simple_messages(msgs)
                        messages_by_step[i] = msgs
            elif (
                timing_model == "detailed"
                and not need_messages
                and native is not None
            ):
                # Fast path: the C++ scheduler consumes the packed masks
                # directly (bit lookups + float64 latency reconstruction),
                # OpenMP-parallel across the chunk's timesteps.
                sim_times = native.run_chunk_packed(masks, prog_sync)
            else:
                # Unpack masks host-side for the message-trace and
                # pure-Python paths
                fired_axons, gen_latency = _masks_to_fired_gen(c, masks)
                if timing_model == "detailed" and native is not None:
                    # When the message trace is stream-only, rows are
                    # written straight from the native field arrays (no
                    # per-message Python objects; byte-identical CSV).
                    msg_state = traces["message"]
                    fast_stream = (
                        msg_state.sink.enabled
                        and msg_state.sink.stream
                        and msg_state.memory is None
                        and os.environ.get("SANAFE_FAST_MSG_TRACE", "1")
                        != "0"
                    )
                    sort_perm = None
                    if fast_stream:
                        try:
                            from .native import sort_message_trace_order

                            sort_perm = sort_message_trace_order
                        except ImportError:
                            pass
                    detailed_times = np.zeros(length)
                    for i in range(length):
                        sim_t, fields = native.run_timestep_trace(
                            fired_axons[i], gen_latency[i], prog_sync
                        )
                        detailed_times[i] = sim_t
                        if fast_stream:
                            self._next_mid = write_message_rows_fast(
                                c, fields, t0 + i,
                                getattr(self, "_next_mid", 0),
                                msg_state.sink, sort_perm,
                            )
                            messages_by_step[i] = None
                        else:
                            msgs, self._next_mid = records_from_native(
                                c, fields, t0 + i,
                                getattr(self, "_next_mid", 0),
                            )
                            messages_by_step[i] = msgs
                    sim_times = detailed_times
                else:
                    # pure-Python fallback (exact same algorithm)
                    detailed_times = np.zeros(length)
                    for i in range(length):
                        msgs, self._next_mid = build_timestep_messages(
                            c,
                            fired_axons[i],
                            gen_latency[i],
                            t0 + i,
                            getattr(self, "_next_mid", 0),
                        )
                        if timing_model == "detailed":
                            detailed_times[i] = schedule_timestep_detailed(
                                c, msgs, prog_sync
                            )
                        else:
                            schedule_timestep_simple_messages(msgs)
                        messages_by_step[i] = msgs
                    if timing_model == "detailed":
                        sim_times = detailed_times
            self.scheduler_wall += time.perf_counter() - sched_start
        # sequential accumulation (not pairwise np.sum): the reference
        # folds one retired timestep at a time into the run total
        # (src/chip.cpp:410-438), and sim() exposes the float64 result
        # through the API; ~0.1 us/step, invisible next to the sweep
        acc = rd.sim_time
        for v in sim_times.tolist():
            acc += v
        rd.sim_time = acc

        # --- trace writing ---
        spike_state = traces["spike"]
        if spike_state.sink.enabled and spike_state.memory is None and (
            spike_state.sink.stream
            and os.environ.get("SANAFE_FAST_SPIKE_TRACE", "1") != "0"
            and self._write_spike_rows_native(outputs, masks_device, t0,
                                              spike_state.sink)
        ):
            pass  # rows formatted in C and written (byte-identical)
        elif spike_state.sink.enabled:
            if "spike_log_packed" in outputs:
                spikes_log = np.unpackbits(
                    np.asarray(outputs["spike_log_packed"]), axis=1
                )[:, : len(c.spike_log_slots)]
            else:
                # derived from the fired masks already streamed for the
                # timing model (ops/step.py skips the separate output)
                masks_np = (
                    np.asarray(outputs["masks_packed"])
                    if "masks_packed" in outputs
                    else np.asarray(masks_device)
                )
                fired_bits = np.unpackbits(masks_np[:, 0, :], axis=1)
                spikes_log = fired_bits[:, c.spike_log_slots]
            steps_idx, rows_idx = np.nonzero(spikes_log)
            if spike_state.sink.stream and len(rows_idx):
                labels = self._spike_label_cache()
                lines = [
                    f"{labels[j]},{t0 + i}\n"
                    for i, j in zip(steps_idx, rows_idx)
                ]
                writer = getattr(self, "_trace_writer", None)
                if writer is not None:
                    writer.submit(spike_state.sink, "".join(lines))
                else:
                    spike_state.sink.write("".join(lines))
            if spike_state.memory is not None:
                addresses = self._spike_address_cache()
                per_step: list[list] = [[] for _ in range(length)]
                for i, j in zip(steps_idx, rows_idx):
                    per_step[i].append(addresses[j])
                spike_state.memory.data.extend(per_step)
        potential_state = traces["potential"]
        if potential_state.sink.enabled:
            pot_log = np.asarray(outputs["potential_log"])
            for i in range(length):
                t = t0 + i
                if potential_state.sink.stream and pot_log.shape[1] > 0:
                    row = ",".join(fmt_g(v) for v in pot_log[i])
                    potential_state.sink.write(f"{t},{row},\n")
                elif potential_state.sink.stream:
                    potential_state.sink.write(f"{t},")
                if potential_state.memory is not None:
                    potential_state.memory.data.append(
                        [float(v) for v in pot_log[i]]
                    )
        neuron_state = traces["neuron"]
        if neuron_state.sink.enabled:
            u_log = np.asarray(outputs["u_log"])
            for i in range(length):
                t = t0 + i
                if neuron_state.sink.stream and u_log.shape[1] > 0:
                    row = ",".join(fmt_g(v) for v in u_log[i])
                    neuron_state.sink.write(f"{t},{row},\n")
                elif neuron_state.sink.stream:
                    neuron_state.sink.write(f"{t},")
                if neuron_state.memory is not None:
                    neuron_state.memory.data.setdefault("u", []).append(
                        [float(v) for v in u_log[i]]
                    )
        perf_state = traces["perf"]
        if perf_state.sink.enabled:
            opt_values = (
                np.asarray(outputs["opt_perf"], dtype=np.float64)
                if "opt_perf" in outputs
                else None
            )
            opt_names = c.perf_col_names
            for i in range(length):
                t = t0 + i
                values = {
                    "timestep": t,
                    "fired": int(counters[i, 4]),
                    "updated": int(counters[i, 3]),
                    "packets": int(counters[i, 1]),
                    "hops": int(counters[i, 2]),
                    "spikes": int(counters[i, 0]),
                    "sim_time": float(sim_times[i]),
                    "synapse_energy": float(energies[i, 0]),
                    "dendrite_energy": float(energies[i, 1]),
                    "soma_energy": float(energies[i, 2]),
                    "network_energy": float(energies[i, 3]),
                    "total_energy": float(energies[i, 4]),
                }
                if opt_values is not None:
                    for k, name in enumerate(opt_names):
                        values[name] = float(opt_values[i, k])
                if perf_state.sink.stream:
                    row = (
                        f"{values['timestep']},{values['fired']},"
                        f"{values['updated']},{values['packets']},"
                        f"{values['hops']},{values['spikes']},"
                        f"{fmt_e(values['sim_time'])},"
                        f"{fmt_e(values['synapse_energy'])},"
                        f"{fmt_e(values['dendrite_energy'])},"
                        f"{fmt_e(values['soma_energy'])},"
                        f"{fmt_e(values['network_energy'])},"
                        f"{fmt_e(values['total_energy'])}"
                    )
                    if opt_values is not None:
                        row += "".join(
                            f",{fmt_e(values[name])}" for name in opt_names
                        )
                    perf_state.sink.write(row + "\n")
                if perf_state.memory is not None:
                    for key, value in values.items():
                        perf_state.memory.data.setdefault(key, []).append(
                            value
                        )
        message_state = traces["message"]
        if message_state.sink.enabled:
            for i in range(length):
                msgs = messages_by_step[i]
                if msgs is None:
                    continue  # already streamed by write_message_rows_fast
                flat = [m for q in msgs for m in q]
                # sort by mid, placeholders last (src/message.cpp:70-91);
                # the reference's std::sort permutes the all-equivalent
                # placeholders unstably, so use the native libstdc++ sort
                # when available for a byte-identical trace
                try:
                    from .native import (
                        NativeUnavailable,
                        sort_message_trace_order,
                    )

                    perm = sort_message_trace_order(
                        [m.mid for m in flat],
                        [m.placeholder for m in flat],
                    )
                    flat = [flat[j] for j in perm]
                except (ImportError, NativeUnavailable):
                    flat.sort(key=lambda m: (m.placeholder, m.mid))
                if message_state.sink.stream:
                    for m in flat:
                        write_message_row(message_state.sink, m)
                if message_state.memory is not None:
                    message_state.memory.data.append(
                        [message_to_dict(m) for m in flat]
                    )

        if heartbeat:
            for t in range(t0, t0 + length):
                if t % heartbeat == 0:
                    print(f"*** Time-step {t} ***")

    def _spike_label_cache(self) -> list[str]:
        labels = getattr(self, "_spike_labels", None)
        if labels is None or len(labels) != len(
            self.compiled.spike_log_labels
        ):
            labels = [
                f"{group}.{offset}"
                for group, offset in self.compiled.spike_log_labels
            ]
            self._spike_labels = labels
        return labels

    def _sparse_spikes_to_packed(
        self, outputs: dict, masks_device
    ) -> np.ndarray:
        """Rebuild per-step packed spike planes from the sparse wire
        (``spike_idx`` [T,K] indices into spike_log_slots order, ``spike_cnt``
        [T]). Steps whose count overflowed K take their plane from the
        device-resident fallback (``spikes_device``, or the sweep tier's
        ``masks_device``)."""
        c = self.compiled
        idx = np.asarray(outputs.pop("spike_idx")).astype(np.int64)
        cnt = np.asarray(outputs.pop("spike_cnt")).astype(np.int64)
        spikes_dev = outputs.pop("spikes_device", None)
        spike_over = outputs.pop("spike_over", None)
        T, K = idx.shape
        S = len(c.spike_log_slots)
        nb = -(-S // 8)
        buf = np.zeros((T, nb), dtype=np.uint8)
        ok = cnt <= K
        sel = (idx < S) & ok[:, None]
        rows, _ = np.nonzero(sel)
        bits = idx[sel]
        np.bitwise_or.at(
            buf.reshape(-1),
            rows * nb + (bits >> 3),
            (128 >> (bits & 7)).astype(np.uint8),
        )
        over = np.nonzero(~ok)[0]
        if len(over) and spike_over is not None:
            # burst planes shipped with the chunk: [M][idx*M][plane*M*nb]
            flat = np.ascontiguousarray(np.asarray(spike_over)).reshape(-1)
            m = int(flat[:4].view(np.int32)[0])
            oidx = flat[4 : 4 + 4 * m].view(np.int32)
            rows = flat[4 + 4 * m : 4 + 4 * m + m * nb].reshape(m, nb)
            pos = np.searchsorted(oidx, over)
            hit = (pos < m) & (oidx[np.minimum(pos, m - 1)] == over)
            buf[over[hit]] = rows[pos[hit]]
            over = over[~hit]
        if len(over):
            if spikes_dev is not None:
                rows = _fetch_rows(spikes_dev, over)
                if rows.shape[1] != nb:
                    # raw per-neuron rows (bool fired_log), not packed
                    rows = np.packbits(rows.astype(bool), axis=1)[:, :nb]
                buf[over] = rows
            elif masks_device is not None:
                m = _fetch_rows(masks_device, over)
                fired_all = np.unpackbits(m[:, 0, :], axis=1)[
                    :, : c.n_neurons
                ].astype(bool)
                buf[over] = np.packbits(
                    fired_all[:, c.spike_log_slots], axis=1
                )
            else:
                raise RuntimeError(
                    "sparse spike overflow without a fallback plane"
                )
        return buf

    def _write_spike_rows_native(
        self, outputs: dict, masks_device, t0: int, sink
    ) -> bool:
        """Stream a chunk's spikes.csv rows via the native formatter
        (native_src/scheduler.cpp format_spike_rows): byte-identical to the
        Python f-string path at ~30 ns/row instead of ~1 us/row. Returns
        False when unavailable so the caller falls back."""
        try:
            from . import native as native_mod
        except ImportError:
            return False
        c = self.compiled
        if "spike_log_packed" in outputs:
            packed = np.ascontiguousarray(
                np.asarray(outputs["spike_log_packed"])
            )
            row_stride = n_bytes = packed.shape[1]
            bit_of_label = np.arange(len(c.spike_log_slots), dtype=np.int32)
        elif "masks_packed" in outputs or masks_device is not None:
            packed = np.ascontiguousarray(
                np.asarray(outputs["masks_packed"])
                if "masks_packed" in outputs
                else np.asarray(masks_device)
            )
            row_stride = packed.shape[1] * packed.shape[2]
            n_bytes = packed.shape[2]
            bit_of_label = np.asarray(c.spike_log_slots, dtype=np.int32)
        else:
            return False
        cache = getattr(self, "_spike_blob", None)
        if cache is None or len(cache[1]) != len(c.spike_log_labels) + 1:
            encoded = [
                label.encode("utf-8") for label in self._spike_label_cache()
            ]
            off = np.zeros(len(encoded) + 1, dtype=np.int64)
            np.cumsum([len(e) for e in encoded], out=off[1:])
            cache = (b"".join(encoded), off,
                     max((len(e) for e in encoded), default=0) + 22)
            self._spike_blob = cache
        blob, label_off, max_row = cache
        try:
            text = native_mod.format_spike_rows(
                packed, row_stride, n_bytes, t0, bit_of_label, blob,
                label_off, max_row, as_bytes=True,
            )
        except native_mod.NativeUnavailable:
            return False
        if text is None:
            return False
        if text:
            # bytes blob; the disk wait rides the writer thread so it
            # overlaps the next chunk's host sweep (one CPU)
            writer = getattr(self, "_trace_writer", None)
            if writer is not None:
                writer.submit(sink, text)
            else:
                sink.write_bytes(text)
        return True

    def _spike_address_cache(self) -> list:
        addresses = getattr(self, "_spike_addresses", None)
        if addresses is None or len(addresses) != len(
            self.compiled.spike_log_labels
        ):
            addresses = [
                NeuronAddress(group, offset)
                for group, offset in self.compiled.spike_log_labels
            ]
            self._spike_addresses = addresses
        return addresses

    def _build_feeds(self, length: int) -> dict:
        """Per-chunk host-generated stochastic inputs: TrueNorth LFSR draws
        (glibc rand replica) and Poisson input spikes (mt19937 replica).
        Streams persist across sim() calls, matching the reference's
        process-lifetime generators (src/models.cpp:745-760,883-888)."""
        c = self.compiled
        feeds: dict = {}
        if c.tn_noise_slots is not None and len(c.tn_noise_slots):
            from .utils.rng import GlibcRand

            rand = getattr(self, "_tn_rand", None)
            if rand is None:
                rand = self._tn_rand = GlibcRand(1)
            masks = np.asarray(c.tn_noise_masks, dtype=np.uint32)
            k = len(masks)
            # draw order matches the scalar loop: per step, per slot
            draws = rand.next_batch(length * k).reshape(length, k)
            feeds["tn_noise"] = (draws & masks[None, :]).astype(np.float64)
        if c.has_poisson:
            from .utils.rng import MT19937

            rngs = getattr(self, "_input_rngs", None)
            if rngs is None:
                rngs = self._input_rngs = {
                    seed: MT19937(seed) for seed, _ in c.input_units
                }
            total = sum(len(members) for _, members in c.input_units)
            spikes = np.zeros((length, total), dtype=bool)
            col = 0
            for seed, members in c.input_units:
                rng = rngs[seed]
                probs = c.input_poisson[members]
                k = len(members)
                draws = rng.uniform_real_batch(length * k).reshape(length, k)
                spikes[:, col : col + k] = probs[None, :] > draws
                col += k
            feeds["poisson"] = spikes
        return feeds

    def _get_exact_energy(self):
        """Cached ExactEnergyModel for the current compiled chip; None when
        the configuration is outside the supported (standard) shapes."""
        cached = getattr(self, "_exact_energy_model", None)
        if cached is not None and cached[0] is self.compiled:
            return cached[1]
        from .ops.exact_energy import ExactEnergyModel, ExactEnergyUnsupported

        try:
            model = ExactEnergyModel(self.compiled)
        except ExactEnergyUnsupported:
            model = None
        self._exact_energy_model = (self.compiled, model)
        return model

    def _get_native_scheduler(self):
        """Build (once) the C++ detailed-timing scheduler for this chip;
        returns None if the native library cannot be built."""
        if getattr(self, "_native_failed", False):
            return None
        native = getattr(self, "_native", None)
        if native is not None and native.compiled is self.compiled:
            return native
        try:
            from .native import NativeScheduler, NativeUnavailable
        except ImportError:
            self._native_failed = True
            return None
        try:
            self._native = NativeScheduler(self.compiled)
        except NativeUnavailable:
            self._native_failed = True
            return None
        return self._native

    # --- lifecycle -----------------------------------------------------------
    def reset(self) -> None:
        """Clear all model state and pipeline buffers (src/chip.cpp:576-600).

        Matches the reference: potentials/input currents zero (not the
        initial 'potential' attribute), accumulated energies/counters kept.
        """
        if self.compiled is None:
            return
        prog = next(iter(self._programs.values()), None)
        if prog is None:
            prog = make_device_program(self.compiled)
            self._programs[
                (False, False, False, False)
            ] = prog
        state = prog.init_state()
        # all model state zeroes (LoihiLifModel::reset etc. zero potentials
        # rather than re-applying the initial 'potential' attribute);
        # zeros_like keeps dtypes (bool buffers must stay bool or the next
        # scan rejects the carry)
        self._device_state = {
            key: jax.numpy.zeros_like(value)
            for key, value in state.items()
        }

    def save_state(self, path: str | Path) -> None:
        """Checkpoint the full simulation state (device pytree + timestep
        counter) — the reference has no state snapshotting; here device
        state is a flat pytree, so checkpoint/resume is natural.

        A ``.npz`` path writes a single host-side file (state is gathered
        to the host first). Any other path is treated as an orbax
        checkpoint DIRECTORY: shards are written per-device without
        gathering, which is the multi-host/sharded-mesh path (each process
        writes only its addressable shards)."""
        if self.compiled is None:
            raise RuntimeError("No network loaded; call load() first")
        state = self._device_state
        if state is None:
            prog = next(iter(self._programs.values()), None)
            if prog is None:
                prog = make_device_program(self.compiled)
            state = prog.init_state()
        path = Path(path)
        if path.suffix == ".npz":
            arrays = {key: np.asarray(value) for key, value in state.items()}
            arrays["__total_timesteps__"] = np.int64(self.total_timesteps)
            np.savez_compressed(path, **arrays)
            return
        try:
            import orbax.checkpoint as ocp
        except ImportError as exc:
            if path.suffix == "":
                # Backward compatibility: a suffix-less path used to mean
                # np.savez_compressed (which auto-appends .npz); keep that
                # working when orbax is absent instead of erroring.
                import warnings

                warnings.warn(
                    "orbax-checkpoint is not installed; writing "
                    f"'{path}.npz' instead of an orbax directory"
                )
                self.save_state(path.with_suffix(".npz"))
                return
            raise ImportError(
                "Directory checkpoints need orbax-checkpoint (pip install "
                "'sanafe-tpu[checkpoint]'); use a .npz path for the "
                "single-file format."
            ) from exc

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path.absolute(),
                dict(state, __total_timesteps__=np.int64(
                    self.total_timesteps
                )),
                force=True,
            )

    def load_state(self, path: str | Path) -> None:
        """Restore a checkpoint written by :meth:`save_state`. Orbax
        checkpoints restore each array with its CURRENT sharding (the one
        the live device state — or a fresh ``init_state`` — carries), so a
        sharded chip resumes sharded without a host gather."""
        if self.compiled is None:
            raise RuntimeError("No network loaded; call load() first")
        path = Path(path)
        if path.suffix == "" and not path.is_dir() and (
            path.with_suffix(".npz").is_file()
        ):
            # counterpart of save_state's suffix-less npz fallback
            path = path.with_suffix(".npz")
        if path.suffix == ".npz":
            with np.load(path) as data:
                state = {
                    key: jax.numpy.asarray(data[key])
                    for key in data.files
                    if key != "__total_timesteps__"
                }
                self.total_timesteps = int(data["__total_timesteps__"])
            self._device_state = state
            return
        try:
            import orbax.checkpoint as ocp
        except ImportError as exc:
            raise ImportError(
                "Directory checkpoints need orbax-checkpoint (pip install "
                "'sanafe-tpu[checkpoint]')."
            ) from exc

        target = self._device_state
        if target is None:
            prog = next(iter(self._programs.values()), None)
            if prog is None:
                prog = make_device_program(self.compiled)
            target = prog.init_state()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "sharding")
            else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            target,
        )
        abstract["__total_timesteps__"] = jax.ShapeDtypeStruct(
            (), np.dtype(np.int64)
        )
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path.absolute(), abstract)
        self.total_timesteps = int(restored.pop("__total_timesteps__"))
        self._device_state = restored

    def get_power(self) -> float:
        """total energy / total simulated time (src/chip.cpp:607-621)."""
        if self.total_sim_time > 0.0:
            return self.total_energy / self.total_sim_time
        return 0.0

    def sim_output_run_summary(
        self, output_dir: str | Path, run_data: dict | RunData
    ) -> None:
        text = self.format_run_summary(run_data)
        print(text, end="")
        path = Path(output_dir) / "run_summary.yaml"
        path.write_text(text)

    def format_run_summary(self, run_data: dict | RunData) -> str:
        """YAML run summary (src/chip.cpp:873-899)."""
        if isinstance(run_data, RunData):
            rd = run_data.to_dict()
        else:
            rd = run_data
        energy = rd["energy"]
        lines = [
            "build_git_version: 'sanafe-tpu'",
            f"timesteps_executed: {rd['timesteps_executed']}",
            f"total_spikes: {rd['spikes']}",
            f"total_messages_sent: {rd['packets_sent']}",
            f"total_neurons_updated: {rd['neurons_updated']}",
            f"total_neurons_fired: {rd['neurons_fired']}",
            f"sim_time: {fmt_e(rd['sim_time'])}",
            "energy:",
            f"  synapse:{fmt_e(energy['synapse'])}",
            f"  dendrite:{fmt_e(energy['dendrite'])}",
            f"  soma:{fmt_e(energy['soma'])}",
            f"  network: {fmt_e(energy['network'])}",
            f"  total: {fmt_e(energy['total'])}",
            "wall_time:",
            f"  neuron_processing: {self.neuron_processing_wall:f}",
            f"  message_processing: {self.message_processing_wall:f}",
            f"  scheduler: {self.scheduler_wall:f}",
            f"  setup: {self.setup_wall:f}",
            f"  energy: {self.energy_stats_wall:f}",
        ]
        return "\n".join(lines) + "\n"

    def _drain_trace_writer(self) -> None:
        writer = getattr(self, "_trace_writer", None)
        self._trace_writer = None
        if writer is not None:
            writer.drain()

    def close(self) -> None:
        self._drain_trace_writer()
        for state in self._trace_states.values():
            state.sink.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
