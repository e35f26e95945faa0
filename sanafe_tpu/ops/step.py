"""Device timestep kernel: the entire per-timestep simulation as jitted JAX.

TPU-native replacement for the reference's hot loop
(``SpikingChip::sim_hw_timestep``, ``src/chip.cpp:1053-1108``): instead of
event-driven per-neuron/per-message processing over OpenMP threads, every
phase is dense vectorized math over the global neuron-slot axis, run under
``lax.scan`` across timesteps:

- neuron phase  = masked multi-model soma update over all slots
  (``process_neurons``, src/chip.cpp:624-654)
- spike scatter = ``segment_sum`` over the precompiled edge CSR
  (``process_messages``, src/chip.cpp:656-708)
- energy/counter roll-up = closed-form sums from per-event constants
  (``sim_calculate_ts_energy``, src/chip.cpp:1171-1261)
- simple timing model = segment reductions per core
  (``schedule_messages_timestep_simple``, src/schedule.cpp:61-102)

The detailed timing model consumes the per-step fired-axon tensor host-side
(see ``ops/timing.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..arch import NeuronResetMode
from ..compile import CompiledChip
from ..models import (
    DENDRITE_MODEL_ACCUMULATOR_DELAY,
    DENDRITE_MODEL_MULTITAP,
    SOMA_MODEL_INPUT,
    SOMA_MODEL_LIF,
    SOMA_MODEL_TRUENORTH,
)

NEURON_STATUS_IDLE = 0
NEURON_STATUS_UPDATED = 1
NEURON_STATUS_FIRED = 2


def _segment_sum(values, segment_ids, num_segments):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


@dataclass
class DeviceProgram:
    """Compiled device arrays + the jitted scan step for one chip."""

    compiled: CompiledChip
    dtype: Any
    arrays: dict[str, jnp.ndarray]
    record_fired_axons: bool
    record_potentials: bool
    record_spikes: bool
    record_u: bool
    sync_delay: float

    def init_state(self) -> dict[str, jnp.ndarray]:
        c = self.compiled
        n = c.n_neurons
        dtype = self.dtype
        state = {
            "potential": jnp.asarray(c.initial_potential, dtype=dtype),
            "input_current": jnp.zeros(n, dtype=dtype),
            "refractory": jnp.zeros(n, dtype=jnp.int32),
            "buffer_current": jnp.zeros(n, dtype=dtype),
            "buffer_valid": jnp.zeros(n, dtype=bool),
        }
        if c.has_delay_dendrite:
            state["delay_ring"] = jnp.zeros(
                (c.max_delay + 1, n), dtype=dtype
            )
        if c.has_multitap:
            state["tap_voltages"] = jnp.zeros((n, c.max_taps), dtype=dtype)
        return state

    def make_scan(self, chunk_len: int):
        """Return a jitted function (state, t0) -> (state', outputs) scanning
        ``chunk_len`` timesteps. Timestep indices are 1-based."""
        step = partial(_timestep, self)

        @jax.jit
        def run_chunk(state, t0):
            ts = t0 + jnp.arange(chunk_len, dtype=jnp.int64)
            return jax.lax.scan(step, state, ts)

        return run_chunk


def make_device_program(
    compiled: CompiledChip,
    dtype=None,
    record_fired_axons: bool = False,
    record_potentials: bool = False,
    record_spikes: bool = False,
    record_u: bool = False,
) -> DeviceProgram:
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    c = compiled

    def farr(x):
        return jnp.asarray(x, dtype=dtype)

    arrays = {
        # per-neuron
        "core_id": jnp.asarray(c.core_id),
        "soma_model": jnp.asarray(c.soma_model),
        "threshold": farr(c.threshold),
        "reverse_threshold": farr(c.reverse_threshold),
        "reset": farr(c.reset),
        "reverse_reset": farr(c.reverse_reset),
        "reset_mode": jnp.asarray(c.reset_mode),
        "reverse_reset_mode": jnp.asarray(c.reverse_reset_mode),
        "leak_decay": farr(c.leak_decay),
        "input_decay": farr(c.input_decay),
        "bias": farr(c.bias),
        "leak": farr(c.leak),
        "leak_towards_zero": jnp.asarray(c.leak_towards_zero),
        "force_update": jnp.asarray(c.force_update),
        "refractory_delay": jnp.asarray(c.refractory_delay),
        "dendrite_in_neuron_phase": jnp.asarray(c.dendrite_in_neuron_phase),
        "soma_energy_access": farr(c.soma_energy_access),
        "soma_energy_update": farr(c.soma_energy_update),
        "soma_energy_spike": farr(c.soma_energy_spike),
        "soma_lat_access": farr(c.soma_lat_access),
        "soma_lat_update": farr(c.soma_lat_update),
        "soma_lat_spike": farr(c.soma_lat_spike),
        "dendrite_energy_update": farr(c.dendrite_energy_update),
        "dendrite_lat_update": farr(c.dendrite_lat_update),
        "input_train_start": jnp.asarray(c.input_train_start),
        "input_train_len": jnp.asarray(c.input_train_len),
        "input_train_stride": jnp.asarray(c.input_train_stride),
        "input_train_rank": jnp.asarray(c.input_train_rank),
        "input_rate_interval": jnp.asarray(c.input_rate_interval),
        "input_trains": jnp.asarray(
            c.input_trains if c.input_trains.size else np.zeros(1, dtype=bool)
        ),
        # per-axon
        "axon_src_slot": jnp.asarray(c.axon_src_slot),
        "axon_src_core": jnp.asarray(c.axon_src_core),
        "axon_dest_core": jnp.asarray(c.axon_dest_core),
        "axon_fanout": jnp.asarray(c.axon_fanout),
        "axon_hops": jnp.asarray(c.axon_hops),
        "axon_min_hop_delay": farr(c.axon_min_hop_delay),
        "axon_hop_energy": farr(c.axon_hop_energy),
        "axon_energy_in": farr(c.axon_energy_in),
        "axon_energy_out": farr(c.axon_energy_out),
        "axon_latency_out": farr(c.axon_latency_out),
        "axon_const_processing_latency": farr(c.axon_const_processing_latency),
        # per-edge
        "edge_src_slot": jnp.asarray(c.edge_src_slot),
        "edge_dest_slot": jnp.asarray(c.edge_dest_slot),
        "edge_axon": jnp.asarray(c.edge_axon),
        "edge_weight": farr(c.edge_weight),
        "edge_synapse_energy": farr(c.edge_synapse_energy),
        "edge_dendrite_energy": farr(c.edge_dendrite_energy),
        "edge_delay": jnp.asarray(c.edge_delay),
        "edge_tap": jnp.asarray(c.edge_tap),
        "edge_dest_dendrite_model": jnp.asarray(
            c.dendrite_model[c.edge_dest_slot]
            if c.n_edges
            else np.zeros(0, dtype=np.int32)
        ),
        # traces
        "spike_log_slots": jnp.asarray(c.spike_log_slots),
        "potential_log_slots": jnp.asarray(c.potential_log_slots),
        "u_log_slots": jnp.asarray(c.u_log_slots),
    }
    sync_delay = c.arch.ts_sync_delay_table.get(c.mapped_tiles)
    return DeviceProgram(
        compiled=c,
        dtype=dtype,
        arrays=arrays,
        record_fired_axons=record_fired_axons,
        record_potentials=record_potentials,
        record_spikes=record_spikes,
        record_u=record_u,
        sync_delay=sync_delay,
    )


def _lif_update(prog: DeviceProgram, a, state, valid, current, t):
    """LoihiLifModel::update vectorized (src/models.cpp:497-567)."""
    dtype = prog.dtype
    v = state["potential"]
    u = state["input_current"]
    refractory = state["refractory"]
    zero = jnp.zeros((), dtype=dtype)

    updated = (
        (jnp.abs(v) > 0.0)
        | valid
        | (jnp.abs(a["bias"]) > 0.0)
        | a["force_update"]
    )
    # No leak on the very first timestep (src/models.cpp:527-532)
    apply_leak = t > 1
    u = jnp.where(apply_leak, u * a["input_decay"], u)
    v = jnp.where(apply_leak, v * a["leak_decay"], v)
    # 64ths fixed-point quantization, truncating toward zero
    # (src/models.cpp:447-455)
    v = jnp.trunc(v * 64.0) / 64.0

    in_refractory = refractory > 0
    active = ~in_refractory
    u_new = u + jnp.where(valid, current, zero)
    v_new = v + a["bias"] + u_new
    u = jnp.where(active, u_new, u)
    v_active = v_new

    fired = active & (v_active > a["threshold"])
    v_active = jnp.where(
        fired & (a["reset_mode"] == int(NeuronResetMode.HARD)),
        a["reset"],
        v_active,
    )
    v_active = jnp.where(
        fired & (a["reset_mode"] == int(NeuronResetMode.SOFT)),
        v_active - a["threshold"],
        v_active,
    )
    reverse = v_active < a["reverse_threshold"]
    rrm = a["reverse_reset_mode"]
    v_active = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SOFT)),
        v_active - a["reverse_threshold"],
        v_active,
    )
    v_active = jnp.where(
        reverse & (rrm == int(NeuronResetMode.HARD)),
        a["reverse_reset"],
        v_active,
    )
    v_active = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SATURATE)),
        a["reverse_threshold"],
        v_active,
    )
    v = jnp.where(active, v_active, v)

    refractory = jnp.where(fired, a["refractory_delay"], refractory)
    refractory = jnp.maximum(0, refractory - 1)
    return v, u, refractory, updated, fired


def _truenorth_update(prog: DeviceProgram, a, state, valid, current):
    """TrueNorthModel::update vectorized (src/models.cpp:799-830).

    LFSR threshold noise (random_mask) is not yet modeled on device; nets
    using it should run with random_mask=0 for now.
    """
    dtype = prog.dtype
    v = state["potential"]
    zero = jnp.zeros((), dtype=dtype)
    updated = (
        (jnp.abs(v) > 0.0)
        | valid
        | (jnp.abs(a["bias"]) > 0.0)
        | a["force_update"]
    )
    # Additive leak (src/models.cpp:724-743)
    leak_tz = jnp.where(
        v > 0.0, v - a["leak"], jnp.where(v < 0.0, v + a["leak"], v)
    )
    v = jnp.where(a["leak_towards_zero"], leak_tz, v + a["leak"])
    v = v + a["bias"] + jnp.where(valid, current, zero)

    fired = v >= a["threshold"]
    rm = a["reset_mode"]
    v_after = jnp.where(fired & (rm == int(NeuronResetMode.HARD)), a["reset"], v)
    v_after = jnp.where(
        fired & (rm == int(NeuronResetMode.SOFT)), v - a["threshold"], v_after
    )
    v_after = jnp.where(
        fired & (rm == int(NeuronResetMode.SATURATE)), a["threshold"], v_after
    )
    reverse = (~fired) & (v <= a["reverse_threshold"])
    rrm = a["reverse_reset_mode"]
    v_after = jnp.where(
        reverse & (rrm == int(NeuronResetMode.HARD)), a["reverse_reset"], v_after
    )
    v_after = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SOFT)),
        v + a["reverse_threshold"],
        v_after,
    )
    v_after = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SATURATE)),
        a["reverse_threshold"],
        v_after,
    )
    return v_after, updated, fired


def _input_update(prog: DeviceProgram, a, t):
    """InputModel::update vectorized (src/models.cpp:863-903).

    Spike trains replicate the shared-iterator semantics: index advances by
    the number of neurons sharing the unit each timestep. Poisson inputs are
    precomputed host-side (see chip.py) and folded into the train arrays.
    """
    idx = (t - 1) * a["input_train_stride"].astype(jnp.int64) + a[
        "input_train_rank"
    ]
    in_range = idx < a["input_train_len"]
    gather_idx = jnp.clip(a["input_train_start"] + idx, 0, None)
    gather_idx = jnp.minimum(
        gather_idx, a["input_trains"].shape[0] - 1
    ).astype(jnp.int32)
    spike = in_range & a["input_trains"][gather_idx]
    interval = a["input_rate_interval"]
    rate_spike = (interval > 0) & ((t % jnp.maximum(interval, 1)) == 0)
    return spike | rate_spike


def _timestep(prog: DeviceProgram, state, t):
    """One full hardware timestep (neuron phase → axon/message phase →
    energy/counter/timing roll-up)."""
    a = prog.arrays
    c = prog.compiled
    dtype = prog.dtype
    n = c.n_neurons
    zero = jnp.zeros((), dtype=dtype)

    valid = state["buffer_valid"]
    current = state["buffer_current"]

    is_lif = a["soma_model"] == SOMA_MODEL_LIF
    is_tn = a["soma_model"] == SOMA_MODEL_TRUENORTH
    is_input = a["soma_model"] == SOMA_MODEL_INPUT

    v_lif, u_lif, refractory, upd_lif, fired_lif = _lif_update(
        prog, a, state, valid, current, t
    )
    v_tn, upd_tn, fired_tn = _truenorth_update(prog, a, state, valid, current)
    fired_input = _input_update(prog, a, t)

    potential = jnp.where(is_lif, v_lif, jnp.where(is_tn, v_tn, state["potential"]))
    input_current = jnp.where(is_lif, u_lif, state["input_current"])
    refractory = jnp.where(is_lif, refractory, state["refractory"])

    fired = (
        (is_lif & fired_lif) | (is_tn & fired_tn) | (is_input & fired_input)
    )
    updated = (is_lif & upd_lif) | (is_tn & upd_tn)
    updated_or_fired = updated | fired

    # --- axon phase: messages (src/chip.cpp:802-834) ---
    fired_axon = fired[a["axon_src_slot"]]
    fired_axon_f = fired_axon.astype(dtype)
    packets = jnp.sum(fired_axon, dtype=jnp.int64)
    total_hops = jnp.sum(
        jnp.where(fired_axon, a["axon_hops"], 0), dtype=jnp.int64
    )

    # --- message phase: spike scatter over the edge CSR ---
    active_edge = fired_axon[a["edge_axon"]]
    active_edge_f = active_edge.astype(dtype)
    contribution = a["edge_weight"] * active_edge_f
    any_input = (
        _segment_sum(active_edge.astype(jnp.int32), a["edge_dest_slot"], n) > 0
        if c.n_edges
        else jnp.zeros(n, dtype=bool)
    )

    is_delay_edge = (
        a["edge_dest_dendrite_model"] == DENDRITE_MODEL_ACCUMULATOR_DELAY
    )
    is_tap_edge = a["edge_dest_dendrite_model"] == DENDRITE_MODEL_MULTITAP
    immediate = contribution * (~(is_delay_edge | is_tap_edge)).astype(dtype)
    buffer_current = (
        _segment_sum(immediate, a["edge_dest_slot"], n)
        if c.n_edges
        else jnp.zeros(n, dtype=dtype)
    )

    if c.has_delay_dendrite:
        # AccumulatorWithDelayModel (src/models.cpp:96-131): shift the ring,
        # deliver slot 0, scatter arrivals into their delay slots. The
        # delivered value only reaches the soma when a message arrives (the
        # timestep buffer is written per synaptic access).
        ring = state["delay_ring"]
        delivered = ring[0]
        ring = jnp.concatenate(
            [ring[1:], jnp.zeros((1, n), dtype=dtype)], axis=0
        )
        delay_contrib = contribution * is_delay_edge.astype(dtype)
        flat_idx = (
            a["edge_delay"].astype(jnp.int32) * n + a["edge_dest_slot"]
        )
        ring = ring + _segment_sum(
            delay_contrib, flat_idx, (c.max_delay + 1) * n
        ).reshape(c.max_delay + 1, n)
        is_delay_dest = (
            jnp.asarray(c.dendrite_model) == DENDRITE_MODEL_ACCUMULATOR_DELAY
        )
        buffer_current = jnp.where(
            is_delay_dest & any_input, delivered, buffer_current
        )
        state_delay_ring = ring
    else:
        state_delay_ring = None

    if c.has_multitap:
        # MultiTapModel1D (src/models.cpp:167-259): RC-cable update then
        # input scatter into taps; proximal tap 0 is the output.
        taps = state["tap_voltages"]  # [N, T]
        tc = jnp.asarray(c.tap_time_constants, dtype=dtype)
        sc = jnp.asarray(c.tap_space_constants, dtype=dtype)
        next_v = taps * tc
        if c.max_taps > 1:
            # flows between neighboring taps
            proximal = taps[:, 1:] * sc  # current from tap k+1 to tap k
            distal = taps[:, :-1] * sc  # current from tap k to tap k+1
            next_v = next_v.at[:, :-1].add(proximal)
            next_v = next_v.at[:, 1:].add(-proximal)
            next_v = next_v.at[:, 1:].add(distal)
            next_v = next_v.at[:, :-1].add(-distal)
        tap_contrib = contribution * is_tap_edge.astype(dtype)
        t_max = c.max_taps
        flat_tap_idx = a["edge_dest_slot"] * t_max + jnp.minimum(
            a["edge_tap"], t_max - 1
        )
        next_v = next_v + _segment_sum(
            tap_contrib, flat_tap_idx, n * t_max
        ).reshape(n, t_max)
        is_tap_dest = jnp.asarray(c.dendrite_model) == DENDRITE_MODEL_MULTITAP
        buffer_current = jnp.where(
            is_tap_dest & any_input, next_v[:, 0], buffer_current
        )
        state_tap_voltages = next_v
    else:
        state_tap_voltages = None

    # --- counters & energy roll-up (src/chip.cpp:1028-1051,1171-1261) ---
    spike_ops = jnp.sum(active_edge, dtype=jnp.int64)
    neurons_updated = jnp.sum(updated_or_fired, dtype=jnp.int64)
    neurons_fired = jnp.sum(fired, dtype=jnp.int64)

    synapse_energy = jnp.sum(a["edge_synapse_energy"] * active_edge_f)
    dendrite_energy = jnp.sum(
        a["edge_dendrite_energy"] * active_edge_f
    ) + jnp.sum(
        jnp.where(a["dendrite_in_neuron_phase"], a["dendrite_energy_update"], zero)
    )
    soma_energy = (
        jnp.sum(a["soma_energy_access"])
        + jnp.sum(jnp.where(updated_or_fired, a["soma_energy_update"], zero))
        + jnp.sum(jnp.where(fired, a["soma_energy_spike"], zero))
    )
    network_energy = jnp.sum(
        fired_axon_f
        * (a["axon_hop_energy"] + a["axon_energy_in"] + a["axon_energy_out"])
    )
    total_energy = synapse_energy + dendrite_energy + soma_energy + network_energy

    # --- simple timing model (src/schedule.cpp:61-102) ---
    neuron_lat = (
        a["soma_lat_access"]
        + jnp.where(updated_or_fired, a["soma_lat_update"], zero)
        + jnp.where(fired, a["soma_lat_spike"], zero)
        + jnp.where(a["dendrite_in_neuron_phase"], a["dendrite_lat_update"], zero)
    )
    n_cores = c.n_cores
    neuron_lat_core = _segment_sum(neuron_lat, a["core_id"], n_cores)
    neuron_lat_core = neuron_lat_core + _segment_sum(
        fired_axon_f * a["axon_latency_out"], a["axon_src_core"], n_cores
    )
    msg_lat_core = _segment_sum(
        fired_axon_f * a["axon_const_processing_latency"],
        a["axon_dest_core"],
        n_cores,
    )
    sim_time = jnp.maximum(
        jnp.max(neuron_lat_core), jnp.max(msg_lat_core)
    ) + jnp.asarray(prog.sync_delay, dtype=dtype)

    new_state = {
        "potential": potential,
        "input_current": input_current,
        "refractory": refractory,
        "buffer_current": buffer_current,
        "buffer_valid": any_input,
    }
    if state_delay_ring is not None:
        new_state["delay_ring"] = state_delay_ring
    if state_tap_voltages is not None:
        new_state["tap_voltages"] = state_tap_voltages

    outputs = {
        "spikes": spike_ops,
        "packets": packets,
        "hops": total_hops,
        "neurons_updated": neurons_updated,
        "neurons_fired": neurons_fired,
        "synapse_energy": synapse_energy,
        "dendrite_energy": dendrite_energy,
        "soma_energy": soma_energy,
        "network_energy": network_energy,
        "total_energy": total_energy,
        "sim_time": sim_time,
        "neuron_lat_core": neuron_lat_core,
        "msg_lat_core": msg_lat_core,
    }
    if prog.record_spikes:
        outputs["spike_log"] = fired[a["spike_log_slots"]]
    if prog.record_potentials:
        outputs["potential_log"] = potential[a["potential_log_slots"]]
    if prog.record_u:
        outputs["u_log"] = input_current[a["u_log_slots"]]
    if prog.record_fired_axons:
        outputs["fired_axons"] = fired_axon
        # 0=idle, 1=updated, 2=fired; the host recomputes per-neuron
        # generation latencies in float64 from this for the scheduler.
        outputs["neuron_status"] = (
            updated_or_fired.astype(jnp.uint8) + fired.astype(jnp.uint8)
        )

    return new_state, outputs
