"""Compiler: (Architecture, mapped SpikingNetwork) → dense device arrays.

This is the TPU-native replacement for the reference's ``SpikingChip``
construction + ``load()`` path (``src/chip.cpp:61-104,129-408``,
``src/core.cpp:116-184``): instead of per-object pipelines, everything is
lowered once into a structure-of-arrays ``CompiledChip`` that the jitted
timestep kernel (``ops/step.py``) consumes.

Ordering parity (affects trace ordering and timing):

- Neurons map in global ``mapping_order`` (src/chip.cpp:186-234); each core's
  slot offsets follow arrival order, neuron ids are global mapping ordinals.
- Connections map iterating groups in sorted-name order, then neurons by
  offset, then edges in creation order (src/chip.cpp:334-380).
- Axons allocate per (pre-neuron, dest-core) pair, walking cores in id order
  and neurons in within-core order (src/chip.cpp:382-408,1263-1391); edges of
  an axon keep the pre-neuron's ``edges_out`` order. The reference iterates a
  ``std::set<Core*>`` for a neuron's destination cores; we use ascending core
  id, the deterministic equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from .arch import Architecture, BufferPosition, NeuronResetMode, parse_reset_mode
from .attributes import Attribute
from .models import (
    ModelSpec,
    SOMA_MODEL_INPUT,
    SOMA_MODEL_LIF,
    SOMA_MODEL_PLUGIN_BASE,
    SOMA_MODEL_TRUENORTH,
    DENDRITE_MODEL_ACCUMULATOR,
    DENDRITE_MODEL_ACCUMULATOR_DELAY,
    DENDRITE_MODEL_MULTITAP,
    DENDRITE_MODEL_PLUGIN_COMP,
    ACCUMULATOR_MAX_DELAY,
    get_model,
)
from .network import SpikingNetwork


class HardwareMappingError(RuntimeError):
    """Raised when an SNN cannot be mapped to the architecture
    (src/mapped.hpp:30-38)."""


@dataclass(slots=True)
class HardwareUnit:
    """One instantiated pipeline unit inside a core (host-side metadata)."""

    name: str
    core_id: int
    spec: ModelSpec
    unit_id: int  # global index across the chip
    implements_synapse: bool
    implements_dendrite: bool
    implements_soma: bool
    log_energy: bool = False
    log_latency: bool = False
    update_every_timestep: bool = False
    plugin_path: Optional[str] = None
    model_attributes: dict[str, Attribute] = field(default_factory=dict)
    # Default costs (src/pipeline.cpp:151-266)
    energy_process_spike: float = 0.0
    latency_process_spike: float = 0.0
    energy_update: float = 0.0
    latency_update: float = 0.0
    energy_access_neuron: float = 0.0
    energy_update_neuron: float = 0.0
    energy_spike_out: float = 0.0
    latency_access_neuron: float = 0.0
    latency_update_neuron: float = 0.0
    latency_spike_out: float = 0.0
    # Counters filled during mapping
    neuron_count: int = 0
    connection_count: int = 0
    is_used: bool = False
    # Input-model RNG instance ordering (src/models.hpp:347 instance_counter)
    input_instance: int = 0
    # Soma-level hw attributes
    noise_file: Optional[str] = None
    noise_bits: int = 7


@dataclass
class CoreInfo:
    core_id: int
    tile_id: int
    offset_within_tile: int
    name: str
    buffer_position: BufferPosition
    max_neurons: int
    log_energy: bool
    units: list[HardwareUnit] = field(default_factory=list)
    # axon in/out metrics (first unit used for routing costs,
    # src/message.cpp:39-59, src/core.cpp:147)
    axon_in_names: list[str] = field(default_factory=list)
    energy_message_in: float = 0.0
    latency_message_in: float = 0.0
    axon_out_names: list[str] = field(default_factory=list)
    energy_message_out: float = 0.0
    latency_message_out: float = 0.0
    neuron_slots: list[int] = field(default_factory=list)  # global slot ids

    def find_unit(
        self,
        hw_name: str,
        is_synapse: bool = False,
        is_dendrite: bool = False,
        is_soma: bool = False,
    ) -> HardwareUnit:
        """Hardware lookup by name + capability with first-available default
        (src/core.cpp:61-114)."""
        choose_first = hw_name == ""
        for unit in self.units:
            if is_synapse and not unit.implements_synapse:
                continue
            if is_dendrite and not unit.implements_dendrite:
                continue
            if is_soma and not unit.implements_soma:
                continue
            if choose_first or hw_name == unit.name:
                return unit
        raise HardwareMappingError(
            f"Could not find h/w (with name:{hw_name}) that implements "
            f"synapse:{int(is_synapse)}, dendrite:{int(is_dendrite)}, "
            f"soma:{int(is_soma)}"
        )


@dataclass
class NeuronRef:
    """Host-side record of one mapped neuron."""

    slot: int
    group_name: str
    offset: int
    global_id: int  # mapping ordinal (MappedNeuron::id)
    core: CoreInfo
    offset_in_core: int
    soma_unit: HardwareUnit
    dendrite_unit: HardwareUnit
    log_spikes: bool
    log_potential: bool
    mapping_order: int


def _attr_float(attrs: dict[str, Attribute], *names: str, default: float = 0.0) -> float:
    for name in names:
        if name in attrs:
            return attrs[name].as_float()
    return default


def _extract_unit_defaults(unit: HardwareUnit) -> None:
    """Pull default energy/latency costs out of the unit's model attributes
    (src/pipeline.cpp:176-266)."""
    attrs = unit.model_attributes
    unit.energy_process_spike = _attr_float(attrs, "energy_process_spike")
    unit.latency_process_spike = _attr_float(attrs, "latency_process_spike")
    unit.energy_update = _attr_float(attrs, "energy_update")
    unit.latency_update = _attr_float(attrs, "latency_update")

    soma_energy_keys = (
        "energy_access_neuron",
        "energy_update_neuron",
        "energy_spike_out",
    )
    present = [k for k in soma_energy_keys if k in attrs]
    if present and len(present) != len(soma_energy_keys):
        missing = [k for k in soma_energy_keys if k not in attrs]
        raise ValueError(f"Metric not defined: {missing[0]}")
    unit.energy_access_neuron = _attr_float(attrs, "energy_access_neuron")
    unit.energy_update_neuron = _attr_float(attrs, "energy_update_neuron")
    unit.energy_spike_out = _attr_float(attrs, "energy_spike_out")

    soma_latency_keys = (
        "latency_access_neuron",
        "latency_update_neuron",
        "latency_spike_out",
    )
    present = [k for k in soma_latency_keys if k in attrs]
    if present and len(present) != len(soma_latency_keys):
        missing = [k for k in soma_latency_keys if k not in attrs]
        raise ValueError(f"Missing metric: {missing[0]}")
    unit.latency_access_neuron = _attr_float(attrs, "latency_access_neuron")
    unit.latency_update_neuron = _attr_float(attrs, "latency_update_neuron")
    unit.latency_spike_out = _attr_float(attrs, "latency_spike_out")

    if unit.implements_soma:
        if "noise" in attrs:
            unit.noise_file = attrs["noise"].as_str()
        if "noise_bits" in attrs:
            unit.noise_bits = attrs["noise_bits"].as_int()


@dataclass
class ConvSpec:
    """A conv2d hyperedge preserved in structured form.

    The reference expands conv2d descriptions into individual edges
    (src/network.cpp:377-528); the flat edge arrays keep that expansion for
    axon allocation, counters, and the timing model, but the device kernel
    can deliver spikes as an actual strided convolution — the source
    group's neuron indexing (ci*W*H + y*W + x) is literally an NCHW plane
    and the filter layout (yf, xf, ci, co) is literally HWIO, so delivery
    maps onto one ``lax.conv_general_dilated`` over a tiny kernel instead
    of a block-sparse matmul over megabytes of materialized weights."""

    src_group: str
    dest_group: str
    in_w: int
    in_h: int
    in_c: int
    k_w: int
    k_h: int
    out_c: int
    s_w: int
    s_h: int
    kernel: np.ndarray  # [k_h, k_w, in_c, out_c] float64 (HWIO)


@dataclass
class CompiledChip:
    """Dense, device-ready lowering of one mapped chip."""

    arch: Architecture
    # counts
    n_neurons: int = 0
    n_cores: int = 0
    n_axons: int = 0
    n_edges: int = 0
    mapped_tiles: int = 0
    mapped_cores: int = 0
    # host metadata
    cores: list[CoreInfo] = field(default_factory=list)
    neurons: list[NeuronRef] = field(default_factory=list)
    units: list[HardwareUnit] = field(default_factory=list)
    groups: dict[str, np.ndarray] = field(default_factory=dict)  # name -> slots

    # --- per-neuron arrays (global slot axis, core-major order) ---
    core_id: np.ndarray = None
    offset_in_core: np.ndarray = None
    soma_model: np.ndarray = None
    soma_unit_id: np.ndarray = None
    dendrite_model: np.ndarray = None
    dendrite_unit_id: np.ndarray = None
    # Per-neuron pipeline-phase membership (from core buffer position)
    dendrite_in_neuron_phase: np.ndarray = None
    dendrite_in_message_phase: np.ndarray = None
    soma_in_message_phase: np.ndarray = None
    # soma params (union of model params)
    threshold: np.ndarray = None
    reverse_threshold: np.ndarray = None
    reset: np.ndarray = None
    reverse_reset: np.ndarray = None
    reset_mode: np.ndarray = None
    reverse_reset_mode: np.ndarray = None
    leak_decay: np.ndarray = None
    input_decay: np.ndarray = None
    bias: np.ndarray = None
    leak: np.ndarray = None  # TrueNorth additive leak
    leak_towards_zero: np.ndarray = None
    random_range_mask: np.ndarray = None
    force_update: np.ndarray = None
    refractory_delay: np.ndarray = None
    initial_potential: np.ndarray = None
    log_spikes: np.ndarray = None
    log_potential: np.ndarray = None
    log_u: np.ndarray = None
    # per-neuron soma costs (gathered from units)
    soma_energy_access: np.ndarray = None
    soma_energy_update: np.ndarray = None
    soma_energy_spike: np.ndarray = None
    soma_lat_access: np.ndarray = None
    soma_lat_update: np.ndarray = None
    soma_lat_spike: np.ndarray = None
    # dendrite per-neuron costs (applied when dendrite in neuron phase)
    dendrite_energy_update: np.ndarray = None
    dendrite_lat_update: np.ndarray = None
    # input-model columns
    input_train_start: np.ndarray = None
    input_train_len: np.ndarray = None
    input_train_stride: np.ndarray = None
    input_train_rank: np.ndarray = None
    input_poisson: np.ndarray = None
    input_rate_interval: np.ndarray = None  # int(1/rate), 0 = disabled
    input_trains: np.ndarray = None  # flat concatenated spike trains
    input_unit_instance: np.ndarray = None

    # --- per-axon arrays ---
    axon_src_slot: np.ndarray = None
    axon_src_core: np.ndarray = None
    axon_dest_core: np.ndarray = None
    axon_dest_tile: np.ndarray = None
    axon_fanout: np.ndarray = None
    axon_hops: np.ndarray = None
    axon_x_hops: np.ndarray = None
    axon_y_hops: np.ndarray = None
    axon_east: np.ndarray = None  # direction flags for per-tile counters
    axon_north: np.ndarray = None
    axon_min_hop_delay: np.ndarray = None
    axon_hop_energy: np.ndarray = None
    axon_energy_in: np.ndarray = None
    axon_latency_in: np.ndarray = None
    axon_energy_out: np.ndarray = None
    axon_latency_out: np.ndarray = None
    axon_const_processing_latency: np.ndarray = None
    axon_src_x: np.ndarray = None
    axon_src_y: np.ndarray = None
    axon_dest_x: np.ndarray = None
    axon_dest_y: np.ndarray = None
    axon_src_core_offset: np.ndarray = None
    axon_dest_core_offset: np.ndarray = None
    axon_ordinal_in_neuron: np.ndarray = None

    # --- per-edge arrays (axon-major order) ---
    edge_src_slot: np.ndarray = None
    edge_dest_slot: np.ndarray = None
    edge_axon: np.ndarray = None
    edge_weight: np.ndarray = None
    edge_synapse_unit_id: np.ndarray = None
    edge_synapse_energy: np.ndarray = None
    edge_synapse_latency: np.ndarray = None
    edge_delay: np.ndarray = None
    edge_tap: np.ndarray = None
    # cost of the message-phase dendrite/soma work per edge
    edge_dendrite_energy: np.ndarray = None
    edge_dendrite_latency: np.ndarray = None
    # structured (conv2d) hyperedges + per-edge membership flag; the device
    # kernel delivers flagged edges as convolutions (ops/step.py)
    conv_specs: list = field(default_factory=list)
    edge_from_conv: np.ndarray = None

    # trace orderings (sorted by group name then offset,
    # matching sim_trace_record_* iteration; src/chip.cpp:1610-1702)
    spike_log_slots: np.ndarray = None
    spike_log_labels: list[tuple[str, int]] = field(default_factory=list)
    potential_log_slots: np.ndarray = None
    potential_log_labels: list[tuple[str, int]] = field(default_factory=list)
    u_log_slots: np.ndarray = None
    u_log_labels: list[tuple[str, int]] = field(default_factory=list)

    # --- per-neuron aggregates over outgoing axons/edges (exact because all
    # of a neuron's axons fire together; lets the device kernel avoid any
    # per-axon/per-edge reductions in the hot path) ---
    neuron_n_axons: np.ndarray = None
    neuron_axon_hops: np.ndarray = None
    neuron_axon_energy: np.ndarray = None  # hop + axon_in + axon_out energy
    neuron_axon_latency_out: np.ndarray = None
    neuron_spike_ops: np.ndarray = None  # sum of axon fanouts
    neuron_synapse_energy: np.ndarray = None
    neuron_msg_dendrite_energy: np.ndarray = None
    # [N, n_cores] f32: per-message processing latency summed by dest core
    # (None when N*C is too large; kernel falls back to a segment reduction)
    neuron_proc_lat_core: np.ndarray = None

    # --- stochastic model support (see utils/rng.py) ---
    # Loihi LIF file-stream noise: per-neuron indexing into a flat masked
    # value array (consumed per unit in slot order each step)
    lif_noise_start: np.ndarray = None
    lif_noise_len: np.ndarray = None
    lif_noise_stride: np.ndarray = None
    lif_noise_rank: np.ndarray = None
    lif_noise_values: np.ndarray = None
    # TrueNorth LFSR threshold noise: slots consuming one glibc rand() draw
    # per timestep, in consumption (slot) order, + their masks
    tn_noise_slots: np.ndarray = None
    tn_noise_masks: np.ndarray = None
    # Poisson inputs: (mt19937 seed, member slots) per input unit; every
    # input neuron consumes one uniform draw per step from its unit's gen
    input_units: list = field(default_factory=list)
    has_poisson: bool = False

    # --- optional perf.csv columns (log_energy/log_latency flags;
    # sim_trace_get_optional_traces, src/chip.cpp:1520-1555): column k's
    # per-timestep value = fired @ F[:,k] + updated @ U[:,k] + const[k]
    perf_col_names: list = field(default_factory=list)
    perf_col_fired: np.ndarray = None  # [N, K] f64
    perf_col_updated: np.ndarray = None  # [N, K] f64
    perf_col_const: np.ndarray = None  # [K] f64

    # --- Python plugin soma models (models/__init__.py register_soma_model):
    # specs used by this chip + their per-neuron parameter arrays
    plugin_specs: list = field(default_factory=list)
    plugin_params: dict = field(default_factory=dict)  # name -> {param: [N]}
    has_plugin_comp: bool = False
    max_plugin_comp: int = 0
    # Shared-unit-state plugins (ModelSpec.shared_unit_state): rank of each
    # neuron within its unit's update order and the unit's member count;
    # the per-neuron emulation advances rank steps at init and stride steps
    # per timestep (see ops/step.py)
    plugin_shared_rank: np.ndarray = None  # [N] int32
    plugin_shared_stride: np.ndarray = None  # [N] int32
    plugin_shared_max_stride: int = 1

    max_delay: int = ACCUMULATOR_MAX_DELAY
    has_delay_dendrite: bool = False
    has_multitap: bool = False
    max_taps: int = 1
    # multitap per-neuron parameter matrices [N, max_taps]
    tap_time_constants: np.ndarray = None
    tap_space_constants: np.ndarray = None
    n_taps: np.ndarray = None


def build_hardware(
    arch: Architecture, used_core_ids: Optional[set] = None
) -> list[CoreInfo]:
    """Instantiate per-core hardware units (src/chip.cpp:61-104).

    With ``used_core_ids`` given, unit OBJECTS are only built for cores that
    map neurons or carry perf-logging flags; other cores advance the global
    unit/input-instance counters without materializing units (loihi_large
    describes 4.2M units across 4096 cores, of which a mapped net typically
    touches a handful). Counter advancement keeps unit ids and input-model
    RNG instance numbers identical to the full build."""
    cores: list[CoreInfo] = []
    unit_counter = 0
    input_instance_counter = 0
    # (units, input units, any log flags) per shared pipeline_hw list
    template_counts: dict[int, tuple[int, int, bool]] = {}
    for tile in arch.tiles:
        for core_cfg in tile.cores:
            core = CoreInfo(
                core_id=core_cfg.address.id,
                tile_id=tile.id,
                offset_within_tile=core_cfg.address.offset_within_tile,
                name=core_cfg.name,
                buffer_position=core_cfg.pipeline.buffer_position,
                max_neurons=core_cfg.pipeline.max_neurons_supported,
                log_energy=core_cfg.pipeline.log_energy,
            )
            for axon_in in core_cfg.axon_in:
                core.axon_in_names.append(axon_in.name)
            if core_cfg.axon_in:
                core.energy_message_in = core_cfg.axon_in[0].metrics.energy_message_in
                core.latency_message_in = core_cfg.axon_in[
                    0
                ].metrics.latency_message_in
            for axon_out in core_cfg.axon_out:
                core.axon_out_names.append(axon_out.name)
            if core_cfg.axon_out:
                core.energy_message_out = core_cfg.axon_out[
                    0
                ].metrics.energy_message_out
                core.latency_message_out = core_cfg.axon_out[
                    0
                ].metrics.latency_message_out
            if used_core_ids is not None and (
                core_cfg.address.id not in used_core_ids
            ):
                key = id(core_cfg.pipeline_hw)
                counts = template_counts.get(key)
                if counts is None:
                    n_units = len(core_cfg.pipeline_hw)
                    n_inputs = sum(
                        1
                        for u in core_cfg.pipeline_hw
                        if u.model_info.name == "input"
                    )
                    any_log = core_cfg.pipeline.log_energy or any(
                        u.model_info.log_energy or u.model_info.log_latency
                        for u in core_cfg.pipeline_hw
                    )
                    counts = (n_units, n_inputs, any_log)
                    template_counts[key] = counts
                n_units, n_inputs, any_log = counts
                if not any_log:
                    # unit ids stay dense over materialized units (they are
                    # only dict keys / array indices); input-model instance
                    # numbers count EVERY input unit on the chip because
                    # they seed the reference's per-instance RNGs
                    # (src/models.hpp:347)
                    input_instance_counter += n_inputs
                    cores.append(core)
                    continue
            for unit_cfg in core_cfg.pipeline_hw:
                try:
                    spec = get_model(unit_cfg.model_info.name)
                except ValueError:
                    plugin_path = unit_cfg.model_info.plugin_library_path
                    if not plugin_path:
                        raise
                    from .plugins import load_plugin

                    load_plugin(plugin_path)
                    spec = get_model(unit_cfg.model_info.name)
                # check_implemented: arch section flags must be a subset of the
                # model's capabilities (src/core.cpp:225-227)
                if unit_cfg.implements_synapse and not spec.implements_synapse:
                    raise HardwareMappingError(
                        f"Model {spec.name} does not implement synapse "
                        f"functionality (unit {unit_cfg.name})"
                    )
                if unit_cfg.implements_dendrite and not spec.implements_dendrite:
                    raise HardwareMappingError(
                        f"Model {spec.name} does not implement dendrite "
                        f"functionality (unit {unit_cfg.name})"
                    )
                if unit_cfg.implements_soma and not spec.implements_soma:
                    raise HardwareMappingError(
                        f"Model {spec.name} does not implement soma "
                        f"functionality (unit {unit_cfg.name})"
                    )
                if (
                    spec.implements_synapse
                    and spec.implements_soma
                    and not spec.implements_dendrite
                ):
                    raise HardwareMappingError(
                        "Invalid pipeline configuration: h/w supports synapse "
                        "and soma but not dendrite functionality."
                    )
                unit = HardwareUnit(
                    name=unit_cfg.name,
                    core_id=core.core_id,
                    spec=spec,
                    unit_id=unit_counter,
                    implements_synapse=spec.implements_synapse,
                    implements_dendrite=spec.implements_dendrite,
                    implements_soma=spec.implements_soma,
                    log_energy=unit_cfg.model_info.log_energy,
                    log_latency=unit_cfg.model_info.log_latency,
                    update_every_timestep=unit_cfg.model_info.update_every_timestep,
                    plugin_path=unit_cfg.model_info.plugin_library_path,
                    model_attributes=unit_cfg.model_info.model_attributes,
                )
                unit_counter += 1
                if spec.soma_model_id == SOMA_MODEL_INPUT:
                    input_instance_counter += 1
                    unit.input_instance = input_instance_counter
                _extract_unit_defaults(unit)
                core.units.append(unit)
            cores.append(core)
    return cores


def compile_chip(arch: Architecture, net: SpikingNetwork) -> CompiledChip:
    compiled = CompiledChip(arch)
    used_core_ids = {
        neuron.core_address.id
        for group in net.groups.values()
        for neuron in group.neurons
        if neuron.core_address is not None
    }
    cores = build_hardware(arch, used_core_ids)
    compiled.cores = cores
    compiled.n_cores = len(cores)
    compiled.units = [unit for core in cores for unit in core.units]

    # ---- 1. map neurons (global mapping order) ----
    all_neurons = [
        neuron for group in net.groups.values() for neuron in group.neurons
    ]
    for neuron in all_neurons:
        if neuron.core_address is None:
            raise HardwareMappingError(
                f"Neuron: {neuron.parent_group_name}.{neuron.offset} not mapped."
            )
    all_neurons.sort(key=lambda n: n.mapping_order)

    per_core_neurons: dict[int, list] = {core.core_id: [] for core in cores}
    refs_in_map_order: list[NeuronRef] = []
    for global_id, neuron in enumerate(all_neurons):
        core = cores[neuron.core_address.id]
        if len(per_core_neurons[core.core_id]) >= core.max_neurons:
            raise HardwareMappingError(
                f"Error: Exceeded maximum neurons per core "
                f"({core.max_neurons})."
            )
        if not core.units:
            raise HardwareMappingError(
                f"No pipeline units defined for cid:{core.core_id}"
            )
        dendrite_unit = core.find_unit(neuron.dendrite_hw_name, is_dendrite=True)
        soma_unit = core.find_unit(neuron.soma_hw_name, is_soma=True)
        if not core.axon_out_names:
            raise HardwareMappingError(
                f"No axon out units defined for cid:{core.core_id}"
            )
        ref = NeuronRef(
            slot=-1,
            group_name=neuron.parent_group_name,
            offset=neuron.offset,
            global_id=global_id,
            core=core,
            offset_in_core=len(per_core_neurons[core.core_id]),
            soma_unit=soma_unit,
            dendrite_unit=dendrite_unit,
            log_spikes=neuron.log_spikes,
            log_potential=neuron.log_potential,
            mapping_order=neuron.mapping_order,
        )
        dendrite_unit.neuron_count += 1
        dendrite_unit.is_used = True
        if soma_unit is not dendrite_unit:
            soma_unit.neuron_count += 1
        soma_unit.is_used = True
        per_core_neurons[core.core_id].append((neuron, ref))
        refs_in_map_order.append(ref)

    # Assign global slots core-major (the device layout)
    slot = 0
    neuron_lookup: dict[tuple[str, int], NeuronRef] = {}
    compiled.neurons = []
    for core in cores:
        for neuron, ref in per_core_neurons[core.core_id]:
            ref.slot = slot
            core.neuron_slots.append(slot)
            compiled.neurons.append(ref)
            neuron_lookup[(ref.group_name, ref.offset)] = ref
            slot += 1
    n = slot
    compiled.n_neurons = n

    compiled.mapped_cores = sum(
        1 for core in cores if core.neuron_slots
    )
    used_tiles = {core.tile_id for core in cores if core.neuron_slots}
    compiled.mapped_tiles = len(used_tiles)

    # group name -> slots (in offset order)
    for name, group in net.groups.items():
        slots = np.array(
            [neuron_lookup[(name, i)].slot for i in range(len(group.neurons))],
            dtype=np.int32,
        )
        compiled.groups[name] = slots

    # ---- 2. per-neuron parameter arrays ----
    f64 = np.float64
    compiled.core_id = np.zeros(n, dtype=np.int32)
    compiled.offset_in_core = np.zeros(n, dtype=np.int32)
    compiled.soma_model = np.full(n, -1, dtype=np.int32)
    compiled.soma_unit_id = np.zeros(n, dtype=np.int32)
    compiled.dendrite_model = np.full(n, -1, dtype=np.int32)
    compiled.dendrite_unit_id = np.zeros(n, dtype=np.int32)
    compiled.dendrite_in_neuron_phase = np.zeros(n, dtype=bool)
    compiled.dendrite_in_message_phase = np.zeros(n, dtype=bool)
    compiled.soma_in_message_phase = np.zeros(n, dtype=bool)
    compiled.threshold = np.zeros(n, dtype=f64)
    compiled.reverse_threshold = np.zeros(n, dtype=f64)
    compiled.reset = np.zeros(n, dtype=f64)
    compiled.reverse_reset = np.zeros(n, dtype=f64)
    compiled.reset_mode = np.full(n, int(NeuronResetMode.HARD), dtype=np.int32)
    compiled.reverse_reset_mode = np.full(
        n, int(NeuronResetMode.NONE), dtype=np.int32
    )
    compiled.leak_decay = np.ones(n, dtype=f64)
    compiled.input_decay = np.zeros(n, dtype=f64)
    compiled.bias = np.zeros(n, dtype=f64)
    compiled.leak = np.zeros(n, dtype=f64)
    compiled.leak_towards_zero = np.ones(n, dtype=bool)
    compiled.random_range_mask = np.zeros(n, dtype=np.uint32)
    compiled.force_update = np.zeros(n, dtype=bool)
    compiled.refractory_delay = np.zeros(n, dtype=np.int32)
    compiled.initial_potential = np.zeros(n, dtype=f64)
    compiled.log_spikes = np.zeros(n, dtype=bool)
    compiled.log_potential = np.zeros(n, dtype=bool)
    compiled.log_u = np.zeros(n, dtype=bool)
    compiled.soma_energy_access = np.zeros(n, dtype=f64)
    compiled.soma_energy_update = np.zeros(n, dtype=f64)
    compiled.soma_energy_spike = np.zeros(n, dtype=f64)
    compiled.soma_lat_access = np.zeros(n, dtype=f64)
    compiled.soma_lat_update = np.zeros(n, dtype=f64)
    compiled.soma_lat_spike = np.zeros(n, dtype=f64)
    compiled.dendrite_energy_update = np.zeros(n, dtype=f64)
    compiled.dendrite_lat_update = np.zeros(n, dtype=f64)
    compiled.input_poisson = np.zeros(n, dtype=f64)
    compiled.input_rate_interval = np.zeros(n, dtype=np.int64)
    compiled.input_train_start = np.zeros(n, dtype=np.int64)
    compiled.input_train_len = np.zeros(n, dtype=np.int32)
    compiled.input_train_stride = np.ones(n, dtype=np.int32)
    compiled.input_train_rank = np.zeros(n, dtype=np.int32)
    compiled.input_unit_instance = np.zeros(n, dtype=np.int32)

    unknown_attributes: set[tuple[str, str]] = set()
    train_segments: list[np.ndarray] = []
    train_cursor = 0
    # Track neurons sharing an input unit, for the shared-iterator semantics
    # (src/models.cpp:863-903: one spike iterator per unit instance)
    input_unit_members: dict[int, list[int]] = {}
    shared_unit_members: dict[int, list[int]] = {}
    multitap_params: dict[int, tuple[list[float], list[float]]] = {}
    max_taps = 1

    for core in cores:
        buffer_pos = core.buffer_position
        for core_slot, (neuron, ref) in enumerate(per_core_neurons[core.core_id]):
            i = ref.slot
            compiled.core_id[i] = core.core_id
            compiled.offset_in_core[i] = core_slot
            soma_unit = ref.soma_unit
            dendrite_unit = ref.dendrite_unit
            compiled.soma_model[i] = soma_unit.spec.soma_model_id
            if soma_unit.spec.soma_model_id >= SOMA_MODEL_PLUGIN_BASE:
                _ensure_plugin(compiled, soma_unit.spec)
            compiled.soma_unit_id[i] = soma_unit.unit_id
            compiled.dendrite_model[i] = dendrite_unit.spec.dendrite_model_id
            compiled.dendrite_unit_id[i] = dendrite_unit.unit_id
            # Pipeline membership (src/mapped.cpp:27-58,168-188)
            compiled.dendrite_in_neuron_phase[i] = (
                buffer_pos <= BufferPosition.INSIDE_DENDRITE
            )
            # Note: the reference also skips a unit already present in the
            # message pipeline (multi-function units, src/mapped.cpp:44-58);
            # built-in models are single-function so the position checks
            # suffice here.
            compiled.dendrite_in_message_phase[i] = (
                buffer_pos > BufferPosition.BEFORE_DENDRITE
            )
            compiled.soma_in_message_phase[i] = (
                buffer_pos > BufferPosition.BEFORE_SOMA
            ) and (ref.soma_unit is not dendrite_unit)
            compiled.log_spikes[i] = ref.log_spikes
            compiled.log_potential[i] = ref.log_potential
            compiled.soma_energy_access[i] = soma_unit.energy_access_neuron
            compiled.soma_energy_update[i] = soma_unit.energy_update_neuron
            compiled.soma_energy_spike[i] = soma_unit.energy_spike_out
            compiled.soma_lat_access[i] = soma_unit.latency_access_neuron
            compiled.soma_lat_update[i] = soma_unit.latency_update_neuron
            compiled.soma_lat_spike[i] = soma_unit.latency_spike_out
            compiled.dendrite_energy_update[i] = dendrite_unit.energy_update
            compiled.dendrite_lat_update[i] = dendrite_unit.latency_update

            # Forward attributes by scope (src/mapped.cpp:113-166)
            attrs = neuron.model_attributes
            spikes_train: Optional[list[bool]] = None
            for key, attribute in attrs.items():
                to_soma = attribute.forward_to_soma
                to_dendrite = attribute.forward_to_dendrite
                _check_attribute_recognized(
                    unknown_attributes, key, attribute,
                    soma_unit.spec, dendrite_unit.spec,
                )
                if to_soma:
                    model_id = soma_unit.spec.soma_model_id
                    if model_id == SOMA_MODEL_LIF:
                        _apply_lif_attribute(compiled, i, key, attribute)
                    elif model_id == SOMA_MODEL_TRUENORTH:
                        _apply_truenorth_attribute(compiled, i, key, attribute)
                    elif model_id == SOMA_MODEL_INPUT:
                        if key == "spikes":
                            spikes_train = attribute.as_bool_list()
                        elif key == "poisson":
                            compiled.input_poisson[i] = attribute.as_float()
                        elif key == "rate":
                            rate = attribute.as_float()
                            if rate > 0.0:
                                compiled.input_rate_interval[i] = int(1.0 / rate)
                    elif model_id >= SOMA_MODEL_PLUGIN_BASE:
                        spec = soma_unit.spec
                        if key in spec.param_defaults:
                            _plugin_param_array(compiled, spec, key)[i] = (
                                attribute.as_float()
                            )
                if to_dendrite:
                    if dendrite_unit.spec.dendrite_model_id == (
                        DENDRITE_MODEL_MULTITAP
                    ):
                        _apply_multitap_attribute(
                            multitap_params, dendrite_unit.unit_id, key, attribute
                        )

            if soma_unit.spec.shared_unit_state:
                shared_unit_members.setdefault(
                    soma_unit.unit_id, []
                ).append(i)
            if soma_unit.spec.soma_model_id == SOMA_MODEL_INPUT:
                compiled.input_unit_instance[i] = soma_unit.input_instance
                input_unit_members.setdefault(soma_unit.unit_id, []).append(i)
                if spikes_train is not None:
                    arr = np.asarray(spikes_train, dtype=bool)
                    compiled.input_train_start[i] = train_cursor
                    compiled.input_train_len[i] = arr.size
                    train_segments.append(arr)
                    train_cursor += arr.size

    # Shared-unit semantics (src/models.hpp:344-378): an InputModel unit has
    # ONE spikes vector / poisson probability / rate — the last-set neuron
    # attribute wins — and one iterator that every member's update advances.
    # Member of rank r therefore reads unit_train[(t-1)*stride + r].
    for unit_id, members in input_unit_members.items():
        stride = len(members)
        last_start, last_len = 0, 0
        last_poisson, last_rate_interval = 0.0, 0
        for i in members:  # slot order == attribute application order
            if compiled.input_train_len[i] > 0:
                last_start = compiled.input_train_start[i]
                last_len = compiled.input_train_len[i]
            if compiled.input_poisson[i] > 0.0:
                last_poisson = compiled.input_poisson[i]
            if compiled.input_rate_interval[i] > 0:
                last_rate_interval = compiled.input_rate_interval[i]
        for rank, i in enumerate(members):
            compiled.input_train_stride[i] = stride
            compiled.input_train_rank[i] = rank
            compiled.input_train_start[i] = last_start
            compiled.input_train_len[i] = last_len
            compiled.input_poisson[i] = last_poisson
            compiled.input_rate_interval[i] = last_rate_interval

    compiled.input_trains = (
        np.concatenate(train_segments)
        if train_segments
        else np.zeros(0, dtype=bool)
    )

    # Shared-unit plugin state (e.g. Hodgkin-Huxley): members advance one
    # shared sequence, one update per neuron per timestep in slot order
    compiled.plugin_shared_rank = np.zeros(n, dtype=np.int32)
    compiled.plugin_shared_stride = np.ones(n, dtype=np.int32)
    for members in shared_unit_members.values():
        for rank, slot in enumerate(members):
            compiled.plugin_shared_rank[slot] = rank
            compiled.plugin_shared_stride[slot] = len(members)
    compiled.plugin_shared_max_stride = (
        int(compiled.plugin_shared_stride.max()) if n else 1
    )

    # Multitap parameter matrices
    if multitap_params:
        compiled.has_multitap = True
        for time_constants, space_constants in multitap_params.values():
            max_taps = max(max_taps, len(time_constants))
    compiled.max_taps = max_taps
    compiled.n_taps = np.ones(n, dtype=np.int32)
    compiled.tap_time_constants = np.zeros((n, max_taps), dtype=f64)
    compiled.tap_space_constants = np.zeros((n, max(max_taps - 1, 1)), dtype=f64)
    if multitap_params:
        for ref in compiled.neurons:
            params = multitap_params.get(ref.dendrite_unit.unit_id)
            if params is None:
                continue
            time_constants, space_constants = params
            taps = len(time_constants)
            compiled.n_taps[ref.slot] = taps
            compiled.tap_time_constants[ref.slot, :taps] = time_constants
            compiled.tap_space_constants[ref.slot, : taps - 1] = space_constants

    # ---- 3. map connections (groups in name order; src/chip.cpp:334-380) ----
    # Object edges (Connection instances) walk a Python loop; bulk hyperedges
    # (BulkEdges, from the conv2d/dense fast paths) stay as numpy arrays.
    # Both merge into flat per-edge arrays for vectorized axon allocation.
    obj_pre: list[int] = []
    obj_post: list[int] = []
    obj_weight: list[float] = []
    obj_delay: list[int] = []
    obj_tap: list[int] = []
    obj_unit: list[int] = []
    obj_seq: list[int] = []
    for group_name in sorted(net.groups):
        group = net.groups[group_name]
        for neuron in group.neurons:
            for seq_in_neuron, con in enumerate(neuron.edges_out):
                pre_ref = neuron_lookup[
                    (con.pre_neuron.group_name, con.pre_neuron.neuron_offset)
                ]
                post_ref = neuron_lookup[
                    (con.post_neuron.group_name, con.post_neuron.neuron_offset)
                ]
                hw_name = con.synapse_hw_name
                if not hw_name:
                    # Fall back to post neuron's default
                    # (src/chip.cpp:308-332)
                    post_neuron_obj = net.groups[
                        con.post_neuron.group_name
                    ].neurons[con.post_neuron.neuron_offset]
                    hw_name = post_neuron_obj.default_synapse_hw_name
                synapse_unit = post_ref.core.find_unit(hw_name, is_synapse=True)
                synapse_unit.connection_count += 1
                synapse_unit.is_used = True
                weight = 0.0
                for key, attribute in con.synapse_attributes.items():
                    if key in ("w", "weight") and attribute.forward_to_synapse:
                        weight = attribute.as_float()
                delay = 0
                tap = 0
                for key, attribute in con.dendrite_attributes.items():
                    if not attribute.forward_to_dendrite:
                        continue
                    if key in ("delay", "d") and (
                        post_ref.dendrite_unit.spec.dendrite_model_id
                        == DENDRITE_MODEL_ACCUMULATOR_DELAY
                    ):
                        delay = attribute.as_int()
                        if delay > ACCUMULATOR_MAX_DELAY:
                            raise ValueError("Error: delay > max delay")
                    elif key == "tap" and (
                        post_ref.dendrite_unit.spec.dendrite_model_id
                        == DENDRITE_MODEL_MULTITAP
                    ):
                        tap = attribute.as_int()
                    elif key == "compartment" and (
                        post_ref.dendrite_unit.spec.dendrite_model_id
                        == DENDRITE_MODEL_PLUGIN_COMP
                    ):
                        tap = attribute.as_int()
                obj_pre.append(pre_ref.slot)
                obj_post.append(post_ref.slot)
                obj_weight.append(weight)
                obj_delay.append(delay)
                obj_tap.append(tap)
                obj_unit.append(synapse_unit.unit_id)
                obj_seq.append(seq_in_neuron)

    # Per-slot default synapse unit (for bulk edges, which always use the
    # post neuron's default; conv2d/dense edges have no per-edge hw name)
    default_syn_unit = np.full(n, -1, dtype=np.int32)
    for ref in compiled.neurons:
        group_neuron = net.groups[ref.group_name].neurons[ref.offset]
        unit = ref.core.find_unit(
            group_neuron.default_synapse_hw_name, is_synapse=True
        )
        default_syn_unit[ref.slot] = unit.unit_id

    bulk_parts: list[tuple] = []
    bulk_seq_base = 1 << 30  # bulk edges order after a neuron's object edges
    running = 0
    for group_name in sorted(net.groups):
        group = net.groups[group_name]
        if not getattr(group, "bulk_edges", None):
            continue
        src_slots_arr = np.asarray(compiled.groups[group_name])
        for bulk in group.bulk_edges:
            dest_slots_arr = np.asarray(compiled.groups[bulk.dest_group_name])
            k = len(bulk)
            pre = src_slots_arr[bulk.src_idx]
            post = dest_slots_arr[bulk.dest_idx]
            weight = np.zeros(k, dtype=f64)
            for key in ("w", "weight"):
                if key in bulk.attributes:
                    values, fwd_syn, _ = bulk.attributes[key]
                    if fwd_syn:
                        weight = values.astype(f64)
            delay = np.zeros(k, dtype=np.int32)
            for key in ("delay", "d"):
                if key in bulk.attributes:
                    values, _, fwd_den = bulk.attributes[key]
                    if fwd_den:
                        mask = (
                            compiled.dendrite_model[post]
                            == DENDRITE_MODEL_ACCUMULATOR_DELAY
                        )
                        delay = np.where(
                            mask, values.astype(np.int32), 0
                        )
                        if delay.max(initial=0) > ACCUMULATOR_MAX_DELAY:
                            raise ValueError("Error: delay > max delay")
            tap = np.zeros(k, dtype=np.int32)
            if "tap" in bulk.attributes:
                values, _, fwd_den = bulk.attributes["tap"]
                if fwd_den:
                    mask = (
                        compiled.dendrite_model[post]
                        == DENDRITE_MODEL_MULTITAP
                    )
                    tap = np.where(mask, values.astype(np.int32), 0)
            unit_ids = default_syn_unit[post]
            seq = bulk_seq_base + running + np.arange(k, dtype=np.int64)
            running += k
            structure = getattr(bulk, "structure", None)
            from_conv = np.zeros(k, dtype=bool)
            if (
                structure is not None
                and structure[0] == "conv2d"
                and not delay.any()
                and not tap.any()
            ):
                conv = structure[1]
                filter_weights = structure[2]
                n_taps = (
                    conv.kernel_height
                    * conv.kernel_width
                    * conv.input_channels
                    * conv.kernel_count
                )
                kernel = (
                    filter_weights[:n_taps].reshape(
                        conv.kernel_height,
                        conv.kernel_width,
                        conv.input_channels,
                        conv.kernel_count,
                    )
                    if filter_weights is not None
                    else np.zeros(
                        (
                            conv.kernel_height,
                            conv.kernel_width,
                            conv.input_channels,
                            conv.kernel_count,
                        ),
                        dtype=f64,
                    )
                )
                compiled.conv_specs.append(
                    ConvSpec(
                        src_group=group_name,
                        dest_group=bulk.dest_group_name,
                        in_w=conv.input_width,
                        in_h=conv.input_height,
                        in_c=conv.input_channels,
                        k_w=conv.kernel_width,
                        k_h=conv.kernel_height,
                        out_c=conv.kernel_count,
                        s_w=conv.stride_width,
                        s_h=conv.stride_height,
                        kernel=kernel.astype(f64),
                    )
                )
                from_conv[:] = True
            bulk_parts.append(
                (pre, post, weight, delay, tap, unit_ids, seq, from_conv)
            )
            counts = np.bincount(unit_ids, minlength=len(compiled.units))
            for unit in compiled.units:
                add = int(counts[unit.unit_id])
                if add:
                    unit.connection_count += add
                    unit.is_used = True

    def concat(obj_list, parts_idx, dtype):
        arrays = [np.asarray(obj_list, dtype=dtype)] + [
            part[parts_idx].astype(dtype) for part in bulk_parts
        ]
        return np.concatenate(arrays) if arrays else np.zeros(0, dtype=dtype)

    all_pre = concat(obj_pre, 0, np.int64)
    all_post = concat(obj_post, 1, np.int32)
    all_weight = concat(obj_weight, 2, f64)
    all_delay = concat(obj_delay, 3, np.int32)
    all_tap = concat(obj_tap, 4, np.int32)
    all_unit = concat(obj_unit, 5, np.int32)
    all_seq = concat(obj_seq, 6, np.int64)
    all_from_conv = concat([False] * len(obj_pre), 7, bool)

    # ---- 4. axon allocation (src/chip.cpp:382-408,1263-1391), vectorized.
    # Reference order: cores in id order, neurons in slot order, dest cores
    # ascending, edges in creation order. Slots are core-major, so a stable
    # lexsort by (pre_slot, dest_core, seq) reproduces it exactly.
    e = len(all_pre)
    if e:
        dest_core_per_edge = compiled.core_id[all_post].astype(np.int64)
        order = np.lexsort((all_seq, dest_core_per_edge, all_pre))
        all_pre = all_pre[order]
        all_post = all_post[order]
        all_weight = all_weight[order]
        all_delay = all_delay[order]
        all_tap = all_tap[order]
        all_unit = all_unit[order]
        all_from_conv = all_from_conv[order]
        dest_core_per_edge = dest_core_per_edge[order]
        pair_key = all_pre * np.int64(len(cores)) + dest_core_per_edge
        new_axon = np.empty(e, dtype=bool)
        new_axon[0] = True
        new_axon[1:] = pair_key[1:] != pair_key[:-1]
        edge_axon_arr = np.cumsum(new_axon) - 1
        axon_starts = np.nonzero(new_axon)[0]
        axon_src = all_pre[axon_starts].astype(np.int32)
        axon_dest = dest_core_per_edge[axon_starts].astype(np.int32)
        # ordinal of each axon within its pre neuron
        new_pre = np.empty(len(axon_starts), dtype=bool)
        new_pre[0] = True
        new_pre[1:] = axon_src[1:] != axon_src[:-1]
        first_axon_of_pre = np.maximum.accumulate(
            np.where(new_pre, np.arange(len(axon_starts)), 0)
        )
        axon_ordinal = np.arange(len(axon_starts)) - first_axon_of_pre
    else:
        edge_axon_arr = np.zeros(0, dtype=np.int64)
        axon_src = np.zeros(0, dtype=np.int32)
        axon_dest = np.zeros(0, dtype=np.int32)
        axon_ordinal = np.zeros(0, dtype=np.int64)

    a = len(axon_src)
    compiled.n_axons = a
    compiled.n_edges = e
    compiled.axon_src_slot = axon_src
    compiled.axon_dest_core = axon_dest
    compiled.axon_ordinal_in_neuron = axon_ordinal.astype(np.int32)
    compiled.edge_src_slot = all_pre.astype(np.int32)
    compiled.edge_dest_slot = all_post
    compiled.edge_axon = edge_axon_arr.astype(np.int32)
    compiled.edge_weight = all_weight
    compiled.edge_synapse_unit_id = all_unit
    compiled.edge_delay = all_delay
    compiled.edge_tap = all_tap
    compiled.edge_from_conv = all_from_conv
    compiled.has_delay_dendrite = bool(
        np.any(
            compiled.dendrite_model[compiled.edge_dest_slot]
            == DENDRITE_MODEL_ACCUMULATOR_DELAY
        )
    ) if e else False

    n_units = len(compiled.units)
    unit_energy_spike = np.zeros(n_units, dtype=f64)
    unit_latency_spike = np.zeros(n_units, dtype=f64)
    for unit in compiled.units:
        unit_energy_spike[unit.unit_id] = unit.energy_process_spike
        unit_latency_spike[unit.unit_id] = unit.latency_process_spike
    compiled.edge_synapse_energy = unit_energy_spike[all_unit]
    compiled.edge_synapse_latency = unit_latency_spike[all_unit]
    # Message-phase dendrite costs per edge (synapse always runs in the
    # message pipeline; dendrite joins it unless the buffer sits before it)
    dest_slots = compiled.edge_dest_slot if e else np.zeros(0, dtype=np.int32)
    in_msg = (
        compiled.dendrite_in_message_phase[dest_slots]
        if e
        else np.zeros(0, dtype=bool)
    )
    compiled.edge_dendrite_energy = np.where(
        in_msg, compiled.dendrite_energy_update[dest_slots], 0.0
    )
    compiled.edge_dendrite_latency = np.where(
        in_msg, compiled.dendrite_lat_update[dest_slots], 0.0
    )

    # ---- 5. per-axon constants ----
    fanout = np.zeros(a, dtype=np.int32)
    if e:
        np.add.at(fanout, compiled.edge_axon, 1)
    compiled.axon_fanout = fanout

    core_tile = np.asarray([core.tile_id for core in cores], dtype=np.int32)
    core_offset_in_tile = np.asarray(
        [core.offset_within_tile for core in cores], dtype=np.int32
    )
    tile_x = np.asarray([t.x for t in arch.tiles], dtype=np.int32)
    tile_y = np.asarray([t.y for t in arch.tiles], dtype=np.int32)
    m = arch.tiles
    e_north = np.asarray([t.power_metrics.energy_north_hop for t in m])
    e_east = np.asarray([t.power_metrics.energy_east_hop for t in m])
    e_south = np.asarray([t.power_metrics.energy_south_hop for t in m])
    e_west = np.asarray([t.power_metrics.energy_west_hop for t in m])
    l_north = np.asarray([t.power_metrics.latency_north_hop for t in m])
    l_east = np.asarray([t.power_metrics.latency_east_hop for t in m])
    l_south = np.asarray([t.power_metrics.latency_south_hop for t in m])
    l_west = np.asarray([t.power_metrics.latency_west_hop for t in m])

    src_core = compiled.core_id[compiled.axon_src_slot] if a else np.zeros(
        0, dtype=np.int32
    )
    compiled.axon_src_core = src_core
    src_tile = core_tile[src_core]
    dest_tile = core_tile[compiled.axon_dest_core] if a else np.zeros(
        0, dtype=np.int32
    )
    compiled.axon_dest_tile = dest_tile
    sx, sy = tile_x[src_tile], tile_y[src_tile]
    dx, dy = tile_x[dest_tile], tile_y[dest_tile]
    compiled.axon_src_x = sx
    compiled.axon_src_y = sy
    compiled.axon_dest_x = dx
    compiled.axon_dest_y = dy
    compiled.axon_src_core_offset = core_offset_in_tile[src_core]
    compiled.axon_dest_core_offset = (
        core_offset_in_tile[compiled.axon_dest_core]
        if a
        else np.zeros(0, dtype=np.int32)
    )
    x_hops = np.abs(sx - dx).astype(np.int64)
    y_hops = np.abs(sy - dy).astype(np.int64)
    compiled.axon_x_hops = x_hops
    compiled.axon_y_hops = y_hops
    compiled.axon_hops = x_hops + y_hops
    east = sx < dx
    north = sy < dy
    compiled.axon_east = east
    compiled.axon_north = north
    # Latency uses the src tile's hop costs; energy uses the dest tile's
    # (src/chip.cpp:1127-1169 with sim_calculate_tile_energy accumulating at
    # the destination tile)
    compiled.axon_min_hop_delay = x_hops * np.where(
        east, l_east[src_tile], l_west[src_tile]
    ) + y_hops * np.where(north, l_north[src_tile], l_south[src_tile])
    compiled.axon_hop_energy = x_hops * np.where(
        east, e_east[dest_tile], e_west[dest_tile]
    ) + y_hops * np.where(north, e_north[dest_tile], e_south[dest_tile])

    core_energy_in = np.asarray([core.energy_message_in for core in cores])
    core_latency_in = np.asarray([core.latency_message_in for core in cores])
    core_energy_out = np.asarray([core.energy_message_out for core in cores])
    core_latency_out = np.asarray([core.latency_message_out for core in cores])
    compiled.axon_energy_in = (
        core_energy_in[compiled.axon_dest_core] if a else np.zeros(0)
    )
    compiled.axon_latency_in = (
        core_latency_in[compiled.axon_dest_core] if a else np.zeros(0)
    )
    compiled.axon_energy_out = core_energy_out[src_core] if a else np.zeros(0)
    compiled.axon_latency_out = core_latency_out[src_core] if a else np.zeros(0)

    # Constant part of per-message processing latency: axon_in +
    # per-edge synapse (+ message-phase dendrite) latencies. Accumulation
    # starts FROM the axon-in latency and adds each edge's (synapse +
    # dendrite) latency in edge order — the reference's exact float64
    # association (process_message, src/chip.cpp:738-764: latency =
    # axon_in, then += per-edge pipeline latency), which differs in the
    # last ulp from summing the edges separately and adding axon_in after.
    per_edge_lat = compiled.edge_synapse_latency + compiled.edge_dendrite_latency
    compiled.axon_const_processing_latency = (
        compiled.axon_latency_in.astype(f64).copy()
    )
    if e:
        np.add.at(
            compiled.axon_const_processing_latency,
            compiled.edge_axon,
            per_edge_lat,
        )

    # ---- 6. trace slot orderings (groups sorted by name, offsets ascending;
    # mirrors std::map iteration in sim_trace_* writers) ----
    spike_slots, spike_labels = [], []
    pot_slots, pot_labels = [], []
    u_slots, u_labels = [], []
    for group_name in sorted(compiled.groups):
        slots = compiled.groups[group_name]
        for offset, nslot in enumerate(slots):
            if compiled.log_spikes[nslot]:
                spike_slots.append(nslot)
                spike_labels.append((group_name, offset))
            if compiled.log_potential[nslot]:
                pot_slots.append(nslot)
                pot_labels.append((group_name, offset))
            if compiled.log_u[nslot]:
                u_slots.append(nslot)
                u_labels.append((group_name, offset))
    compiled.spike_log_slots = np.asarray(spike_slots, dtype=np.int32)
    compiled.spike_log_labels = spike_labels
    compiled.potential_log_slots = np.asarray(pot_slots, dtype=np.int32)
    compiled.potential_log_labels = pot_labels
    compiled.u_log_slots = np.asarray(u_slots, dtype=np.int32)
    compiled.u_log_labels = u_labels

    # ---- 7. per-neuron aggregates over outgoing axons/edges ----
    src_slots = compiled.axon_src_slot
    def by_neuron(values, dtype=f64):
        out = np.zeros(n, dtype=dtype)
        if a:
            np.add.at(out, src_slots, values)
        return out

    compiled.neuron_n_axons = by_neuron(
        np.ones(a, dtype=np.int32), np.int32
    )
    compiled.neuron_axon_hops = by_neuron(compiled.axon_hops, np.int64)
    compiled.neuron_axon_energy = by_neuron(
        compiled.axon_hop_energy
        + compiled.axon_energy_in
        + compiled.axon_energy_out
    )
    compiled.neuron_axon_latency_out = by_neuron(compiled.axon_latency_out)
    compiled.neuron_spike_ops = by_neuron(compiled.axon_fanout, np.int64)
    edge_syn_e_per_axon = np.zeros(a, dtype=f64)
    edge_den_e_per_axon = np.zeros(a, dtype=f64)
    if e:
        np.add.at(
            edge_syn_e_per_axon, compiled.edge_axon, compiled.edge_synapse_energy
        )
        np.add.at(
            edge_den_e_per_axon, compiled.edge_axon, compiled.edge_dendrite_energy
        )
    compiled.neuron_synapse_energy = by_neuron(edge_syn_e_per_axon)
    compiled.neuron_msg_dendrite_energy = by_neuron(edge_den_e_per_axon)
    if n * len(cores) <= 64_000_000:
        proc_lat = np.zeros((n, len(cores)), dtype=np.float32)
        if a:
            np.add.at(
                proc_lat,
                (src_slots, compiled.axon_dest_core),
                compiled.axon_const_processing_latency.astype(np.float32),
            )
        compiled.neuron_proc_lat_core = proc_lat

    # Attribute-recognition warnings (PipelineUnit::check_attribute,
    # src/pipeline.cpp:124-149)
    for model_name, key in sorted(unknown_attributes):
        import warnings

        warnings.warn(
            f"Attribute {key!r} not recognized by model {model_name!r}",
            stacklevel=2,
        )

    # ---- 8. stochastic model support ----
    _build_stochastic_arrays(compiled)

    # ---- 9. optional perf columns (log_energy / log_latency flags) ----
    _build_perf_columns(compiled, arch)

    # plugin compartmental dendrites (e.g. NeuroFEM)
    for spec in compiled.plugin_specs:
        if spec.dendrite_compartments > 0:
            compiled.has_plugin_comp = True
            compiled.max_plugin_comp = max(
                compiled.max_plugin_comp, spec.dendrite_compartments
            )

    return compiled


def _check_attribute_recognized(
    unknown: set, key: str, attribute, soma_spec: ModelSpec,
    dendrite_spec: ModelSpec,
) -> None:
    """Collect attribute names no forwarded-to model recognizes
    (PipelineUnit::check_attribute warning parity)."""
    from .models import FRAMEWORK_ATTRIBUTES

    if key in FRAMEWORK_ATTRIBUTES:
        return
    recognized = False
    if attribute.forward_to_soma:
        recognized |= (
            key in soma_spec.attributes or key in soma_spec.param_defaults
        )
    if attribute.forward_to_dendrite:
        recognized |= key in dendrite_spec.attributes
        recognized |= key in dendrite_spec.param_defaults
    if attribute.forward_to_synapse:
        # synapse units recognize weight keys universally
        recognized |= key in ("w", "weight")
    if not recognized:
        unknown.add((soma_spec.name, key))


def _ensure_plugin(compiled: CompiledChip, spec: ModelSpec) -> None:
    """Register a plugin model's spec + parameter arrays with the chip."""
    if spec.name not in compiled.plugin_params:
        if all(s.name != spec.name for s in compiled.plugin_specs):
            compiled.plugin_specs.append(spec)
        compiled.plugin_params[spec.name] = {
            param: np.full(compiled.n_neurons, default, dtype=np.float64)
            for param, default in spec.param_defaults.items()
        }


def _plugin_param_array(
    compiled: CompiledChip, spec: ModelSpec, key: str
) -> np.ndarray:
    _ensure_plugin(compiled, spec)
    return compiled.plugin_params[spec.name][key]


def _build_perf_columns(compiled: CompiledChip, arch: Architecture) -> None:
    """Per-tile/core/unit energy+latency perf.csv columns
    (sim_trace_get_optional_traces, src/chip.cpp:1520-1555)."""
    n = compiled.n_neurons
    names: list[str] = []
    fired_cols: list[np.ndarray] = []
    updated_cols: list[np.ndarray] = []
    consts: list[float] = []

    tile_names = {t.id: t.name for t in arch.tiles}

    def add_column(name, fired=None, updated=None, const=0.0):
        names.append(name)
        fired_cols.append(
            fired if fired is not None else np.zeros(n, dtype=np.float64)
        )
        updated_cols.append(
            updated if updated is not None else np.zeros(n, dtype=np.float64)
        )
        consts.append(const)

    # per-unit contributions, reused for core columns
    def unit_energy(unit):
        fired = np.zeros(n, dtype=np.float64)
        updated = np.zeros(n, dtype=np.float64)
        const = 0.0
        if unit.implements_synapse and compiled.n_edges:
            mask = compiled.edge_synapse_unit_id == unit.unit_id
            np.add.at(
                fired,
                compiled.edge_src_slot[mask],
                compiled.edge_synapse_energy[mask],
            )
        if unit.implements_dendrite:
            members = compiled.dendrite_unit_id == unit.unit_id
            const += float(
                np.sum(
                    np.where(
                        members & compiled.dendrite_in_neuron_phase,
                        compiled.dendrite_energy_update,
                        0.0,
                    )
                )
            )
            if compiled.n_edges:
                dest_in_unit = members[compiled.edge_dest_slot]
                np.add.at(
                    fired,
                    compiled.edge_src_slot[dest_in_unit],
                    compiled.edge_dendrite_energy[dest_in_unit],
                )
        if unit.implements_soma:
            members = compiled.soma_unit_id == unit.unit_id
            const += float(
                np.sum(np.where(members, compiled.soma_energy_access, 0.0))
            )
            updated += np.where(members, compiled.soma_energy_update, 0.0)
            fired += np.where(members, compiled.soma_energy_spike, 0.0)
        return fired, updated, const

    def unit_latency(unit):
        fired = np.zeros(n, dtype=np.float64)
        updated = np.zeros(n, dtype=np.float64)
        const = 0.0
        if unit.implements_synapse and compiled.n_edges:
            mask = compiled.edge_synapse_unit_id == unit.unit_id
            np.add.at(
                fired,
                compiled.edge_src_slot[mask],
                compiled.edge_synapse_latency[mask],
            )
        if unit.implements_dendrite:
            members = compiled.dendrite_unit_id == unit.unit_id
            const += float(
                np.sum(
                    np.where(
                        members & compiled.dendrite_in_neuron_phase,
                        compiled.dendrite_lat_update,
                        0.0,
                    )
                )
            )
            if compiled.n_edges:
                dest_in_unit = members[compiled.edge_dest_slot]
                np.add.at(
                    fired,
                    compiled.edge_src_slot[dest_in_unit],
                    compiled.edge_dendrite_latency[dest_in_unit],
                )
        if unit.implements_soma:
            members = compiled.soma_unit_id == unit.unit_id
            const += float(
                np.sum(np.where(members, compiled.soma_lat_access, 0.0))
            )
            updated += np.where(members, compiled.soma_lat_update, 0.0)
            fired += np.where(members, compiled.soma_lat_spike, 0.0)
        return fired, updated, const

    a = compiled.n_axons

    def core_energy(core):
        """core.energy = axon-in + pipeline units + axon-out
        (sim_calculate_core_energy, src/chip.cpp:1211-1259)."""
        fired = np.zeros(n, dtype=np.float64)
        updated = np.zeros(n, dtype=np.float64)
        const = 0.0
        for unit in core.units:
            f, u, k = unit_energy(unit)
            fired += f
            updated += u
            const += k
        if a:
            dest_mask = compiled.axon_dest_core == core.core_id
            np.add.at(
                fired,
                compiled.axon_src_slot[dest_mask],
                compiled.axon_energy_in[dest_mask],
            )
            src_mask = compiled.axon_src_core == core.core_id
            np.add.at(
                fired,
                compiled.axon_src_slot[src_mask],
                compiled.axon_energy_out[src_mask],
            )
        return fired, updated, const

    for tile in arch.tiles:
        if tile.power_metrics.log_energy:
            # tile.energy = hop energy + every core's energy
            # (sim_calculate_tile_energy, src/chip.cpp:1189-1209)
            fired = np.zeros(n, dtype=np.float64)
            updated = np.zeros(n, dtype=np.float64)
            const = 0.0
            if a:
                mask = compiled.axon_dest_tile == tile.id
                np.add.at(
                    fired,
                    compiled.axon_src_slot[mask],
                    compiled.axon_hop_energy[mask],
                )
            for core in compiled.cores:
                if core.tile_id != tile.id:
                    continue
                f, u, k = core_energy(core)
                fired += f
                updated += u
                const += k
            add_column(
                f"{tile.name}.energy", fired=fired, updated=updated,
                const=const,
            )

    for core in compiled.cores:
        tile_name = tile_names[core.tile_id]
        if core.log_energy:
            fired, updated, const = core_energy(core)
            add_column(
                f"{tile_name}.{core.name}.energy",
                fired=fired, updated=updated, const=const,
            )
        for unit in core.units:
            if unit.log_energy:
                f, u, k = unit_energy(unit)
                add_column(
                    f"{tile_name}.{core.name}.{unit.name}.energy",
                    fired=f, updated=u, const=k,
                )
            if unit.log_latency:
                # The reference accumulates each unit's ENERGY into its
                # latency counter (latency += output.energy,
                # src/pipeline.cpp:102), so the per-unit .latency perf
                # column equals the .energy column — verified empirically
                # against the reference binary (tests/golden_ref/
                # cfg_perf_logging*). SANAFE_TPU_FIX_QUIRKS=1 reports the
                # actual unit latencies instead.
                import os

                if os.environ.get("SANAFE_TPU_FIX_QUIRKS", "0") == "1":
                    f, u, k = unit_latency(unit)
                else:
                    f, u, k = unit_energy(unit)
                add_column(
                    f"{tile_name}.{core.name}.{unit.name}.latency",
                    fired=f, updated=u, const=k,
                )

    # Lexicographic column order (the reference collects optional traces
    # in a std::map; src/chip.cpp:1520-1555)
    order = sorted(range(len(names)), key=lambda k: names[k])
    compiled.perf_col_names = [names[k] for k in order]
    if names:
        compiled.perf_col_fired = np.stack(
            [fired_cols[k] for k in order], axis=1
        )
        compiled.perf_col_updated = np.stack(
            [updated_cols[k] for k in order], axis=1
        )
        compiled.perf_col_const = np.asarray(
            [consts[k] for k in order], dtype=np.float64
        )


def _build_stochastic_arrays(compiled: CompiledChip) -> None:
    """Lower noise streams / LFSR masks / Poisson generators into dense
    arrays (reference: src/models.cpp:578-651, 745-760, 863-903)."""
    from .utils.rng import mask_loihi_noise

    n = compiled.n_neurons
    compiled.lif_noise_start = np.zeros(n, dtype=np.int32)
    compiled.lif_noise_len = np.zeros(n, dtype=np.int32)
    compiled.lif_noise_stride = np.ones(n, dtype=np.int32)
    compiled.lif_noise_rank = np.zeros(n, dtype=np.int32)
    value_parts: list[np.ndarray] = []
    cursor = 0

    unit_members: dict[int, list[int]] = {}
    for ref in compiled.neurons:
        unit_members.setdefault(ref.soma_unit.unit_id, []).append(ref.slot)

    for unit in compiled.units:
        if not (unit.implements_soma and unit.noise_file):
            continue
        members = unit_members.get(unit.unit_id, [])
        if not members:
            continue
        try:
            with open(unit.noise_file) as stream:
                raw = [
                    int(line.split()[0])
                    for line in stream
                    if line.strip()
                ]
        except OSError as exc:
            raise RuntimeError(
                f"Failed to open noise stream: {unit.noise_file}"
            ) from exc
        values = np.asarray(
            [mask_loihi_noise(v, unit.noise_bits) for v in raw],
            dtype=np.float64,
        )
        stride = len(members)
        for rank, slot in enumerate(sorted(members)):
            compiled.lif_noise_start[slot] = cursor
            compiled.lif_noise_len[slot] = values.size
            compiled.lif_noise_stride[slot] = stride
            compiled.lif_noise_rank[slot] = rank
        value_parts.append(values)
        cursor += values.size
    compiled.lif_noise_values = (
        np.concatenate(value_parts)
        if value_parts
        else np.zeros(1, dtype=np.float64)
    )

    tn_mask = (compiled.soma_model == SOMA_MODEL_TRUENORTH) & (
        compiled.random_range_mask != 0
    )
    compiled.tn_noise_slots = np.nonzero(tn_mask)[0].astype(np.int32)
    compiled.tn_noise_masks = compiled.random_range_mask[
        compiled.tn_noise_slots
    ].astype(np.int64)

    compiled.input_units = []
    for unit in compiled.units:
        if unit.spec.soma_model_id != SOMA_MODEL_INPUT:
            continue
        members = sorted(unit_members.get(unit.unit_id, []))
        if members:
            compiled.input_units.append(
                (unit.input_instance, np.asarray(members, dtype=np.int32))
            )
    compiled.has_poisson = bool(
        compiled.input_units
        and np.any(compiled.input_poisson > 0.0)
    )


def _apply_lif_attribute(
    compiled: CompiledChip, i: int, key: str, attribute: Attribute
) -> None:
    """LoihiLifModel::set_attribute_neuron (src/models.cpp:375-439)."""
    if key == "threshold":
        compiled.threshold[i] = attribute.as_float()
    elif key == "reverse_threshold":
        compiled.reverse_threshold[i] = attribute.as_float()
    elif key == "reset":
        compiled.reset[i] = attribute.as_float()
    elif key == "reverse_reset":
        compiled.reverse_reset[i] = attribute.as_float()
    elif key == "reset_mode":
        compiled.reset_mode[i] = int(parse_reset_mode(attribute.as_str()))
    elif key == "reverse_reset_mode":
        compiled.reverse_reset_mode[i] = int(parse_reset_mode(attribute.as_str()))
    elif key == "leak_decay":
        compiled.leak_decay[i] = attribute.as_float()
    elif key == "log_u":
        compiled.log_u[i] = attribute.as_bool()
    elif key == "input_decay":
        compiled.input_decay[i] = attribute.as_float()
    elif key == "bias":
        compiled.bias[i] = attribute.as_float()
    elif key in ("force_update", "force_update_every_timestep"):
        compiled.force_update[i] = attribute.as_bool()
    elif key == "refractory_delay":
        compiled.refractory_delay[i] = attribute.as_int()
    elif key == "potential":
        compiled.initial_potential[i] = attribute.as_float()


def _apply_truenorth_attribute(
    compiled: CompiledChip, i: int, key: str, attribute: Attribute
) -> None:
    """TrueNorthModel::set_attribute_neuron (src/models.cpp:664-722)."""
    if key == "threshold":
        compiled.threshold[i] = attribute.as_float()
    elif key == "reverse_threshold":
        compiled.reverse_threshold[i] = attribute.as_float()
    elif key == "reset":
        compiled.reset[i] = attribute.as_float()
    elif key == "reverse_reset":
        compiled.reverse_reset[i] = attribute.as_float()
    elif key == "reset_mode":
        compiled.reset_mode[i] = int(parse_reset_mode(attribute.as_str()))
    elif key == "reverse_reset_mode":
        compiled.reverse_reset_mode[i] = int(parse_reset_mode(attribute.as_str()))
    elif key == "leak":
        compiled.leak[i] = attribute.as_float()
    elif key == "bias":
        compiled.bias[i] = attribute.as_float()
    elif key in ("force_update", "force_update_every_timestep"):
        compiled.force_update[i] = attribute.as_bool()
    elif key == "leak_towards_zero":
        compiled.leak_towards_zero[i] = attribute.as_bool()
    elif key == "random_mask":
        mask = attribute.as_int()
        if mask < 0:
            raise ValueError("random_mask < 0; must be unsigned.")
        compiled.random_range_mask[i] = mask


def _apply_multitap_attribute(
    params: dict[int, tuple[list[float], list[float]]],
    unit_id: int,
    key: str,
    attribute: Attribute,
) -> None:
    """MultiTapModel1D attributes are per-unit (src/models.cpp:261-324)."""
    time_constants, space_constants = params.setdefault(unit_id, ([0.0], []))
    if key == "taps":
        taps = attribute.as_int()
        if taps <= 0:
            raise ValueError("Number of taps must be > 0")
        del time_constants[taps:]
        time_constants.extend([0.0] * (taps - len(time_constants)))
        del space_constants[max(taps - 1, 0):]
        space_constants.extend([0.0] * (taps - 1 - len(space_constants)))
        params[unit_id] = (time_constants, space_constants)
    elif key == "time_constants":
        values = attribute.as_float_list()
        params[unit_id] = (values, space_constants)
    elif key == "space_constants":
        values = attribute.as_float_list()
        params[unit_id] = (time_constants, values)
