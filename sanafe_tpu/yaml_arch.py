"""YAML architecture description parser.

Host-side equivalent of the reference's RapidYAML-based parser
(``src/yaml_arch.cpp``), built on PyYAML. Behavior parity notes:

- ``name[0..N]`` range expansion for tiles, cores, and hardware units
  (``src/yaml_arch.cpp:188-218,295-315,380-423``).
- Tiles and cores always get an ``[index]`` suffix, even without a range
  (``src/yaml_arch.cpp:295-315``); unit names keep their plain name unless a
  range is given.
- Same-named units across synapse/dendrite/soma sections merge into one
  multi-function unit with union'd implements flags
  (``src/yaml_arch.cpp:149-186``).
- All unit attributes except the reserved/scope keys are forwarded as model
  attributes (``src/yaml_common.cpp:30-36,101-230``); default energy/latency
  costs are extracted later from those attributes (``src/pipeline.cpp:151-266``).
"""

from __future__ import annotations

from typing import Any, IO

from .yaml_io import coerce_scalar, raw_load
from .arch import (
    Architecture,
    AxonInPowerMetrics,
    AxonOutPowerMetrics,
    CoreConfiguration,
    CorePipelineConfiguration,
    ModelInfo,
    NetworkOnChipConfiguration,
    PipelineUnitConfiguration,
    TilePowerMetrics,
    parse_buffer_position,
)
from .attributes import Attribute
from .utils.lookup import LookupTable
from .utils.ranges import expand_name_range, has_range

# Keys never forwarded as model attributes (src/yaml_common.cpp:30-36).
SKIP_KEYS = frozenset(
    {
        "soma_hw_name",
        "default_synapse_hw_name",
        "dendrite_hw_name",
        "log_spikes",
        "log_potential",
        "synapse",
        "dendrite",
        "soma",
    }
)


class DescriptionParsingError(ValueError):
    """Raised on malformed description files (yaml_common.cpp:39-53)."""


def parse_attribute(node: Any, name: str | None = None) -> Attribute:
    """Recursively parse a YAML value into an Attribute tree
    (src/yaml_common.cpp:141-230)."""
    if isinstance(node, dict):
        children = [parse_attribute(v, str(k)) for k, v in node.items()]
        return Attribute(children, name=name)
    if isinstance(node, (list, tuple)):
        children = [parse_attribute(v) for v in node]
        return Attribute(children, name=name)
    return Attribute(coerce_scalar(node), name=name)


def parse_model_attributes(node: Any) -> dict[str, Attribute]:
    """Parse an attributes node (map, or list of maps) skipping reserved keys
    (src/yaml_common.cpp:101-139)."""
    attributes: dict[str, Attribute] = {}
    if isinstance(node, list):
        for item in node:
            attributes.update(parse_model_attributes(item))
    elif isinstance(node, dict):
        for key, value in node.items():
            key = str(key)
            if key not in SKIP_KEYS:
                attributes[key] = parse_attribute(value, key)
    elif node is None:
        return attributes
    else:
        raise DescriptionParsingError(
            "Model attributes must be a map or list of maps"
        )
    return attributes


def _required(node: dict, key: str, context: str) -> Any:
    if not isinstance(node, dict) or key not in node:
        raise DescriptionParsingError(f"Missing required field {key!r} in {context}")
    return node[key]


def _as_float(value: Any, key: str) -> float:
    value = coerce_scalar(value)
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        raise DescriptionParsingError(f"Field {key!r} must be a number: {value!r}")
    return float(value)


def _as_int(value: Any, key: str) -> int:
    value = coerce_scalar(value)
    if isinstance(value, bool) or not isinstance(value, int):
        raise DescriptionParsingError(f"Field {key!r} must be an integer: {value!r}")
    return value


def _as_bool(value: Any, key: str) -> bool:
    value = coerce_scalar(value)
    if isinstance(value, bool):
        return value
    if isinstance(value, int):
        return value != 0
    raise DescriptionParsingError(f"Field {key!r} must be a bool: {value!r}")


def _as_list(node: Any) -> list:
    return node if isinstance(node, list) else [node]


def parse_noc_configuration(attrs: dict) -> NetworkOnChipConfiguration:
    """Parse the architecture-level NoC attributes (src/yaml_arch.cpp:425-510)."""
    noc = NetworkOnChipConfiguration()
    noc.width_in_tiles = _as_int(
        _required(attrs, "width", "architecture attributes"), "width"
    )
    noc.height_in_tiles = _as_int(
        _required(attrs, "height", "architecture attributes"), "height"
    )
    noc.link_buffer_size = _as_int(
        _required(attrs, "link_buffer_size", "architecture attributes"),
        "link_buffer_size",
    )
    sync_model = attrs.get("sync_model", "fixed")
    table = LookupTable()
    if sync_model == "fixed":
        delay = attrs.get("latency_sync", 0.0)
        table.set(0, _as_float(delay, "latency_sync"))
    elif sync_model == "table":
        if "latency_sync" not in attrs:
            raise DescriptionParsingError(
                "Attribute 'latency_sync' required when 'table' "
                "synchronization model is chosen."
            )
        delay_node = attrs["latency_sync"]
        if isinstance(delay_node, list):
            for idx, value in enumerate(delay_node):
                table.set(idx, _as_float(value, "latency_sync"))
        elif isinstance(delay_node, dict):
            for key, value in delay_node.items():
                table.set(_as_int(key, "latency_sync key"), _as_float(value, "latency_sync"))
        else:
            table.set(0, _as_float(delay_node, "latency_sync"))
    else:
        raise DescriptionParsingError(f"Unknown sync_model: {sync_model}")
    noc.ts_sync_delay_table = table
    return noc


def parse_tile_metrics(attrs: dict) -> TilePowerMetrics:
    metrics = TilePowerMetrics()
    for key in (
        "energy_north_hop",
        "latency_north_hop",
        "energy_east_hop",
        "latency_east_hop",
        "energy_south_hop",
        "latency_south_hop",
        "energy_west_hop",
        "latency_west_hop",
    ):
        setattr(metrics, key, _as_float(_required(attrs, key, "tile attributes"), key))
    if "log_energy" in attrs:
        metrics.log_energy = _as_bool(attrs["log_energy"], "log_energy")
    return metrics


def parse_core_pipeline(attrs: dict) -> CorePipelineConfiguration:
    config = CorePipelineConfiguration()
    buffer_inside_unit = _as_bool(
        attrs.get("buffer_inside_unit", False), "buffer_inside_unit"
    )
    config.buffer_position = parse_buffer_position(
        str(_required(attrs, "buffer_position", "core attributes")),
        buffer_inside_unit,
    )
    config.max_neurons_supported = _as_int(
        _required(attrs, "max_neurons_supported", "core attributes"),
        "max_neurons_supported",
    )
    if "log_energy" in attrs:
        config.log_energy = _as_bool(attrs["log_energy"], "log_energy")
    return config


def parse_unit_model_info(attrs: dict) -> ModelInfo:
    """Parse a pipeline unit's model selection + flags
    (src/yaml_arch.cpp:98-147)."""
    info = ModelInfo()
    info.name = str(_required(attrs, "model", "unit attributes"))
    if "log_energy" in attrs:
        info.log_energy = _as_bool(attrs["log_energy"], "log_energy")
    if "log_latency" in attrs:
        info.log_latency = _as_bool(attrs["log_latency"], "log_latency")
    if "update_every_timestep" in attrs:
        info.update_every_timestep = _as_bool(
            attrs["update_every_timestep"], "update_every_timestep"
        )
    if "plugin" in attrs:
        plugin = attrs["plugin"]
        if not isinstance(plugin, str):
            raise DescriptionParsingError("Expected plugin path to be string")
        info.plugin_library_path = plugin
    info.model_attributes = parse_model_attributes(attrs)
    return info


def _merge_or_create_unit(
    core: CoreConfiguration,
    unit_index: dict[str, PipelineUnitConfiguration],
    name: str,
    info: ModelInfo,
    section: str,
) -> None:
    """Merge same-named units across sections into multi-function units
    (src/yaml_arch.cpp:149-186)."""
    unit = unit_index.get(name)
    if unit is not None:
        _set_implements_flag(unit, section)
        # merge: keep existing entries, add new ones (std::map::merge)
        for key, value in info.model_attributes.items():
            unit.model_info.model_attributes.setdefault(key, value)
        if info.plugin_library_path is not None:
            unit.model_info.plugin_library_path = info.plugin_library_path
        return
    unit = core.create_hardware_unit(name, info)
    unit_index[name] = unit
    _set_implements_flag(unit, section)


def _set_implements_flag(unit: PipelineUnitConfiguration, section: str) -> None:
    if section == "synapse":
        unit.implements_synapse = True
    elif section == "dendrite":
        unit.implements_dendrite = True
    elif section == "soma":
        unit.implements_soma = True
    else:
        raise DescriptionParsingError(f"Section not recognized: {section}")


def _parse_core(
    core_node: dict,
    parent_tile_id: int,
    arch: Architecture,
    core_name: str,
    template_cache: dict | None = None,
) -> None:
    # A range-expanded core section (name: core[0..N]) describes THOUSANDS
    # of identical cores on large chips (loihi_large: 4096 cores x 1030
    # units each). Parse the section once and share the resulting
    # unit-configuration objects across all its cores — they are read-only
    # after parsing (the compiler builds its own per-core HardwareUnit
    # objects from them).
    if template_cache is not None:
        template = template_cache.get(id(core_node))
        if template is not None:
            core = arch.create_core(
                core_name, parent_tile_id, template.pipeline
            )
            core.axon_in = template.axon_in
            core.pipeline_hw = template.pipeline_hw
            core.axon_out = template.axon_out
            return
    pipeline_config = parse_core_pipeline(
        _required(core_node, "attributes", f"core {core_name}")
    )
    core = arch.create_core(core_name, parent_tile_id, pipeline_config)
    unit_index: dict[str, PipelineUnitConfiguration] = {}

    for section in ("axon_in", "synapse", "dendrite", "soma", "axon_out"):
        if section not in core_node:
            raise DescriptionParsingError(f"No {section} section defined")
        for unit_node in _as_list(core_node[section]):
            unit_name_spec = str(_required(unit_node, "name", f"{section} unit"))
            attrs = unit_node.get("attributes") or {}
            if isinstance(attrs, list):
                flat: dict = {}
                for item in attrs:
                    flat.update(item or {})
                attrs = flat
            names = (
                expand_name_range(unit_name_spec)
                if has_range(unit_name_spec)
                else [unit_name_spec]
            )
            if section == "axon_in":
                metrics_in = AxonInPowerMetrics(
                    energy_message_in=_as_float(
                        _required(attrs, "energy_message_in", "axon_in"),
                        "energy_message_in",
                    ),
                    latency_message_in=_as_float(
                        _required(attrs, "latency_message_in", "axon_in"),
                        "latency_message_in",
                    ),
                )
                for unit_name in names:
                    core.create_axon_in(unit_name, metrics_in)
            elif section == "axon_out":
                metrics_out = AxonOutPowerMetrics(
                    energy_message_out=_as_float(
                        _required(attrs, "energy_message_out", "axon_out"),
                        "energy_message_out",
                    ),
                    latency_message_out=_as_float(
                        _required(attrs, "latency_message_out", "axon_out"),
                        "latency_message_out",
                    ),
                )
                for unit_name in names:
                    core.create_axon_out(unit_name, metrics_out)
            else:
                # Parse once; give each expanded unit its own ModelInfo with a
                # shallow-copied attribute map (attributes themselves are
                # treated as immutable after parsing).
                template = parse_unit_model_info(attrs)
                for unit_name in names:
                    info = ModelInfo(
                        name=template.name,
                        model_attributes=dict(template.model_attributes),
                        plugin_library_path=template.plugin_library_path,
                        log_energy=template.log_energy,
                        log_latency=template.log_latency,
                        update_every_timestep=template.update_every_timestep,
                    )
                    _merge_or_create_unit(core, unit_index, unit_name, info, section)

    if template_cache is not None:
        template_cache[id(core_node)] = core


def _parse_tile(
    tile_node: dict, arch: Architecture, template_cache: dict | None = None
) -> None:
    tile_name_spec = str(_required(tile_node, "name", "tile"))
    base = tile_name_spec.split("[")[0]
    if has_range(tile_name_spec):
        from .utils.ranges import parse_range

        first, last = parse_range(tile_name_spec)
    else:
        first, last = 0, 0
    metrics_attrs = _required(tile_node, "attributes", f"tile {tile_name_spec}")
    if "core" not in tile_node:
        raise DescriptionParsingError("No core section defined")
    for t in range(first, last + 1):
        tile = arch.create_tile(f"{base}[{t}]", parse_tile_metrics(metrics_attrs))
        for core_node in _as_list(tile_node["core"]):
            core_name_spec = str(_required(core_node, "name", "core"))
            core_base = core_name_spec.split("[")[0]
            if has_range(core_name_spec):
                from .utils.ranges import parse_range

                c_first, c_last = parse_range(core_name_spec)
            else:
                c_first, c_last = 0, 0
            for c in range(c_first, c_last + 1):
                _parse_core(
                    core_node, tile.id, arch, f"{core_base}[{c}]",
                    template_cache,
                )


def parse_arch_section(arch_node: dict) -> Architecture:
    name = str(_required(arch_node, "name", "architecture"))
    if "[" in name:
        raise DescriptionParsingError("Multiple architectures not supported")
    noc = parse_noc_configuration(
        _required(arch_node, "attributes", "architecture")
    )
    arch = Architecture(name, noc)
    if "tile" not in arch_node:
        raise DescriptionParsingError("No tile section defined")
    template_cache: dict = {}
    for tile_node in _as_list(arch_node["tile"]):
        _parse_tile(tile_node, arch, template_cache)
    return arch


def parse_arch_file(stream: IO[str] | str) -> Architecture:
    doc = raw_load(stream)
    if not isinstance(doc, dict) or "architecture" not in doc:
        raise DescriptionParsingError("No architecture section defined")
    return parse_arch_section(doc["architecture"])
