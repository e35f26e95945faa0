"""Abstract architecture description (host side).

Mirrors the reference's ``Architecture`` / ``TileConfiguration`` /
``CoreConfiguration`` hierarchy (``src/arch.hpp``, ``src/arch.cpp``): a pure
host-side specification of the simulated neuromorphic chip. Nothing here
touches JAX; the compiler (``compile.py``) lowers an Architecture plus a
mapped SNN into dense device arrays.

Builder API parity: ``create_tile`` / ``create_core`` /
``create_axon_in`` / ``create_hardware_unit`` / ``create_axon_out``
(``src/arch.cpp:90-180``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from pathlib import Path

from .attributes import Attribute
from .utils.lookup import LookupTable


class BufferPosition(IntEnum):
    """Where the per-timestep pipeline buffer sits (src/arch.hpp:41-49)."""

    BEFORE_DENDRITE = 0
    INSIDE_DENDRITE = 1
    BEFORE_SOMA = 2
    INSIDE_SOMA = 3
    BEFORE_AXON_OUT = 4


def parse_buffer_position(text: str, buffer_inside_unit: bool) -> BufferPosition:
    """Parse the core ``buffer_position`` attribute (src/pipeline.cpp:268-310)."""
    if text == "dendrite":
        return (
            BufferPosition.INSIDE_DENDRITE
            if buffer_inside_unit
            else BufferPosition.BEFORE_DENDRITE
        )
    if text == "soma":
        return (
            BufferPosition.INSIDE_SOMA
            if buffer_inside_unit
            else BufferPosition.BEFORE_SOMA
        )
    if text == "axon_out":
        return BufferPosition.BEFORE_AXON_OUT
    raise ValueError(f"Buffer position not supported: {text!r}")


class NeuronResetMode(IntEnum):
    """Soma reset behaviors (src/arch.hpp:61-68)."""

    NONE = 0
    SOFT = 1
    HARD = 2
    SATURATE = 3


def parse_reset_mode(text: str) -> NeuronResetMode:
    """Parse a reset-mode string (src/models.cpp:905-931)."""
    table = {
        "none": NeuronResetMode.NONE,
        "soft": NeuronResetMode.SOFT,
        "hard": NeuronResetMode.HARD,
        "saturate": NeuronResetMode.SATURATE,
    }
    if text not in table:
        raise ValueError(f"Reset mode not recognized: {text!r}")
    return table[text]


@dataclass
class TilePowerMetrics:
    """Per-direction NoC hop costs (src/arch.hpp:106-130)."""

    energy_north_hop: float = 0.0
    latency_north_hop: float = 0.0
    energy_east_hop: float = 0.0
    latency_east_hop: float = 0.0
    energy_south_hop: float = 0.0
    latency_south_hop: float = 0.0
    energy_west_hop: float = 0.0
    latency_west_hop: float = 0.0
    log_energy: bool = False


@dataclass
class AxonInPowerMetrics:
    energy_message_in: float = 0.0
    latency_message_in: float = 0.0


@dataclass
class AxonOutPowerMetrics:
    energy_message_out: float = 0.0
    latency_message_out: float = 0.0


@dataclass
class CorePipelineConfiguration:
    buffer_position: BufferPosition = BufferPosition.BEFORE_SOMA
    max_neurons_supported: int = 1024
    log_energy: bool = False


@dataclass
class ModelInfo:
    """Hardware-unit model selection + defaults (src/arch.hpp:51-59)."""

    name: str = ""  # model name, e.g. "leaky_integrate_fire"
    model_attributes: dict[str, Attribute] = field(default_factory=dict)
    plugin_library_path: str | None = None
    log_energy: bool = False
    log_latency: bool = False
    update_every_timestep: bool = False


@dataclass(slots=True)
class PipelineUnitConfiguration:
    """A named synapse/dendrite/soma unit within a core (src/arch.hpp)."""

    name: str
    model_info: ModelInfo
    implements_synapse: bool = False
    implements_dendrite: bool = False
    implements_soma: bool = False


@dataclass(slots=True)
class AxonInConfiguration:
    name: str
    metrics: AxonInPowerMetrics


@dataclass(slots=True)
class AxonOutConfiguration:
    name: str
    metrics: AxonOutPowerMetrics


@dataclass
class CoreAddress:
    parent_tile_id: int
    offset_within_tile: int
    id: int  # global core id


@dataclass
class CoreConfiguration:
    name: str
    address: CoreAddress
    pipeline: CorePipelineConfiguration
    axon_in: list[AxonInConfiguration] = field(default_factory=list)
    pipeline_hw: list[PipelineUnitConfiguration] = field(default_factory=list)
    axon_out: list[AxonOutConfiguration] = field(default_factory=list)

    def create_axon_in(
        self, name: str, metrics: AxonInPowerMetrics
    ) -> AxonInConfiguration:
        axon = AxonInConfiguration(name, metrics)
        self.axon_in.append(axon)
        return axon

    def create_hardware_unit(
        self, name: str, model_info: ModelInfo
    ) -> PipelineUnitConfiguration:
        unit = PipelineUnitConfiguration(name, model_info)
        self.pipeline_hw.append(unit)
        return unit

    def create_axon_out(
        self, name: str, metrics: AxonOutPowerMetrics
    ) -> AxonOutConfiguration:
        axon = AxonOutConfiguration(name, metrics)
        self.axon_out.append(axon)
        return axon


@dataclass
class TileConfiguration:
    name: str
    id: int
    power_metrics: TilePowerMetrics
    cores: list[CoreConfiguration] = field(default_factory=list)
    x: int = 0
    y: int = 0


@dataclass
class NetworkOnChipConfiguration:
    width_in_tiles: int = 1
    height_in_tiles: int = 1
    link_buffer_size: int = 0
    ts_sync_delay_table: LookupTable = field(default_factory=LookupTable)
    timestep_delay: float = 0.0


class Architecture:
    """Top-level chip description (src/arch.hpp:70-103)."""

    def __init__(self, name: str, noc: NetworkOnChipConfiguration | None = None):
        noc = noc or NetworkOnChipConfiguration()
        self.name = name
        self.tiles: list[TileConfiguration] = []
        self.core_count = 0
        self.max_cores_per_tile = 0
        self.noc_width_in_tiles = noc.width_in_tiles
        self.noc_height_in_tiles = noc.height_in_tiles
        self.noc_buffer_size = noc.link_buffer_size
        self.ts_sync_delay_table = noc.ts_sync_delay_table
        self.timestep_delay = noc.timestep_delay

    def _tile_coordinates(self, tile_id: int) -> tuple[int, int]:
        # Consecutive tile IDs stack vertically before moving to the next
        # column (src/arch.cpp:78-88).
        x = tile_id // self.noc_height_in_tiles
        y = tile_id % self.noc_height_in_tiles
        if x >= self.noc_width_in_tiles:
            raise ValueError(
                f"Tile id {tile_id} does not fit the "
                f"{self.noc_width_in_tiles}x{self.noc_height_in_tiles} NoC"
            )
        return x, y

    def create_tile(
        self, name: str, power_metrics: TilePowerMetrics | None = None
    ) -> TileConfiguration:
        tile_id = len(self.tiles)
        tile = TileConfiguration(name, tile_id, power_metrics or TilePowerMetrics())
        tile.x, tile.y = self._tile_coordinates(tile_id)
        self.tiles.append(tile)
        return tile

    def create_core(
        self,
        name: str,
        parent_tile_id: int,
        pipeline_config: CorePipelineConfiguration | None = None,
    ) -> CoreConfiguration:
        if parent_tile_id >= len(self.tiles):
            raise ValueError(f"Tile ID ({parent_tile_id}) out of range")
        tile = self.tiles[parent_tile_id]
        offset = len(tile.cores)
        core_id = self.core_count
        self.core_count += 1
        core = CoreConfiguration(
            name,
            CoreAddress(parent_tile_id, offset, core_id),
            pipeline_config or CorePipelineConfiguration(),
        )
        tile.cores.append(core)
        self.max_cores_per_tile = max(self.max_cores_per_tile, offset + 1)
        return core

    def cores(self) -> list[CoreConfiguration]:
        out: list[CoreConfiguration] = []
        for tile in self.tiles:
            out.extend(tile.cores)
        return out

    def info(self) -> str:
        return (
            f"Architecture(name={self.name}, tiles={len(self.tiles)}, "
            f"cores={self.core_count})"
        )


def load_arch(path: str | Path) -> Architecture:
    """Load a YAML architecture description (src/arch.cpp:106-117)."""
    from .yaml_arch import parse_arch_file

    path = Path(path)
    with path.open("r") as stream:
        return parse_arch_file(stream)
