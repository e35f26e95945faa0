"""Bundled example loaders (reference sanafe/_examples.py).

The reference package ships copies of its YAML fixtures; here the example
architecture and SNN are constructed programmatically through the builder
API (the YAML front-ends remain the primary interface for user files).
When a SANA-FE checkout is available its fixture files can be loaded
directly with ``load_arch`` / ``load_net``.
"""

from __future__ import annotations

from .arch import (
    Architecture,
    AxonInPowerMetrics,
    AxonOutPowerMetrics,
    CorePipelineConfiguration,
    ModelInfo,
    NetworkOnChipConfiguration,
    TilePowerMetrics,
)
from .attributes import Attribute
from .network import NeuronConfiguration, SpikingNetwork


def _demo_arch(
    tiles_x: int = 2,
    tiles_y: int = 1,
    cores_per_tile: int = 4,
    max_neurons: int = 1024,
    name: str = "demo",
) -> Architecture:
    noc = NetworkOnChipConfiguration(
        width_in_tiles=tiles_x, height_in_tiles=tiles_y, link_buffer_size=16
    )
    arch = Architecture(name, noc)
    for t in range(tiles_x * tiles_y):
        tile = arch.create_tile(
            f"tile{t}",
            TilePowerMetrics(
                energy_north_hop=2e-12, latency_north_hop=2e-9,
                energy_east_hop=2e-12, latency_east_hop=2e-9,
                energy_south_hop=2e-12, latency_south_hop=2e-9,
                energy_west_hop=2e-12, latency_west_hop=2e-9,
            ),
        )
        for c in range(cores_per_tile):
            core = arch.create_core(
                f"core{c}",
                tile.id,
                CorePipelineConfiguration(max_neurons_supported=max_neurons),
            )
            core.create_axon_in("axon_in", AxonInPowerMetrics(10e-12, 1e-9))
            synapse = core.create_hardware_unit(
                "demo_synapse",
                ModelInfo(
                    "current_based",
                    {
                        "energy_process_spike": Attribute(20e-12),
                        "latency_process_spike": Attribute(3e-9),
                    },
                ),
            )
            synapse.implements_synapse = True
            dendrite = core.create_hardware_unit(
                "demo_dendrite", ModelInfo("accumulator")
            )
            dendrite.implements_dendrite = True
            soma = core.create_hardware_unit(
                "demo_soma",
                ModelInfo(
                    "leaky_integrate_fire",
                    {
                        "energy_access_neuron": Attribute(10e-12),
                        "latency_access_neuron": Attribute(2e-9),
                        "energy_update_neuron": Attribute(20e-12),
                        "latency_update_neuron": Attribute(5e-9),
                        "energy_spike_out": Attribute(30e-12),
                        "latency_spike_out": Attribute(10e-9),
                    },
                ),
            )
            soma.implements_soma = True
            input_unit = core.create_hardware_unit(
                "demo_inputs", ModelInfo("input")
            )
            input_unit.implements_soma = True
            core.create_axon_out(
                "axon_out", AxonOutPowerMetrics(10e-12, 5e-9)
            )
    return arch


def load_example():
    """A small demo architecture + three-layer SNN, ready to simulate."""
    arch = _demo_arch()
    net = SpikingNetwork("example")
    inputs = net.create_neuron_group(
        "in",
        2,
        NeuronConfiguration(
            model_attributes={
                "spikes": Attribute([True, False, True, False] * 4)
            },
            soma_hw_name="demo_inputs",
            log_spikes=True,
        ),
    )
    hidden = net.create_neuron_group(
        "hidden",
        4,
        NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(2.0),
                "leak_decay": Attribute(0.9),
            },
            log_spikes=True,
            log_potential=True,
        ),
    )
    out = net.create_neuron_group(
        "out",
        1,
        NeuronConfiguration(
            model_attributes={"threshold": Attribute(1.5)},
            log_spikes=True,
            log_potential=True,
        ),
    )
    weights_ih = [1.2, -0.4, 0.8, 1.0, 0.6, 1.1, -0.2, 0.9]
    inputs.connect_neurons_dense(hidden, {"weight": weights_ih})
    weights_ho = [0.7, 0.5, 0.9, 0.4]
    hidden.connect_neurons_dense(out, {"weight": weights_ho})
    cores = arch.cores()
    for neuron in inputs:
        neuron.map_to_core(cores[0])
    for i, neuron in enumerate(hidden):
        neuron.map_to_core(cores[1 + (i % 2)])
    out[0].map_to_core(cores[4])
    return arch, net


def load_loihi() -> Architecture:
    """A Loihi-scale architecture: 32 tiles x 4 cores, 1024 neurons/core
    on an 8x4 mesh (scale per arch/loihi.yaml:6-33)."""
    return _demo_arch(
        tiles_x=8, tiles_y=4, cores_per_tile=4, max_neurons=1024,
        name="loihi_like",
    )


def load_truenorth() -> Architecture:
    """A TrueNorth-scale architecture: 4096 single-core tiles with 4096
    neurons per core (scale per arch/truenorth.yaml)."""
    noc = NetworkOnChipConfiguration(
        width_in_tiles=64, height_in_tiles=64, link_buffer_size=4
    )
    arch = Architecture("truenorth_like", noc)
    for t in range(4096):
        tile = arch.create_tile(f"tile{t}", TilePowerMetrics())
        core = arch.create_core(
            "core0",
            tile.id,
            CorePipelineConfiguration(max_neurons_supported=4096),
        )
        core.create_axon_in("axon_in", AxonInPowerMetrics())
        synapse = core.create_hardware_unit(
            "synapse", ModelInfo("current_based")
        )
        synapse.implements_synapse = True
        dendrite = core.create_hardware_unit(
            "dendrite", ModelInfo("accumulator")
        )
        dendrite.implements_dendrite = True
        soma = core.create_hardware_unit("soma", ModelInfo("truenorth"))
        soma.implements_soma = True
        core.create_axon_out("axon_out", AxonOutPowerMetrics())
    return arch

def examples_dir():
    """Path to the packaged example data (dvs_challenge.npz, tutorial
    YAML descriptions) — reference analog: the sanafe/examples package
    data directory."""
    from pathlib import Path

    return Path(__file__).resolve().parent / "examples"
