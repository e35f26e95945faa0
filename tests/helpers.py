"""Test helpers: programmatic single-core chip construction."""

from __future__ import annotations

import sanafe_tpu as sf
from sanafe_tpu.arch import (
    AxonInPowerMetrics,
    AxonOutPowerMetrics,
    CorePipelineConfiguration,
    ModelInfo,
    NetworkOnChipConfiguration,
    TilePowerMetrics,
)
from sanafe_tpu.attributes import Attribute


def build_arch(
    soma_model: str = "leaky_integrate_fire",
    dendrite_model: str = "accumulator",
    synapse_model: str = "current_based",
    n_tiles: int = 1,
    cores_per_tile: int = 1,
    max_neurons: int = 64,
    soma_costs: dict | None = None,
    synapse_costs: dict | None = None,
    dendrite_attrs: dict | None = None,
    soma_attrs: dict | None = None,
) -> sf.Architecture:
    noc = NetworkOnChipConfiguration(
        width_in_tiles=max(n_tiles, 1), height_in_tiles=1, link_buffer_size=16
    )
    arch = sf.Architecture("test_chip", noc)
    soma_metrics = {
        "energy_access_neuron": Attribute(0.0),
        "latency_access_neuron": Attribute(0.0),
        "energy_update_neuron": Attribute(0.0),
        "latency_update_neuron": Attribute(0.0),
        "energy_spike_out": Attribute(0.0),
        "latency_spike_out": Attribute(0.0),
    }
    for key, value in (soma_costs or {}).items():
        soma_metrics[key] = Attribute(value)
    for key, value in (soma_attrs or {}).items():
        soma_metrics[key] = Attribute(value)
    syn_metrics = {
        "energy_process_spike": Attribute(0.0),
        "latency_process_spike": Attribute(0.0),
    }
    for key, value in (synapse_costs or {}).items():
        syn_metrics[key] = Attribute(value)
    den_metrics = {
        key: Attribute(value) for key, value in (dendrite_attrs or {}).items()
    }
    for t in range(n_tiles):
        tile = arch.create_tile(f"tile{t}", TilePowerMetrics())
        for c in range(cores_per_tile):
            core = arch.create_core(
                f"core{c}",
                tile.id,
                CorePipelineConfiguration(max_neurons_supported=max_neurons),
            )
            core.create_axon_in("axon_in", AxonInPowerMetrics(0.0, 0.0))
            syn = core.create_hardware_unit(
                "synapse", ModelInfo(synapse_model, dict(syn_metrics))
            )
            syn.implements_synapse = True
            den = core.create_hardware_unit(
                "dendrite", ModelInfo(dendrite_model, dict(den_metrics))
            )
            den.implements_dendrite = True
            soma = core.create_hardware_unit(
                "soma", ModelInfo(soma_model, dict(soma_metrics))
            )
            soma.implements_soma = True
            core.create_axon_out("axon_out", AxonOutPowerMetrics(0.0, 0.0))
    return arch


def single_neuron_chip(
    attrs: dict,
    soma_model: str = "leaky_integrate_fire",
    **arch_kwargs,
):
    """A chip with one neuron carrying ``attrs``; returns (chip, net)."""
    arch = build_arch(soma_model=soma_model, **arch_kwargs)
    net = sf.Network()
    group = net.create_neuron_group(
        "g",
        1,
        sf.NeuronConfiguration(
            model_attributes={k: Attribute(v) for k, v in attrs.items()},
            log_potential=True,
            log_spikes=True,
        ),
    )
    group[0].map_to_core(arch.cores()[0])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    return chip, net


def potentials_of(result) -> list[float]:
    return [row[0] for row in result["potential_trace"].data]


def spike_steps_of(result) -> list[int]:
    return [
        step + 1
        for step, fired in enumerate(result["spike_trace"].data)
        if fired
    ]


def cpu_subprocess_env(**overrides) -> dict:
    """Environment for CPU-only test subprocesses.

    Forces the CPU backend AND strips the accelerator-plugin trigger vars
    so the interpreter's sitecustomize never loads the device PJRT plugin
    in the child: the plugin's remote-connection threads can deadlock a
    child process when the parent test session is already busy (observed
    as a futex hang that blew the 900 s subprocess timeout), and a
    CPU-only check has no reason to carry them.
    """
    import os

    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_TPU_GEN",
                "PALLAS_AXON_REMOTE_COMPILE", "JAX_ENABLE_X64"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(overrides)
    return env
