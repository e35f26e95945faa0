"""Tutorial exercise checkers (reference ``sanafe/tutorial.py``).

Helpers for the SANA-FE tutorial notebooks: validate architecture and SNN
description files a student edits during the exercises. File paths default
to the working directory (``arch.yaml`` / ``snn.yaml``), matching the
tutorial layout.
"""

from __future__ import annotations

from pathlib import Path

from .arch import load_arch
from .network import load_net


ARCH_FILENAME = "arch.yaml"
SNN_FILENAME = "snn.yaml"


def load(arch_path: str | Path = ARCH_FILENAME,
         snn_path: str | Path = SNN_FILENAME):
    """Load the tutorial architecture + SNN pair."""
    arch = load_arch(arch_path)
    net = load_net(snn_path, arch)
    return arch, net


def check_arch(arch_path: str | Path = ARCH_FILENAME):
    """Parse the architecture file and report its shape."""
    arch = load_arch(arch_path)
    tiles = len(arch.tiles)
    cores = arch.core_count
    print(f"Architecture '{arch.name}': {tiles} tiles, {cores} cores")
    return arch


def check_arch_exercise_1(arch_path: str | Path = ARCH_FILENAME) -> bool:
    """Exercise 1: the architecture should define more than one tile."""
    arch = load_arch(arch_path)
    ok = len(arch.tiles) > 1
    print("PASS" if ok else "FAIL: define at least two tiles")
    return ok


def check_arch_exercise_2(arch_path: str | Path = ARCH_FILENAME) -> bool:
    """Exercise 2: every core needs all five pipeline sections."""
    arch = load_arch(arch_path)
    for core in arch.cores():
        has_synapse = any(
            u.implements_synapse for u in core.pipeline_hw
        )
        has_soma = any(u.implements_soma for u in core.pipeline_hw)
        if not (core.axon_in and core.axon_out and has_synapse and has_soma):
            print(f"FAIL: core {core.name} is missing pipeline units")
            return False
    print("PASS")
    return True


def check_snn(arch_path: str | Path = ARCH_FILENAME,
              snn_path: str | Path = SNN_FILENAME):
    """Parse the SNN file and report its shape."""
    arch = load_arch(arch_path)
    net = load_net(snn_path, arch)
    groups = {name: len(group.neurons) for name, group in net.groups.items()}
    edges = sum(
        len(neuron.edges_out)
        for group in net.groups.values()
        for neuron in group.neurons
    ) + sum(
        len(bulk)
        for group in net.groups.values()
        for bulk in group.bulk_edges
    )
    mapped = sum(
        1
        for group in net.groups.values()
        for neuron in group.neurons
        if neuron.core_address is not None
    )
    print(f"SNN: groups={groups}, edges={edges}, mapped={mapped}")
    return net


def check_exercise_snns_1(snn) -> bool:
    """Exercise: the network should contain at least two groups."""
    ok = len(snn.groups) >= 2
    print("PASS" if ok else "FAIL: create at least two neuron groups")
    return ok


def check_exercise_snns_2(snn) -> bool:
    """Exercise: every neuron must be mapped to a core."""
    unmapped = [
        f"{group.name}.{neuron.offset}"
        for group in snn.groups.values()
        for neuron in group.neurons
        if neuron.core_address is None
    ]
    if unmapped:
        print(f"FAIL: unmapped neurons: {unmapped[:5]}")
        return False
    print("PASS")
    return True


def check_exercise_api_1(snn) -> bool:
    """Exercise: the network should contain at least one edge."""
    edges = sum(
        len(neuron.edges_out)
        for group in snn.groups.values()
        for neuron in group.neurons
    )
    ok = edges >= 1
    print("PASS" if ok else "FAIL: connect at least two neurons")
    return ok

def get_dvs_data():
    """Binary stream of the packaged DVS-gesture weights
    (reference sanafe/tutorial.py:43-45)."""
    from ._examples import examples_dir

    return (examples_dir() / "dvs_challenge.npz").open("rb")

