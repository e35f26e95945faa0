"""Spec-layer tests: ranges, lookup tables, YAML arch + SNN parsing.

Parser cases mirror the reference's GoogleTest suites
(``tests/unit/test_yaml_arch.cpp``, ``tests/unit/test_yaml_snn.cpp``,
``tests/unit/test_connect_neurons_sparse.cpp``) — same inputs and expected
structured outputs, re-expressed in pytest.
"""

import io

import pytest

from sanafe_tpu.arch import BufferPosition, load_arch, parse_buffer_position
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.network import (
    Conv2DParameters,
    NeuronConfiguration,
    SpikingNetwork,
    load_net,
)
from sanafe_tpu.utils.lookup import LookupTable
from sanafe_tpu.utils.ranges import expand_name_range, parse_range
from sanafe_tpu.yaml_arch import (
    DescriptionParsingError,
    parse_arch_file,
)
from sanafe_tpu.yaml_snn import parse_network_file


MINIMAL_ARCH = """
architecture:
  name: test_arch
  attributes: {width: 2, height: 1, link_buffer_size: 4}
  tile:
    - name: tile[0..1]
      attributes:
        energy_north_hop: 1.0e-12
        latency_north_hop: 1.0e-9
        energy_east_hop: 1.0e-12
        latency_east_hop: 1.0e-9
        energy_south_hop: 1.0e-12
        latency_south_hop: 1.0e-9
        energy_west_hop: 1.0e-12
        latency_west_hop: 1.0e-9
      core:
        - name: core[0..1]
          attributes: {buffer_position: soma, max_neurons_supported: 16}
          axon_in:
            - name: in
              attributes: {energy_message_in: 1.0e-12, latency_message_in: 1.0e-9}
          synapse:
            - name: syn
              attributes:
                model: current_based
                energy_process_spike: 2.0e-12
                latency_process_spike: 2.0e-9
          dendrite:
            - name: dend
              attributes: {model: accumulator, energy_update: 0.0, latency_update: 0.0}
          soma:
            - name: soma
              attributes:
                model: leaky_integrate_fire
                energy_access_neuron: 1.0e-12
                latency_access_neuron: 1.0e-9
                energy_update_neuron: 2.0e-12
                latency_update_neuron: 2.0e-9
                energy_spike_out: 3.0e-12
                latency_spike_out: 3.0e-9
          axon_out:
            - name: out
              attributes: {energy_message_out: 4.0e-12, latency_message_out: 4.0e-9}
"""


def test_parse_range():
    assert parse_range("0..7") == (0, 7)
    assert parse_range("tile[2..5]") == (2, 5)
    assert expand_name_range("t[0..2]") == ["t[0]", "t[1]", "t[2]"]
    with pytest.raises(ValueError):
        parse_range("5..2")
    with pytest.raises(ValueError):
        parse_range("a..b")


def test_lookup_table():
    table = LookupTable({1: 0.6e-6, 2: 1.0e-6, 4: 1.4e-6, 29: 1.8e-6})
    assert table.get(0) == 0.0
    assert table.get(1) == 0.6e-6
    assert table.get(3) == 1.0e-6
    assert table.get(4) == 1.4e-6
    assert table.get(28) == 1.4e-6
    assert table.get(100) == 1.8e-6


def test_buffer_position_parsing():
    assert parse_buffer_position("dendrite", False) == BufferPosition.BEFORE_DENDRITE
    assert parse_buffer_position("dendrite", True) == BufferPosition.INSIDE_DENDRITE
    assert parse_buffer_position("soma", False) == BufferPosition.BEFORE_SOMA
    assert parse_buffer_position("soma", True) == BufferPosition.INSIDE_SOMA
    assert parse_buffer_position("axon_out", False) == BufferPosition.BEFORE_AXON_OUT
    with pytest.raises(ValueError):
        parse_buffer_position("bogus", False)


def test_parse_minimal_arch():
    arch = parse_arch_file(io.StringIO(MINIMAL_ARCH))
    assert arch.name == "test_arch"
    assert len(arch.tiles) == 2
    assert arch.core_count == 4
    assert arch.max_cores_per_tile == 2
    # Column-major tile coordinates (height=1 so x==tile_id)
    assert (arch.tiles[1].x, arch.tiles[1].y) == (1, 0)
    core = arch.tiles[0].cores[0]
    assert core.name == "core[0]"
    assert core.pipeline.buffer_position == BufferPosition.BEFORE_SOMA
    assert core.pipeline.max_neurons_supported == 16
    assert len(core.pipeline_hw) == 3
    soma = [u for u in core.pipeline_hw if u.name == "soma"][0]
    assert soma.implements_soma and not soma.implements_synapse
    assert soma.model_info.name == "leaky_integrate_fire"
    # Exponent-format floats without dots must parse as numbers
    assert soma.model_info.model_attributes["energy_access_neuron"].as_float() == (
        1.0e-12
    )


def test_arch_missing_section_raises():
    bad = MINIMAL_ARCH.replace("axon_out:", "axon_out_typo:")
    with pytest.raises(DescriptionParsingError):
        parse_arch_file(io.StringIO(bad))


def test_multifunction_unit_merging():
    """Same-named unit in dendrite+soma sections merges into one unit
    (src/yaml_arch.cpp:149-186)."""
    merged = MINIMAL_ARCH.replace("- name: dend", "- name: combo").replace(
        "- name: soma", "- name: combo"
    )
    arch = parse_arch_file(io.StringIO(merged))
    core = arch.tiles[0].cores[0]
    combos = [u for u in core.pipeline_hw if u.name == "combo"]
    assert len(combos) == 1
    assert combos[0].implements_dendrite and combos[0].implements_soma


def test_all_reference_arch_files_parse(arch_dir):
    for name in (
        "example_chip.yaml",
        "loihi.yaml",
        "loihi_with_noise.yaml",
        "truenorth.yaml",
        "demo_with_dendrites.yaml",
        "neurofem.yaml",
    ):
        arch = load_arch(arch_dir / name)
        assert arch.core_count > 0


def test_loihi_large_parses_fast(arch_dir):
    """loihi_large expands to 4096 cores x ~1030 units; shared parse
    templates (yaml_arch._parse_core) keep this in fractions of a second
    (it took ~48 s with per-core re-expansion)."""
    import time

    start = time.perf_counter()
    arch = load_arch(arch_dir / "loihi_large.yaml")
    elapsed = time.perf_counter() - start
    assert arch.core_count == 4096
    assert len(arch.tiles) == 1024
    assert elapsed < 10.0


def test_example_chip_counts(arch_dir):
    arch = load_arch(arch_dir / "example_chip.yaml")
    assert len(arch.tiles) == 2
    assert arch.core_count == 8
    assert arch.noc_width_in_tiles == 2
    assert arch.noc_height_in_tiles == 1
    assert arch.noc_buffer_size == 4
    core = arch.tiles[0].cores[0]
    # 1 synapse + 1 dendrite + 3 soma units
    assert len(core.pipeline_hw) == 5
    assert len(core.axon_in) == 1
    assert len(core.axon_out) == 1


def test_loihi_sync_table(arch_dir):
    arch = load_arch(arch_dir / "loihi.yaml")
    table = arch.ts_sync_delay_table
    assert table.get(1) == 0.6e-6
    assert table.get(3) == 1.0e-6
    assert table.get(32) == 1.8e-6


MINIMAL_SNN = """
network:
  name: test_net
  groups:
    - name: in
      attributes: [log_spikes: true]
      neurons:
        - 0: [log_spikes: false]
        - 1: [spikes: [1, 0, 1]]
    - name: out
      attributes: []
      neurons:
        - 0..1: [soma: {threshold: 2}, log_potential: true]
  edges:
    - out.1 -> out.1: [weight: -4]
    - in -> out: [type: dense, weight: [-1, 2, 1, 3]]
mappings:
  - in.0: [core: 0.0, soma: demo_input]
  - in.1: [core: 0.1, soma: demo_input]
  - out: [core: 0.0]
"""


def test_parse_minimal_snn(arch_dir):
    arch = load_arch(arch_dir / "example_chip.yaml")
    net = parse_network_file(io.StringIO(MINIMAL_SNN), arch)
    assert net.name == "test_net"
    assert set(net.groups) == {"in", "out"}
    in_group = net.groups["in"]
    assert len(in_group.neurons) == 2
    # Group default log_spikes=true, neuron 0 overrides to false
    assert in_group.neurons[0].log_spikes is False
    assert in_group.neurons[1].log_spikes is True
    # spike train attribute
    spikes = in_group.neurons[1].model_attributes["spikes"].as_bool_list()
    assert spikes == [True, False, True]
    out_group = net.groups["out"]
    # soma-scoped threshold forwards only to soma
    threshold = out_group.neurons[0].model_attributes["threshold"]
    assert threshold.forward_to_soma and not threshold.forward_to_synapse
    assert threshold.as_float() == 2.0
    assert out_group.neurons[0].log_potential is True
    # Self edge with negative weight
    self_edge = out_group.neurons[1].edges_out[0]
    assert self_edge.synapse_attributes["weight"].as_float() == -4.0
    # Dense hyperedge: weight indexed src*n_dest+dest
    e01 = net.groups["in"].neurons[0].edges_out
    assert [e.synapse_attributes["weight"].as_float() for e in e01] == [-1.0, 2.0]
    e23 = net.groups["in"].neurons[1].edges_out
    assert [e.synapse_attributes["weight"].as_float() for e in e23] == [1.0, 3.0]
    # Mappings: soma unit override + mapping order stamped
    assert net.groups["in"].neurons[0].soma_hw_name == "demo_input"
    assert net.groups["in"].neurons[0].core_address.id == 0
    assert net.groups["in"].neurons[1].core_address.id == 1
    orders = [n.mapping_order for n in net.groups["in"].neurons] + [
        n.mapping_order for n in net.groups["out"].neurons
    ]
    assert orders == [1, 2, 3, 4]


def test_sparse_attribute_indexing():
    """Sparse connect indexes attribute lists by edge position, not source id
    (tests/unit/test_connect_neurons_sparse.cpp:47-147)."""
    net = SpikingNetwork("t")
    a = net.create_neuron_group("a", 4, NeuronConfiguration())
    b = net.create_neuron_group("b", 4, NeuronConfiguration())
    pairs = [(3, 0), (1, 2), (0, 1)]
    weights = [Attribute(10.0), Attribute(20.0), Attribute(30.0)]
    a.connect_neurons_sparse(b, {"weight": weights}, pairs)
    assert a.neurons[3].edges_out[0].synapse_attributes["weight"].as_float() == 10.0
    assert a.neurons[1].edges_out[0].synapse_attributes["weight"].as_float() == 20.0
    assert a.neurons[0].edges_out[0].synapse_attributes["weight"].as_float() == 30.0


def test_sparse_length_mismatch_raises():
    net = SpikingNetwork("t")
    a = net.create_neuron_group("a", 2, NeuronConfiguration())
    b = net.create_neuron_group("b", 2, NeuronConfiguration())
    with pytest.raises(ValueError):
        a.connect_neurons_sparse(
            b, {"weight": [Attribute(1.0)]}, [(0, 0), (1, 1)]
        )


def test_conv2d_lowering_indices():
    """conv2d lowering: channels-first neuron indexing, [y][x][c_in][c_out]
    filter flattening (src/network.cpp:377-528)."""
    net = SpikingNetwork("t")
    src = net.create_neuron_group("src", 16, NeuronConfiguration())  # 4x4x1
    dst = net.create_neuron_group("dst", 9, NeuronConfiguration())  # 3x3x1
    conv = Conv2DParameters(
        input_width=4,
        input_height=4,
        input_channels=1,
        kernel_width=2,
        kernel_height=2,
        kernel_count=1,
        stride_width=1,
        stride_height=1,
    )
    weights = [Attribute(float(w)) for w in (0, 1, 2, 3)]
    src.connect_neurons_conv2d(dst, {"weight": weights}, conv)
    total_edges = sum(len(n.edges_out) for n in src.neurons)
    assert total_edges == 9 * 4
    # Source neuron 0 participates only in output (0,0) with filter index 0
    n0 = src.neurons[0]
    assert len(n0.edges_out) == 1
    assert n0.edges_out[0].post_neuron.neuron_offset == 0
    assert n0.edges_out[0].synapse_attributes["weight"].as_float() == 0.0
    # Source neuron 5 (y=1,x=1) hits all four outputs (0,0),(0,1),(1,0),(1,1)
    n5 = src.neurons[5]
    dests = sorted(e.post_neuron.neuron_offset for e in n5.edges_out)
    assert dests == [0, 1, 3, 4]
    # For output (0,0), neuron 5 is at filter position (y=1,x=1) -> weight 3
    w = {
        e.post_neuron.neuron_offset: e.synapse_attributes["weight"].as_float()
        for e in n5.edges_out
    }
    assert w[0] == 3.0  # y_f=1, x_f=1
    assert w[1] == 2.0  # y_f=1, x_f=0
    assert w[3] == 1.0  # y_f=0, x_f=1
    assert w[4] == 0.0  # y_f=0, x_f=0


def test_conv2d_size_validation():
    net = SpikingNetwork("t")
    src = net.create_neuron_group("src", 15, NeuronConfiguration())
    dst = net.create_neuron_group("dst", 9, NeuronConfiguration())
    conv = Conv2DParameters(
        input_width=4,
        input_height=4,
        input_channels=1,
        kernel_width=2,
        kernel_height=2,
    )
    with pytest.raises(ValueError):
        src.connect_neurons_conv2d(dst, {}, conv)


def test_network_roundtrip_save(tmp_path, arch_dir):
    arch = load_arch(arch_dir / "example_chip.yaml")
    net = parse_network_file(io.StringIO(MINIMAL_SNN), arch)
    out = tmp_path / "saved.yaml"
    net.save(out)
    arch2 = load_arch(arch_dir / "example_chip.yaml")
    net2 = load_net(out, arch2)
    assert set(net2.groups) == set(net.groups)
    for name, group in net.groups.items():
        group2 = net2.groups[name]
        assert len(group2.neurons) == len(group.neurons)
        for n1, n2 in zip(group.neurons, group2.neurons):
            assert n1.log_spikes == n2.log_spikes
            assert len(n1.edges_out) == len(n2.edges_out)
            assert n1.core_address.id == n2.core_address.id
