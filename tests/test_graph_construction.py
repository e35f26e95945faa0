"""Graph-construction regression tests, ported from the reference's
GoogleTest suite (tests/unit/test_connect_neurons_sparse.cpp,
tests/unit/test_yaml_snn.cpp error cases)."""

import io

import pytest

import sanafe_tpu as sf
from sanafe_tpu.yaml_arch import DescriptionParsingError
from sanafe_tpu.yaml_snn import parse_network_file


def _weight(edge) -> float:
    return edge.synapse_attributes["weight"].as_float()


def test_sparse_attributes_indexed_by_edge_position_not_source_id():
    """Regression: edge 0 is src[2]->dst[0] and must get value_list[0]
    (tests/unit/test_connect_neurons_sparse.cpp:47-84)."""
    net = sf.Network()
    src = net.create_neuron_group("src", 3)
    dst = net.create_neuron_group("dst", 3)
    pairs = [(2, 0), (0, 1), (1, 2)]
    src.connect_neurons_sparse(dst, {"weight": [10.0, 20.0, 30.0]}, pairs)
    assert len(src[2].edges_out) == 1
    assert len(src[0].edges_out) == 1
    assert len(src[1].edges_out) == 1
    assert _weight(src[2].edges_out[0]) == 10.0
    assert _weight(src[0].edges_out[0]) == 20.0
    assert _weight(src[1].edges_out[0]) == 30.0


def test_sparse_multiple_edges_from_same_source_distinct_attributes():
    net = sf.Network()
    src = net.create_neuron_group("src", 2)
    dst = net.create_neuron_group("dst", 3)
    pairs = [(0, 0), (0, 1), (1, 2)]
    src.connect_neurons_sparse(dst, {"weight": [1.0, 2.0, 3.0]}, pairs)
    assert [_weight(e) for e in src[0].edges_out] == [1.0, 2.0]
    assert _weight(src[1].edges_out[0]) == 3.0


def test_sparse_large_source_id_small_edge_count():
    net = sf.Network()
    src = net.create_neuron_group("src", 10)
    dst = net.create_neuron_group("dst", 10)
    pairs = [(5, 0), (7, 1)]
    src.connect_neurons_sparse(dst, {"weight": [100.0, 200.0]}, pairs)
    assert _weight(src[5].edges_out[0]) == 100.0
    assert _weight(src[7].edges_out[0]) == 200.0


def test_sparse_attribute_list_length_must_match_pairs():
    net = sf.Network()
    src = net.create_neuron_group("src", 3)
    dst = net.create_neuron_group("dst", 3)
    with pytest.raises(ValueError, match="attribute list"):
        src.connect_neurons_sparse(
            dst, {"weight": [1.0, 2.0]}, [(0, 0), (1, 1), (2, 2)]
        )


def test_conv2d_group_size_validation():
    """Group sizes strictly validated against conv dims
    (src/network.cpp:445-470)."""
    net = sf.Network()
    src = net.create_neuron_group("src", 16)  # 4x4x1
    bad_dst = net.create_neuron_group("bad", 5)
    with pytest.raises(ValueError, match="dest group"):
        src.connect_neurons_conv2d(
            bad_dst, {"weight": [0.5] * 4}, 4, 4, 1, 2, 2, 1
        )
    wrong_src = net.create_neuron_group("wrong_src", 15)
    dst = net.create_neuron_group("dst", 9)
    with pytest.raises(ValueError, match="source group"):
        wrong_src.connect_neurons_conv2d(
            dst, {"weight": [0.5] * 4}, 4, 4, 1, 2, 2, 1
        )


def test_conv2d_kernel_larger_than_input_rejected():
    net = sf.Network()
    src = net.create_neuron_group("src", 4)  # 2x2
    dst = net.create_neuron_group("dst", 1)
    with pytest.raises(ValueError, match="zero"):
        src.connect_neurons_conv2d(
            dst, {"weight": [0.5] * 9}, 2, 2, 1, 3, 3, 1
        )


@pytest.fixture(scope="module")
def example_arch():
    return sf.load_arch("/root/reference/arch/example_chip.yaml")


@pytest.mark.parametrize(
    "snippet,match",
    [
        ("{}", "network"),
        ("network: {name: n}", "group"),
        (
            "network:\n  name: n\n  groups:\n    - neurons: [0]\n"
            "  edges: []\nmappings: []",
            "name",
        ),
        (
            "network:\n  name: n\n  groups:\n    - name: a\n      "
            "neurons: [0]\n  edges:\n    - a.0 -> missing.0: {}\n"
            "mappings: []",
            "missing",
        ),
        (
            "network:\n  name: n\n  groups:\n    - name: a\n      "
            "neurons: [0]\n  edges: []\nmappings:\n"
            "  - a.0: {core: 99.0}",
            "tile",
        ),
    ],
)
def test_yaml_snn_error_cases(example_arch, snippet, match):
    """Structured parse errors, mirroring test_yaml_snn.cpp's error cases."""
    with pytest.raises((DescriptionParsingError, KeyError, ValueError)) as e:
        parse_network_file(io.StringIO(snippet), example_arch)
    assert match.lower() in str(e.value).lower()


ARCH_HEADER = """
architecture:
  name: a
  attributes: {topology: mesh, width: 1, height: 1, link_buffer_size: 1}
  tile:
    - name: t
      attributes: {energy_north_hop: 0, latency_north_hop: 0,
                   energy_east_hop: 0, latency_east_hop: 0,
                   energy_south_hop: 0, latency_south_hop: 0,
                   energy_west_hop: 0, latency_west_hop: 0}
      core:
        - name: c
          attributes: {buffer_position: soma, max_neurons_supported: 8}
"""


@pytest.mark.parametrize("missing", ["axon_in", "synapse", "dendrite",
                                     "soma", "axon_out"])
def test_yaml_arch_missing_core_section(missing):
    """All five pipeline sections are required (src/yaml_arch.cpp:246-293)."""
    from sanafe_tpu.yaml_arch import parse_arch_file

    sections = {
        "axon_in": ("          axon_in:\n            - name: ai\n"
                    "              attributes: {energy_message_in: 0, "
                    "latency_message_in: 0}\n"),
        "synapse": ("          synapse:\n            - name: sy\n"
                    "              attributes: {model: current_based}\n"),
        "dendrite": ("          dendrite:\n            - name: de\n"
                     "              attributes: {model: accumulator}\n"),
        "soma": ("          soma:\n            - name: so\n"
                 "              attributes: {model: leaky_integrate_fire}\n"),
        "axon_out": ("          axon_out:\n            - name: ao\n"
                     "              attributes: {energy_message_out: 0, "
                     "latency_message_out: 0}\n"),
    }
    text = ARCH_HEADER + "".join(
        body for name, body in sections.items() if name != missing
    )
    with pytest.raises(DescriptionParsingError, match=missing):
        parse_arch_file(io.StringIO(text))


def test_yaml_range_errors():
    from sanafe_tpu.utils.ranges import parse_range

    with pytest.raises(ValueError):
        parse_range("t[5..2]")
    with pytest.raises(ValueError):
        parse_range("t[..2]")
