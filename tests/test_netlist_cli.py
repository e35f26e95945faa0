"""Netlist front-end + CLI tests (reference: src/netlist.cpp, src/main.cpp)."""

import io
import subprocess
import sys
from pathlib import Path

import pytest

from helpers import cpu_subprocess_env

import sanafe_tpu as sf
from sanafe_tpu.netlist import parse_netlist_file, write_netlist
from sanafe_tpu.yaml_arch import DescriptionParsingError

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def example_arch():
    return sf.load_arch(REF / "arch" / "example_chip.yaml")


def test_parse_example_net(example_arch):
    net = sf.load_net(
        REF / "snn" / "example.net", example_arch, use_netlist_format=True
    )
    assert {g: len(net.groups[g].neurons) for g in net.groups} == {
        "0": 3,
        "1": 3,
    }
    n00 = net.groups["0"].neurons[0]
    assert n00.model_attributes["bias"].value == 1.0
    assert n00.model_attributes["threshold"].value == 1.0
    assert n00.log_spikes and n00.log_potential
    # second group uses an alternate soma h/w
    assert net.groups["1"].neurons[2].soma_hw_name == "demo_soma_alt"
    # edges with weights
    edges = net.groups["0"].neurons[0].edges_out
    assert len(edges) == 1
    assert edges[0].post_neuron.info() == "1.0"
    assert edges[0].synapse_attributes["weight"].value == -1.0
    # embedded flow-style attributes: n 1.0 { bias: 0 }
    assert net.groups["1"].neurons[0].model_attributes["bias"].value == 0
    # all six neurons mapped
    mapped = sum(
        1
        for g in net.groups.values()
        for neuron in g
        if neuron.core_address is not None
    )
    assert mapped == 6


def test_netlist_roundtrip(example_arch):
    net = sf.load_net(
        REF / "snn" / "example.net", example_arch, use_netlist_format=True
    )
    buf = io.StringIO()
    write_netlist(buf, net)
    net2 = parse_netlist_file(buf.getvalue(), example_arch)
    for name in net.groups:
        g1, g2 = net.groups[name], net2.groups[name]
        assert len(g1.neurons) == len(g2.neurons)
        for n1, n2 in zip(g1.neurons, g2.neurons):
            assert len(n1.edges_out) == len(n2.edges_out)
            assert (n1.core_address is None) == (n2.core_address is None)
            for e1, e2 in zip(n1.edges_out, n2.edges_out):
                assert e1.post_neuron.info() == e2.post_neuron.info()


def test_netlist_indexed_attributes():
    """Bracketed keys are literal attribute names, NOT list syntax — the
    reference netlist parser has no index notation, so the multitap model
    never recognizes time_constant[0] and keeps zero constants (verified
    against the reference binary; tests/test_reference_parity.py)."""
    arch = sf.load_arch(REF / "arch" / "demo_with_dendrites.yaml")
    net = sf.load_net(
        REF / "snn" / "dendrite.net", arch, use_netlist_format=True
    )
    attrs = net.groups["0"].neurons[0].model_attributes
    assert attrs["taps"].value == 3
    assert "time_constants" not in attrs
    assert attrs["time_constant[0]"].value == 0.8
    assert attrs["space_constant[1]"].value == 0.2
    # per-edge tap routing
    taps = [
        e.dendrite_attributes["tap"].value
        for n in net.groups["0"].neurons
        for e in n.edges_out
        if "tap" in e.dendrite_attributes
    ]
    assert taps[:2] == [0, 1]


def test_netlist_sim_runs(example_arch):
    net = sf.load_net(
        REF / "snn" / "example.net", example_arch, use_netlist_format=True
    )
    chip = sf.SpikingChip(example_arch)
    chip.load(net)
    result = chip.sim(10, timing_model="simple", heartbeat=0)
    assert result["neurons_fired"] > 0
    assert result["energy"]["total"] > 0


def test_netlist_errors(example_arch):
    with pytest.raises(DescriptionParsingError):
        parse_netlist_file("q 3\n", example_arch)
    with pytest.raises(DescriptionParsingError):
        parse_netlist_file("n 0.0 bias=1\n", example_arch)  # group undefined
    with pytest.raises(DescriptionParsingError):
        parse_netlist_file("g 1\n& 0.0@99.0\n", example_arch)


def test_cli_runs(tmp_path):
    from sanafe_tpu import cli

    rc = cli.main(
        [
            "-o", str(tmp_path), "-s", "-p", "-t", "simple",
            str(REF / "arch" / "example_chip.yaml"),
            str(REF / "snn" / "example_snn.yaml"),
            "20",
        ]
    )
    assert rc == 0
    assert (tmp_path / "run_summary.yaml").exists()
    assert (tmp_path / "spikes.csv").read_text().startswith("neuron,timestep")
    perf_lines = (tmp_path / "perf.csv").read_text().strip().splitlines()
    assert len(perf_lines) == 21  # header + 20 steps


def test_cli_netlist_flag(tmp_path, capsys):
    from sanafe_tpu import cli

    rc = cli.main(
        [
            "-o", str(tmp_path), "-n", "-t", "simple",
            str(REF / "arch" / "example_chip.yaml"),
            str(REF / "snn" / "example.net"),
            "5",
        ]
    )
    assert rc == 0
    assert "Run finished." in capsys.readouterr().out


def test_cli_bad_args():
    result = subprocess.run(
        [sys.executable, "-m", "sanafe_tpu.cli", "only_two", "args"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=Path(__file__).resolve().parent.parent,
        env=cpu_subprocess_env(),
    )
    assert result.returncode == 1
    assert "Usage" in result.stderr
