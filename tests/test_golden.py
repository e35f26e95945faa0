"""Golden regression tests on the reference acceptance fixtures.

Anchors the end-to-end behavior (spikes, counters, energies, detailed
sim_time) of the fixture configs from BASELINE.md — any kernel, compiler,
or scheduler change that shifts results fails here. Values were generated
with float64 on CPU; counters are exact and floats compare to 1e-12
relative.
"""

import pytest

import sanafe_tpu as sf

from pathlib import Path

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference fixtures not available"
)

GOLDEN = [
    # (arch, net, netlist?, steps, spikes, fired, packets, updated,
    #  total energy, detailed sim_time)
    (
        "example_chip.yaml", "example_snn.yaml", False, 100,
        5, 3, 3, 200, 6.440000000000001e-09, 8.440000000000001e-07,
    ),
    (
        "loihi.yaml", "conv.yaml", False, 100,
        297, 330, 297, 933, 2.1965230000000015e-07, 8.039099999999997e-05,
    ),
    (
        "example_chip.yaml", "example.net", True, 100,
        100, 182, 100, 447, 5.828e-08, 5.529000000000001e-06,
    ),
    # dendrite.net values regenerated 2026-08-16 after matching the
    # reference's netlist semantics exactly (indexed keys like
    # time_constant[0] are NOT list syntax — the reference forwards them
    # verbatim and the multitap model ignores them, leaving zero
    # constants); 100-step traces are bit-identical to the reference
    # binary (tests/test_reference_parity.py::cfg4_dendrite_net)
    (
        "demo_with_dendrites.yaml", "dendrite.net", True, 50,
        2, 2, 2, 52, 4.8800000000000005e-09, 7.280000000000001e-07,
    ),
]


@pytest.mark.parametrize(
    "arch_file,net_file,netlist,steps,spikes,fired,packets,updated,"
    "energy,sim_time",
    GOLDEN,
    ids=[f"{g[0]}+{g[1]}" for g in GOLDEN],
)
def test_golden_fixture(
    arch_file, net_file, netlist, steps, spikes, fired, packets, updated,
    energy, sim_time,
):
    arch = sf.load_arch(REF / "arch" / arch_file)
    net = sf.load_net(REF / "snn" / net_file, arch, netlist)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(steps, timing_model="detailed", heartbeat=0)
    assert result["spikes"] == spikes
    assert result["neurons_fired"] == fired
    assert result["packets_sent"] == packets
    assert result["neurons_updated"] == updated
    assert result["energy"]["total"] == pytest.approx(energy, rel=1e-12)
    assert result["sim_time"] == pytest.approx(sim_time, rel=1e-12)


def test_dvs_gesture_smoke():
    """DVS-gesture acceptance workload (loihi.yaml + snn/dvs.yaml,
    18.7k neurons / 3.5M edges), 20 steps detailed with spike traces."""
    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(
        20, timing_model="detailed", spike_trace=True, heartbeat=0
    )
    assert result["spikes"] == 485746
    assert result["neurons_fired"] == 2994
    assert result["packets_sent"] == 31467
    assert result["neurons_updated"] == 66698
    assert result["energy"]["total"] == pytest.approx(
        3.62739205e-05, rel=1e-12
    )
    # sim_time regenerated 2026-08-16 after the detailed sweep matched the
    # reference binary's heap tie ordering and float association exactly
    # (summing the reference's per-step DVS sim_times gives this value;
    # tests/test_reference_parity.py::test_reference_parity_dvs)
    assert result["sim_time"] == pytest.approx(
        0.00023876441746214602, rel=1e-12
    )
    assert [len(x) for x in result["spike_trace"].data[:5]] == [
        0, 21, 7, 28, 24,
    ]


def test_dendrite_yaml_shared_input_unit():
    """dendrite.yaml exercises the shared-input-unit quirk: one spikes
    vector per unit (last-set wins) consumed round-robin by its members
    (src/models.hpp:344-378), so inputs.0 fires at t=1 even though the
    train was written by inputs.2."""
    arch = sf.load_arch(REF / "arch" / "demo_with_dendrites.yaml")
    net = sf.load_net(REF / "snn" / "dendrite.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(10, timing_model="detailed", potential_trace=True,
                      heartbeat=0)
    assert result["neurons_fired"] == 1
    assert result["spikes"] == 1
    potentials = [row[0] for row in result["potential_trace"].data]
    assert potentials[0] == 0.0
    assert potentials[1] == pytest.approx(10.0)


def test_spike_labels_refresh_on_reload(tmp_path):
    """Reloading a different network with the SAME number of logged
    neurons must not stream stale group labels into spikes.csv (the
    label caches were previously invalidated by count only)."""
    from tests.helpers import build_arch
    from sanafe_tpu.attributes import Attribute

    def one_net(group_name):
        net = sf.Network()
        group = net.create_neuron_group(
            group_name,
            1,
            sf.NeuronConfiguration(
                model_attributes={
                    "threshold": Attribute(0.0),
                    "leak_decay": Attribute(1.0),
                    "bias": Attribute(1.0),
                },
                log_spikes=True,
            ),
        )
        return net, group

    arch = build_arch()
    chip = sf.SpikingChip(arch)
    net_a, group_a = one_net("alpha")
    group_a[0].map_to_core(arch.cores()[0])
    chip.load(net_a)
    trace_a = tmp_path / "a.csv"
    chip.sim(3, spike_trace=trace_a, heartbeat=0)
    chip.close()
    assert "alpha.0" in trace_a.read_text()

    net_b, group_b = one_net("beta")
    group_b[0].map_to_core(arch.cores()[0])
    chip.load(net_b, overwrite=True)
    trace_b = tmp_path / "b.csv"
    chip.sim(3, spike_trace=trace_b, heartbeat=0)
    chip.close()
    text_b = trace_b.read_text()
    assert "alpha" not in text_b
    assert "beta.0" in text_b
