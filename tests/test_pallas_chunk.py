"""Whole-chunk Pallas kernel (ops/pallas_chunk.py) vs the XLA scan path.

The kernel itself targets TPU; these tests run it through the Pallas
interpreter on the CPU float32 path and require that counters, spike
rasters, potentials, and state evolution match the XLA ``lax.scan``
reference implementation exactly (energies to f32 tolerance — the kernel
accumulates on device in compensated f32, the scan path on the host in
f64).

Reference behaviors covered: LoihiLif update (src/models.cpp:497-567),
TrueNorth LFSR noise path (src/models.cpp:724-830), Input spike trains
(src/models.cpp:863-903), spike delivery + energy roll-up
(src/chip.cpp:656-708, 1171-1261).
"""

import os

import numpy as np
import pytest

import sanafe_tpu as sf
from sanafe_tpu.ops.pallas_chunk import make_pallas_chunk, plan_chunk
from sanafe_tpu.ops.step import make_device_program

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference"), reason="reference not present"
)

REF_ARCH = "/root/reference/arch/example_chip.yaml"
REF_SNN = "/root/reference/snn/example_snn.yaml"


@pytest.fixture()
def f32(monkeypatch):
    """The pallas path is float32-only; flip the test env to f32."""
    import jax

    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def _sim_both(arch, net, timesteps=100, chunk=50, **kw):
    os.environ["SANAFE_PALLAS_CHUNK"] = "0"
    c1 = sf.SpikingChip(arch)
    c1.load(net)
    a = c1.sim(timesteps, heartbeat=0, chunk=chunk, **kw)
    os.environ["SANAFE_PALLAS_CHUNK"] = "interpret"
    try:
        c2 = sf.SpikingChip(arch)
        c2.load(net)
        b = c2.sim(timesteps, heartbeat=0, chunk=chunk, **kw)
    finally:
        os.environ["SANAFE_PALLAS_CHUNK"] = "0"
    return a, b


def _assert_match(a, b):
    for k in ("spikes", "neurons_fired", "neurons_updated", "packets_sent"):
        assert a[k] == b[k], k
    for k in ("synapse", "dendrite", "soma", "network", "total"):
        ref = a["energy"][k]
        assert abs(ref - b["energy"][k]) <= 1e-6 * max(abs(ref), 1e-30), k
    assert abs(a["sim_time"] - b["sim_time"]) <= 1e-6 * max(
        abs(a["sim_time"]), 1e-30
    )


def test_example_chip_detailed_traces(f32):
    """LIF + Input-train chip: rasters and potentials must match exactly."""
    arch = sf.load_arch(REF_ARCH)
    net = sf.load_net(REF_SNN, arch)
    a, b = _sim_both(
        arch,
        net,
        timing_model="detailed",
        spike_trace=True,
        potential_trace=True,
        neuron_trace=True,
    )
    _assert_match(a, b)
    sa = [
        [(n.group_name, n.neuron_offset) for n in step]
        for step in a["spike_trace"].data
    ]
    sb = [
        [(n.group_name, n.neuron_offset) for n in step]
        for step in b["spike_trace"].data
    ]
    assert sa == sb
    pa = np.asarray(a["potential_trace"].data)
    pb = np.asarray(b["potential_trace"].data)
    assert np.allclose(pa, pb, atol=1e-6)
    ua = np.asarray(a["neuron_trace"].data["u"])
    ub = np.asarray(b["neuron_trace"].data["u"])
    assert np.allclose(ua, ub, atol=1e-6)


def test_simple_timing_sums_only(f32):
    """Sums-only mode (no per-step outputs at all) still books RunData."""
    arch = sf.load_arch(REF_ARCH)
    net = sf.load_net(REF_SNN, arch)
    a, b = _sim_both(arch, net, timing_model="simple")
    _assert_match(a, b)


def test_state_continuity_across_paths(f32):
    """A chip can switch between scan and pallas chunks mid-run."""
    arch = sf.load_arch(REF_ARCH)
    net = sf.load_net(REF_SNN, arch)
    os.environ["SANAFE_PALLAS_CHUNK"] = "0"
    c1 = sf.SpikingChip(arch)
    c1.load(net)
    a1 = c1.sim(50, heartbeat=0, chunk=50)
    a2 = c1.sim(50, heartbeat=0, chunk=50)
    c2 = sf.SpikingChip(arch)
    c2.load(net)
    b1 = c2.sim(50, heartbeat=0, chunk=50)
    os.environ["SANAFE_PALLAS_CHUNK"] = "interpret"
    try:
        b2 = c2.sim(50, heartbeat=0, chunk=50)
    finally:
        os.environ["SANAFE_PALLAS_CHUNK"] = "0"
    _assert_match(a1, b1)
    _assert_match(a2, b2)


def test_truenorth_noise_plane(f32):
    """TrueNorth + LFSR threshold noise via the additive plane.

    Built programmatically: the nemo netlists put ``log_spikes``/``log_v``
    on 'n' lines, which the reference binary itself rejects (the per-neuron
    netlist parser keeps reserved keys in model_attributes,
    src/netlist.cpp:489, and Neuron::set_attributes throws,
    src/network.cpp:119-125). Topology mirrors
    snn/nemo/truenorth_bursting.net with an added LFSR random_mask so the
    noise feed plane is exercised."""
    from sanafe_tpu.attributes import Attribute

    arch = sf.load_arch("/root/reference/arch/truenorth.yaml")
    net = sf.Network()
    params = [
        dict(threshold=300.0, reset=0.0, reverse_threshold=0.0,
             reverse_reset=0.0, leak_bias=0.0, reset_mode="hard",
             reverse_reset_mode="none", bias=1.0, random_mask=0xFF),
        dict(threshold=18.0, reset=1.0, reverse_threshold=0.0,
             reverse_reset=1.0, leak_bias=-1.0, reset_mode="hard",
             reverse_reset_mode="saturate", bias=0.0, random_mask=0x7),
        dict(threshold=6.0, reset=0.0, reverse_threshold=0.0,
             reverse_reset=0.0, leak_bias=0.0, reset_mode="hard",
             reverse_reset_mode="saturate", bias=0.0),
    ]
    groups = []
    for i, p in enumerate(params):
        p["force_update"] = True
        groups.append(net.create_neuron_group(
            str(i), 1,
            sf.NeuronConfiguration(
                model_attributes={k: Attribute(v) for k, v in p.items()},
                soma_hw_name="core_soma",
                default_synapse_hw_name="core_synapses",
                log_spikes=True,
            ),
        ))
    groups[0][0].connect_to_neuron(groups[1][0], {"w": Attribute(1.0)})
    groups[0][0].connect_to_neuron(groups[2][0], {"w": Attribute(0.0)})
    groups[1][0].connect_to_neuron(groups[2][0], {"w": Attribute(1.0)})
    groups[2][0].connect_to_neuron(groups[1][0], {"w": Attribute(-100.0)})
    core = arch.cores()[0]
    for g in groups:
        g[0].map_to_core(core)
    a, b = _sim_both(arch, net, timesteps=20, chunk=20,
                     timing_model="simple", spike_trace=True)
    _assert_match(a, b)
    sa = [
        [(n.group_name, n.neuron_offset) for n in step]
        for step in a["spike_trace"].data
    ]
    sb = [
        [(n.group_name, n.neuron_offset) for n in step]
        for step in b["spike_trace"].data
    ]
    assert sa == sb


def test_ineligible_program_falls_back(f32):
    """Programs outside the supported envelope return None from the
    builder (and chip.sim silently uses the scan path)."""
    arch = sf.load_arch("/root/reference/arch/demo_with_dendrites.yaml")
    net = sf.load_net("/root/reference/snn/dendrite.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    prog = make_device_program(chip.compiled, record_fired_axons=True)
    # multi-compartment dendrites use per-edge state -> no dense delivery
    assert plan_chunk(prog) is None
    assert make_pallas_chunk(prog, 64) is None
