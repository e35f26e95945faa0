"""Hardware-unit model semantics vs scalar mirrors of the reference C++.

Each mirror function below re-implements the reference model's update rule
directly from the C++ (file:line cited) as plain serial Python, independent
of the JAX kernel. Tests drive the full chip pipeline and compare whole
trajectories. Mirrors the reference's GoogleTest strategy
(tests/unit/test_loihi_lif.cpp etc.)."""

import math

import pytest

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute

from helpers import build_arch, single_neuron_chip, potentials_of, spike_steps_of


# --- scalar mirror of LoihiLifModel::update (src/models.cpp:440-567) ---------
def lif_trajectory(
    steps,
    bias=0.0,
    threshold=0.0,
    leak_decay=1.0,
    input_decay=0.0,
    reset=0.0,
    reset_mode="hard",
    reverse_threshold=0.0,
    reverse_reset=0.0,
    reverse_reset_mode="none",
    refractory_delay=0,
    potential=0.0,
    currents=None,
):
    v, u, rc = potential, 0.0, 0
    out_v, out_fired = [], []
    for t in range(steps):
        fired = False
        current = currents[t] if currents else None
        if t > 0:
            u *= input_decay
            v *= leak_decay
        v = int(v * 64.0) / 64.0
        if rc <= 0:
            v += bias
            u += current if current is not None else 0.0
            v += u
            if v > threshold:
                v = reset if reset_mode == "hard" else v - threshold
                rc = refractory_delay
                fired = True
            if v < reverse_threshold:
                if reverse_reset_mode == "soft":
                    v -= reverse_threshold
                elif reverse_reset_mode == "hard":
                    v = reverse_reset
                elif reverse_reset_mode == "saturate":
                    v = reverse_threshold
        rc = max(0, rc - 1)
        out_v.append(v)
        out_fired.append(fired)
    return out_v, out_fired


# --- scalar mirror of TrueNorthModel::update (src/models.cpp:724-830) --------
def truenorth_trajectory(
    steps,
    bias=0.0,
    leak=0.0,
    leak_towards_zero=True,
    threshold=0.0,
    reset=0.0,
    reset_mode="hard",
    reverse_threshold=0.0,
    reverse_reset=0.0,
    reverse_reset_mode="none",
    potential=0.0,
    currents=None,
):
    v = potential
    out_v, out_fired = [], []
    for t in range(steps):
        fired = False
        current = currents[t] if currents else None
        if leak_towards_zero:
            if v > 0:
                v -= leak
            elif v < 0:
                v += leak
        else:
            v += leak
        v += bias
        if current is not None:
            v += current
        if v >= threshold:
            if reset_mode == "hard":
                v = reset
            elif reset_mode == "soft":
                v -= threshold
            elif reset_mode == "saturate":
                v = threshold
            fired = True
        elif v <= reverse_threshold:
            if reverse_reset_mode == "hard":
                v = reverse_reset
            elif reverse_reset_mode == "soft":
                v += reverse_threshold
            elif reverse_reset_mode == "saturate":
                v = reverse_threshold
        out_v.append(v)
        out_fired.append(fired)
    return out_v, out_fired


def run_single(attrs, steps, soma_model="leaky_integrate_fire"):
    chip, _ = single_neuron_chip(attrs, soma_model=soma_model)
    result = chip.sim(steps, timing_model="simple", heartbeat=0, spike_trace=True, potential_trace=True)
    return result


@pytest.mark.parametrize(
    "attrs",
    [
        {"bias": 0.5, "threshold": 1.0},
        {"bias": 0.7, "threshold": 1.0, "reset_mode": "soft"},
        {"potential": 1.0, "leak_decay": 0.3, "threshold": 10.0},
        {"bias": 1.1, "threshold": 1.0, "refractory_delay": 2},
        {
            "bias": -0.4,
            "threshold": 10.0,
            "reverse_threshold": -1.0,
            "reverse_reset_mode": "saturate",
        },
        {
            "bias": -0.6,
            "threshold": 10.0,
            "reverse_threshold": -1.0,
            "reverse_reset": 0.25,
            "reverse_reset_mode": "hard",
        },
        {"bias": 0.99, "threshold": 3.0, "leak_decay": 0.9},
    ],
)
def test_lif_matches_reference_mirror(attrs):
    steps = 12
    result = run_single(attrs, steps)
    expect_v, expect_fired = lif_trajectory(steps, **attrs)
    assert potentials_of(result) == pytest.approx(expect_v, abs=1e-12)
    assert spike_steps_of(result) == [
        i + 1 for i, f in enumerate(expect_fired) if f
    ]


@pytest.mark.parametrize(
    "attrs",
    [
        {"bias": 0.5, "threshold": 2.0, "leak": 0.1},
        {"bias": 1.5, "leak": 0.25, "threshold": 4.0, "reset_mode": "soft"},
        {"bias": -1.5, "leak": 0.25, "threshold": 10.0,
         "reverse_threshold": -4.0, "reverse_reset_mode": "hard",
         "reverse_reset": -1.0},
        {"bias": 1.0, "threshold": 2.0, "reset_mode": "saturate"},
        {"bias": 1.0, "threshold": 2.0, "reset_mode": "soft"},
        {
            "bias": -1.0,
            "threshold": 10.0,
            "reverse_threshold": -2.0,
            "reverse_reset_mode": "soft",
            "leak_towards_zero": False,
        },
        {"bias": 0.3, "leak": 0.05, "threshold": 1.0, "leak_towards_zero": True},
    ],
)
def test_truenorth_matches_reference_mirror(attrs):
    steps = 10
    result = run_single(attrs, steps, soma_model="truenorth")
    expect_v, expect_fired = truenorth_trajectory(steps, **attrs)
    assert potentials_of(result) == pytest.approx(expect_v, abs=1e-12)
    assert spike_steps_of(result) == [
        i + 1 for i, f in enumerate(expect_fired) if f
    ]


def _two_neuron_net(arch, pre_attrs, post_attrs, edge_attrs,
                    pre_model_extra=None):
    net = sf.Network()
    pre = net.create_neuron_group(
        "pre",
        1,
        sf.NeuronConfiguration(
            model_attributes={k: Attribute(v) for k, v in pre_attrs.items()},
            soma_hw_name=pre_model_extra or None,
        ),
    )
    post = net.create_neuron_group(
        "post",
        1,
        sf.NeuronConfiguration(
            model_attributes={k: Attribute(v) for k, v in post_attrs.items()},
            log_potential=True,
            log_spikes=True,
        ),
    )
    edge_id = pre[0].connect_to_neuron(post[0])
    edge = pre[0].edges_out[edge_id]
    for key, value in edge_attrs.items():
        edge.synapse_attributes[key] = Attribute(value)
        edge.dendrite_attributes[key] = Attribute(value)
    core = arch.cores()[0]
    pre[0].map_to_core(core)
    post[0].map_to_core(core)
    return net


def test_spike_delivery_delays_one_step():
    """A presynaptic spike at t reaches the soma at t+1 (the timestep
    buffer sits before the soma; src/chip.cpp:717-723)."""
    arch = build_arch()
    # pre fires at t=1,4,7,... (bias accumulates to cross threshold at 3rd)
    net = _two_neuron_net(
        arch,
        {"bias": 1.1, "threshold": 1.0},
        {"threshold": 100.0, "input_decay": 0.0},
        {"weight": 2.5},
    )
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(4, timing_model="simple", heartbeat=0, spike_trace=True, potential_trace=True)
    # pre fires every step (bias 1.1 > threshold 1.0 each step)
    # post potential: current w=2.5 arrives starting t=2
    assert potentials_of(result) == pytest.approx([0.0, 2.5, 5.0, 7.5])


def test_input_spike_train_drives_lif():
    arch = build_arch()
    arch_cores = arch.cores()
    # input soma model available? build arch with an input unit instead:
    arch2 = build_arch(soma_model="leaky_integrate_fire")
    del arch2
    # Use an input-model neuron: needs a soma unit running the input model.
    arch3 = build_arch()
    core = arch3.cores()[0]
    from sanafe_tpu.arch import ModelInfo

    inp = core.create_hardware_unit("input_unit", ModelInfo("input"))
    inp.implements_soma = True
    net = sf.Network()
    pre = net.create_neuron_group(
        "in",
        1,
        sf.NeuronConfiguration(
            model_attributes={"spikes": Attribute([True, False, True, False])},
            soma_hw_name="input_unit",
        ),
    )
    post = net.create_neuron_group(
        "out",
        1,
        sf.NeuronConfiguration(
            model_attributes={"threshold": Attribute(100.0)},
            log_potential=True,
        ),
    )
    edge_id = pre[0].connect_to_neuron(post[0])
    pre[0].edges_out[edge_id].synapse_attributes["weight"] = Attribute(1.5)
    pre[0].map_to_core(core)
    post[0].map_to_core(core)
    chip = sf.SpikingChip(arch3)
    chip.load(net)
    result = chip.sim(5, timing_model="simple", heartbeat=0, spike_trace=True, potential_trace=True)
    # spikes at t=1,3 -> potential bumps at t=2,4 (u persists: decay=0)
    assert potentials_of(result) == pytest.approx([0.0, 1.5, 1.5, 3.0, 3.0])
    assert result["neurons_fired"] == 2  # the two input spikes count as fired


def test_accumulator_with_delay_ring():
    """delay=2 edges deliver 3 steps after firing; undelivered charges are
    only flushed when another message arrives (src/models.cpp:96-131)."""
    arch = build_arch(dendrite_model="accumulator_with_delay")
    net = _two_neuron_net(
        arch,
        {"bias": 1.1, "threshold": 1.0},  # fires every step
        {"threshold": 1e6},
        {"weight": 1.0, "delay": 2},
    )
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(7, timing_model="simple", heartbeat=0, spike_trace=True, potential_trace=True)
    # fire at t: ring[2] += w after shift; delivered w first at t=4,
    # u integrates (input_decay default 0 -> u = delivered each step)
    # post potential at t: adds delivered charge from t-1's message phase
    assert potentials_of(result) == pytest.approx(
        [0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0]
    )


def test_multitap_dendrite_rc_cable():
    """Two-tap RC cable vs scalar mirror (src/models.cpp:167-259)."""
    arch = build_arch(dendrite_model="taps")
    net = sf.Network()
    pre = net.create_neuron_group(
        "pre",
        1,
        sf.NeuronConfiguration(
            model_attributes={
                "bias": Attribute(1.1),
                "threshold": Attribute(1.0),
            }
        ),
    )
    post = net.create_neuron_group(
        "post",
        1,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(1e6),
                "taps": Attribute(2),
                "time_constants": Attribute([0.8, 0.7]),
                "space_constants": Attribute([0.1]),
            },
            log_potential=True,
        ),
    )
    edge_id = pre[0].connect_to_neuron(post[0])
    edge = pre[0].edges_out[edge_id]
    edge.synapse_attributes["weight"] = Attribute(2.0)
    edge.dendrite_attributes["tap"] = Attribute(1)
    core = arch.cores()[0]
    pre[0].map_to_core(core)
    post[0].map_to_core(core)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(6, timing_model="simple", heartbeat=0, spike_trace=True, potential_trace=True)

    # scalar mirror: taps advance once per timestep, input w=2 to tap 1
    # every step (pre fires every step starting t=1, arriving t>=1 msg phase)
    tc, sc = [0.8, 0.7], [0.1]
    taps = [0.0, 0.0]
    delivered = []  # value written to post's buffer at each timestep
    for t in range(6):
        nxt = [taps[0] * tc[0], taps[1] * tc[1]]
        proximal = taps[1] * sc[0]
        nxt[0] += proximal
        nxt[1] -= proximal
        distal = taps[0] * sc[0]
        nxt[1] += distal
        nxt[0] -= distal
        taps = nxt
        taps[1] += 2.0  # message arrives every step
        delivered.append(taps[0])
    # post potential at t integrates delivered tap-0 currents from steps
    # < t through the full LIF update (incl. 1/64 quantization)
    currents = [None] + delivered[:-1]
    expect, _ = lif_trajectory(6, threshold=1e6, currents=currents)
    assert potentials_of(result) == pytest.approx(expect, abs=1e-12)


def test_energy_accounting_per_event():
    """Per-event energies roll up by category (src/chip.cpp:1171-1261)."""
    arch = build_arch(
        soma_costs={
            "energy_access_neuron": 1e-12,
            "energy_update_neuron": 10e-12,
            "energy_spike_out": 100e-12,
            "latency_access_neuron": 1e-9,
            "latency_update_neuron": 0.0,
            "latency_spike_out": 0.0,
        },
        synapse_costs={"energy_process_spike": 7e-12},
    )
    net = _two_neuron_net(
        arch,
        {"bias": 1.1, "threshold": 1.0},
        {"threshold": 1e6},
        {"weight": 1.0},
    )
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(3, timing_model="simple", heartbeat=0)
    # soma: 2 neurons * 3 steps access + pre updated every step (3) +
    # post updated from t2 (2 steps with input) + 3 spikes
    soma = (6 * 1e-12) + (5 * 10e-12) + (3 * 100e-12)
    assert result["energy"]["soma"] == pytest.approx(soma, rel=1e-9)
    # synapse: 3 spikes, 1 edge each
    assert result["energy"]["synapse"] == pytest.approx(3 * 7e-12, rel=1e-9)
    assert result["spikes"] == 3
    assert result["packets_sent"] == 3
    assert result["neurons_fired"] == 3
