"""Python plugin model tests (replacing the reference's dlopen plugins,
src/plugins.cpp + plugins/hodgkin_huxley.cpp)."""

import math

import jax.numpy as jnp
import pytest

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.models import get_builtin_models, register_soma_model
from sanafe_tpu.plugins import load_plugin

from helpers import build_arch, potentials_of, spike_steps_of


def _hh_mirror(steps, m, n, h, current):
    """Scalar mirror of plugins/hodgkin_huxley.cpp:100-170."""
    C_m, g_Na, g_K, g_L = 10.0, 1200.0, 360.0, 3.0
    V_Na, V_K, V_L, dt = 50.0, -77.0, 54.387, 0.1
    V = 0.0
    exp = math.exp
    out_v, fired = [], []
    for _ in range(steps):
        an = (0.01 * (V + 55)) / (1 - exp(-0.1 * (V + 55)))
        am = (0.1 * (V + 40)) / (1 - exp(-0.1 * (V + 40)))
        ah = 0.07 * exp(-0.05 * (V + 65))
        bn = 0.125 * exp(-0.01125 * (V + 55))
        bm = 4 * exp(-0.05556 * (V + 65))
        bh = 1 / (1 + exp(-0.1 * (V + 35)))
        pm, pn, ph = am / (am + bm), an / (an + bn), ah / (ah + bh)
        den = g_L + g_K * n**4 + g_Na * (m**3) * h
        tau_v = C_m / den
        v_inf = (
            g_L * V_L + g_K * (n**4) * V_K + g_Na * (m**3) * h * V_Na + current
        ) / den
        prev = V
        V = v_inf + (V - v_inf) * exp(-dt / tau_v)
        m = pm + (m - pm) * exp(-dt * (am + bm))
        n = pn + (n - pn) * exp(-dt * (an + bn))
        h = ph + (h - ph) * exp(-dt * (ah + bh))
        fired.append(prev < 25 and V > 25)
        out_v.append(V)
    return out_v, fired


def test_hodgkin_huxley_registered():
    assert "hodgkin_huxley" in get_builtin_models()


def test_hodgkin_huxley_dynamics():
    arch = build_arch(soma_model="hodgkin_huxley")
    net = sf.Network()
    group = net.create_neuron_group(
        "hh",
        1,
        sf.NeuronConfiguration(
            model_attributes={
                "m": Attribute(0.0529),
                "n": Attribute(0.3177),
                "h": Attribute(0.5961),
                "current": Attribute(300.0),
            },
            log_potential=True,
            log_spikes=True,
        ),
    )
    group[0].map_to_core(arch.cores()[0])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    steps = 40
    result = chip.sim(steps, timing_model="simple", heartbeat=0,
                      potential_trace=True, spike_trace=True)
    expect_v, expect_fired = _hh_mirror(steps, 0.0529, 0.3177, 0.5961, 300.0)
    # XLA's f64 exp is only ~1e-8-relative accurate vs libm, and HH
    # dynamics amplify that — compare at a loose tolerance + exact spikes
    assert potentials_of(result) == pytest.approx(expect_v, abs=5e-4)
    assert spike_steps_of(result) == [
        i + 1 for i, f in enumerate(expect_fired) if f
    ]
    assert len(spike_steps_of(result)) >= 1


def test_custom_registered_model_end_to_end():
    """A user-registered soma model runs through the full pipeline."""

    def always_fire_update(params, state, valid, current, t):
        count = state["count"] + 1.0
        fired = count >= params["period"]
        count = jnp.where(fired, 0.0, count)
        return {"count": count}, fired, jnp.ones_like(fired), count

    register_soma_model(
        "test_periodic",
        always_fire_update,
        params={"period": 3.0},
        state={"count": 0.0},
        attributes={"period": "(float) Fire every N steps."},
    )
    arch = build_arch(soma_model="test_periodic")
    net = sf.Network()
    group = net.create_neuron_group(
        "p",
        1,
        sf.NeuronConfiguration(
            model_attributes={"period": Attribute(2.0)}, log_spikes=True
        ),
    )
    group[0].map_to_core(arch.cores()[0])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(6, timing_model="simple", heartbeat=0, spike_trace=True)
    assert spike_steps_of(result) == [2, 4, 6]


def test_python_plugin_file_loading(tmp_path):
    plugin = tmp_path / "my_model.py"
    plugin.write_text(
        "import jax.numpy as jnp\n"
        "from sanafe_tpu.models import register_soma_model\n"
        "\n"
        "def update(params, state, valid, current, t):\n"
        "    v = state['v'] + params['step']\n"
        "    fired = v > 1.0\n"
        "    v = jnp.where(fired, 0.0, v)\n"
        "    return {'v': v}, fired, jnp.ones_like(fired), v\n"
        "\n"
        "register_soma_model('file_plugin_model', update,\n"
        "                    params={'step': 0.5}, state={'v': 0.0})\n"
    )
    from sanafe_tpu.arch import ModelInfo

    arch = build_arch()
    core = arch.cores()[0]
    unit = core.create_hardware_unit(
        "plugin_soma",
        ModelInfo("file_plugin_model", plugin_library_path=str(plugin)),
    )
    unit.implements_soma = True
    net = sf.Network()
    group = net.create_neuron_group(
        "g",
        1,
        sf.NeuronConfiguration(soma_hw_name="plugin_soma", log_spikes=True),
    )
    group[0].map_to_core(core)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(6, timing_model="simple", heartbeat=0, spike_trace=True)
    assert spike_steps_of(result) == [3, 6]


def test_so_plugin_rejected(tmp_path):
    so = tmp_path / "legacy.so"
    so.write_bytes(b"\x7fELF")
    with pytest.raises(RuntimeError, match="register_soma_model"):
        load_plugin(so)


def test_neurofem_compartments():
    """NeuroFEM PID dynamics with two double-buffered compartments vs a
    scalar mirror (plugins/neurofem.cpp:200-318, sigma_v = 0)."""
    import sanafe_tpu as sf

    arch = build_arch(soma_model="neurofem", dendrite_model="neurofem")
    core0 = arch.cores()[0]
    from sanafe_tpu.arch import ModelInfo

    lif = core0.create_hardware_unit(
        "lif_soma", ModelInfo("leaky_integrate_fire")
    )
    lif.implements_soma = True
    net = sf.Network()
    pre = net.create_neuron_group(
        "pre", 2,
        sf.NeuronConfiguration(
            model_attributes={
                "bias": Attribute(1.1), "threshold": Attribute(1.0),
            },
            soma_hw_name="lif_soma",
        ),
    )
    post = net.create_neuron_group(
        "post", 1,
        sf.NeuronConfiguration(
            model_attributes={
                "lambda_v": Attribute(0.3), "lambda_d": Attribute(0.2),
                "kp": Attribute(2.0), "ki": Attribute(0.5),
                "bias": Attribute(0.1), "threshold": Attribute(100.0),
                "reset": Attribute(0.0), "dt": Attribute(0.01),
            },
            log_potential=True, log_spikes=True,
        ),
    )
    # pre.0 -> compartment 0 (w=2), pre.1 -> compartment 1 (w=3)
    for i, (weight, compartment) in enumerate([(2.0, 0), (3.0, 1)]):
        edge_id = pre[i].connect_to_neuron(post[0])
        edge = pre[i].edges_out[edge_id]
        edge.synapse_attributes["weight"] = Attribute(weight)
        edge.dendrite_attributes["compartment"] = Attribute(compartment)
    for n in list(pre) + list(post):
        n.map_to_core(core0)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    steps = 8
    result = chip.sim(steps, timing_model="simple", heartbeat=0,
                      potential_trace=True, spike_trace=True)

    # scalar mirror: pre fires every step; comp sums arrive next step
    dt, lam_v, lam_d, kp, ki, bias = 0.01, 0.3, 0.2, 2.0, 0.5, 0.1
    u1 = u2 = v = u_int = 0.0
    comp0 = comp1 = 0.0  # arrivals from previous step
    expect = []
    for t in range(steps):
        u1 = u1 - lam_d * dt * u1 + comp0
        u2 = u2 - lam_d * dt * u2 + lam_d * comp1
        u_err = u1 + bias
        u_int += dt * u_err
        v = v - lam_v * dt * v
        v = v + dt * kp * u_err + dt * ki * u_int + dt * u2 - comp1
        expect.append(v)
        comp0, comp1 = 2.0, 3.0  # pre fired this step -> arrives next step
    assert potentials_of(result) == pytest.approx(expect, abs=1e-12)


def test_hodgkin_huxley_with_cycle_timing():
    """BASELINE config 5 equivalent: HH plugin neurons simulated under the
    cycle-accurate NoC timing tier (the reference's Booksim2 tier)."""
    import sanafe_tpu as sf

    arch = build_arch(soma_model="hodgkin_huxley", n_tiles=2,
                      cores_per_tile=2)
    net = sf.Network()
    group = net.create_neuron_group(
        "hh", 3,
        sf.NeuronConfiguration(
            model_attributes={
                "m": Attribute(0.0529), "n": Attribute(0.3177),
                "h": Attribute(0.5961), "current": Attribute(300.0),
            },
            log_spikes=True,
        ),
    )
    cores = arch.cores()
    for i, neuron in enumerate(group):
        neuron.connect_to_neuron(group[(i + 1) % 3], {"weight": 1.0})
        neuron.map_to_core(cores[i % len(cores)])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(40, timing_model="cycle", spike_trace=True,
                      perf_trace=True, heartbeat=0)
    assert result["neurons_fired"] >= 3  # periodic HH spiking
    times = result["perf_trace"].data["sim_time"]
    assert all(t >= 0 for t in times)
    assert result["sim_time"] > 0


def test_neurofem_sigma_v_noise_distribution():
    """sigma_v adds seeded N(0, sigma_v) membrane noise: with every other
    dynamic zeroed, per-step potential increments are iid Gaussian, and
    the stream replays bit-identically for a given seed + timestep
    (counter-based policy documented in models/neurofem.py; the
    reference's random_device seeding is nondeterministic)."""
    import numpy as np

    from sanafe_tpu.models import get_model

    spec = get_model("neurofem")
    n = 64
    sigma = 0.25
    params = {
        "lambda_v": np.zeros(n), "lambda_d": np.zeros(n),
        "sigma_v": np.full(n, sigma), "ki": np.zeros(n),
        "kp": np.zeros(n), "bias": np.zeros(n),
        "threshold": np.full(n, 1e9), "reset": np.zeros(n),
        "dt": np.full(n, 1.0),
    }
    state = {
        "potential": np.zeros(n), "u1": np.zeros(n), "u2": np.zeros(n),
        "u_integrated": np.zeros(n),
    }
    comp = np.zeros((n, 2))
    valid = np.zeros(n, dtype=bool)
    increments = []
    v_prev = np.zeros(n)
    steps = 300
    for t in range(1, steps + 1):
        state, fired, updated, v = spec.soma_update(
            params, state, valid, np.zeros(n), t, comp
        )
        v = np.asarray(v)
        increments.append(v - v_prev)
        v_prev = v
    samples = np.concatenate(increments)
    assert abs(samples.mean()) < 4 * sigma / np.sqrt(samples.size)
    assert samples.std() == pytest.approx(sigma, rel=0.05)
    # replayable: the same timestep yields the same draw
    state2 = {
        "potential": np.zeros(n), "u1": np.zeros(n), "u2": np.zeros(n),
        "u_integrated": np.zeros(n),
    }
    _, _, _, v2 = spec.soma_update(
        params, state2, valid, np.zeros(n), 1, comp
    )
    np.testing.assert_array_equal(np.asarray(v2), increments[0])
