"""Batched design-space exploration (sanafe_tpu/batch.py).

The batched path runs the SAME `_timestep` under jax.vmap, so counters
must match B sequential sim() calls exactly and float aggregates to the
last ulp (summation grouping differs); any larger divergence is a wiring
bug.
"""

import numpy as np
import pytest

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.batch import ParameterSweep, expand_group_values

from helpers import build_arch


def _build(threshold=2.0):
    arch = build_arch(
        n_tiles=2, cores_per_tile=2, max_neurons=64,
        soma_costs={
            "energy_update_neuron": 2e-12,
            "latency_update_neuron": 1e-9,
            "energy_spike_out": 5e-12,
            "latency_spike_out": 2e-9,
        },
    )
    net = sf.Network()
    rng = np.random.default_rng(9)
    g0 = net.create_neuron_group(
        "a", 24,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(threshold),
                "reset": Attribute(0.0),
                "bias": Attribute(1.0),
                "leak_decay": Attribute(0.9),
            }
        ),
    )
    g1 = net.create_neuron_group(
        "b", 16,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(3.0),
                "reset": Attribute(0.0),
                "bias": Attribute(0.0),
                "leak_decay": Attribute(0.95),
            }
        ),
    )
    w = rng.integers(-2, 4, size=24 * 16).astype(float)
    g0.connect_neurons_dense(g1, {"weight": [Attribute(float(x)) for x in w]})
    cores = arch.cores()
    for i, nrn in enumerate(list(g0) + list(g1)):
        nrn.map_to_core(cores[i % len(cores)])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    return arch, net, chip


def test_batched_matches_sequential():
    arch, net, chip = _build()
    thresholds = [1.5, 2.0, 4.0]
    B = len(thresholds)
    over = expand_group_values(
        chip.compiled, "threshold", {"a": np.asarray(thresholds)}
    )
    sweep = ParameterSweep(chip, {"threshold": over})
    out = sweep.run(40, chunk=16)

    for i, th in enumerate(thresholds):
        arch_i, net_i, chip_i = _build(threshold=th)
        r = chip_i.sim(40, timing_model="simple", heartbeat=0)
        assert out["spikes"][i] == r["spikes"], th
        assert out["neurons_fired"][i] == r["neurons_fired"], th
        assert out["neurons_updated"][i] == r["neurons_updated"], th
        assert out["packets_sent"][i] == r["packets_sent"], th
        for key in ("synapse", "dendrite", "soma", "network", "total"):
            # summation grouping differs (device chunk partials vs one
            # host sum); allow the last ulp
            assert out["energy"][key][i] == pytest.approx(
                r["energy"][key], rel=1e-12
            ), (th, key)
        assert out["sim_time"][i] == pytest.approx(
            r["sim_time"], rel=1e-12
        ), th
    # the sweep must actually differentiate the samples
    assert len(set(out["spikes"].tolist())) > 1


def test_cost_column_override():
    """Hardware-cost sweeps (the TCAD use-case): per-sample soma energies."""
    arch, net, chip = _build()
    n = chip.compiled.n_neurons
    base = np.asarray(chip.compiled.soma_energy_update)
    scales = np.array([1.0, 2.0, 10.0])
    over = base[None, :] * scales[:, None]
    sweep = ParameterSweep(chip, {"soma_energy_update": over})
    out = sweep.run(20)
    # identical dynamics, scaled energy contribution
    assert out["spikes"][0] == out["spikes"][1] == out["spikes"][2]
    soma = out["energy"]["soma"]
    assert soma[1] > soma[0] and soma[2] > soma[1]


def test_cost_override_applies_in_float32():
    """Regression: under the default float32 program the fused roll-up
    bakes cost columns into its matrix; the sweep must disable fusion so
    per-sample cost overrides actually take effect."""
    import jax

    jax.config.update("jax_enable_x64", False)
    try:
        arch, net, chip = _build()
        base = np.asarray(chip.compiled.soma_energy_update)
        over = base[None, :] * np.array([1.0, 4.0])[:, None]
        out = ParameterSweep(chip, {"soma_energy_update": over}).run(20)
        soma = out["energy"]["soma"]
        assert soma[1] > soma[0] * 1.5, soma
    finally:
        jax.config.update("jax_enable_x64", True)


def test_validation_errors():
    arch, net, chip = _build()
    with pytest.raises(KeyError):
        ParameterSweep(chip, {"nonsense": np.zeros((2, 3))})
    with pytest.raises(ValueError):
        ParameterSweep(chip, {})
    with pytest.raises(ValueError):
        ParameterSweep(
            chip, {"threshold": np.zeros((2, 5))}  # wrong trailing shape
        )


def test_expand_group_values_shapes():
    arch, net, chip = _build()
    c = chip.compiled
    out = expand_group_values(c, "bias", {"b": np.array([5.0, 6.0])})
    assert out.shape == (2, c.n_neurons)
    slots_b = np.asarray(c.groups["b"])
    slots_a = np.asarray(c.groups["a"])
    assert (out[0, slots_b] == 5.0).all() and (out[1, slots_b] == 6.0).all()
    assert np.allclose(out[:, slots_a], np.asarray(c.bias)[slots_a])
    with pytest.raises(ValueError):
        expand_group_values(c, "bias", {})
    with pytest.raises(ValueError):
        expand_group_values(
            c, "bias", {"a": np.zeros((2, 3))}  # wrong group width
        )


def test_mesh_sharded_sweep_matches_unsharded():
    """The sample axis shards over the 8-device CPU mesh; results must be
    identical to the single-device batched run (pure data parallelism)."""
    import jax
    from jax.sharding import Mesh

    arch, net, chip = _build()
    over = expand_group_values(
        chip.compiled, "threshold",
        {"a": np.linspace(1.0, 4.0, 8)},
    )
    base = ParameterSweep(chip, {"threshold": over}).run(30)
    mesh = Mesh(np.array(jax.devices()[:8]), ("samples",))
    sharded = ParameterSweep(chip, {"threshold": over}, mesh=mesh).run(30)
    for key in ("spikes", "neurons_fired", "packets_sent"):
        assert np.array_equal(base[key], sharded[key]), key
    np.testing.assert_allclose(
        base["energy"]["total"], sharded["energy"]["total"], rtol=1e-12
    )
    np.testing.assert_allclose(base["sim_time"], sharded["sim_time"],
                               rtol=1e-12)
    with pytest.raises(ValueError):
        ParameterSweep(chip, {"threshold": over[:5]}, mesh=mesh)


def test_conv_chip_sweep_kernel_override():
    """Sweeping a conv FILTER per sample: vmap over the conv delivery
    path with a batched kernel operand."""
    from sanafe_tpu import network as netmod

    old = netmod.BULK_EDGE_THRESHOLD
    netmod.BULK_EDGE_THRESHOLD = 1
    try:
        from sanafe_tpu.network import Conv2DParameters

        arch = build_arch(n_tiles=1, cores_per_tile=2, max_neurons=64)
        net = sf.Network()
        g0 = net.create_neuron_group(
            "g0", 16,
            sf.NeuronConfiguration(model_attributes={
                "threshold": Attribute(0.5), "bias": Attribute(1.0),
                "leak_decay": Attribute(0.0), "reset": Attribute(0.0)}),
        )
        g1 = net.create_neuron_group(
            "g1", 4,
            sf.NeuronConfiguration(model_attributes={
                "threshold": Attribute(3.0), "bias": Attribute(0.0),
                "leak_decay": Attribute(1.0), "reset": Attribute(0.0)}),
        )
        g0.connect_neurons_conv2d(
            g1, {"weight": [Attribute(1.0)] * 9},
            Conv2DParameters(input_width=4, input_height=4,
                             input_channels=1, kernel_width=3,
                             kernel_height=3, kernel_count=1),
        )
        cores = arch.cores()
        for i, nrn in enumerate(list(g0) + list(g1)):
            nrn.map_to_core(cores[i % 2])
        chip = sf.SpikingChip(arch)
        chip.load(net)
    finally:
        netmod.BULK_EDGE_THRESHOLD = old
    assert chip.compiled.conv_specs
    from sanafe_tpu.ops.step import make_device_program

    prog = make_device_program(chip.compiled, fuse=False)
    assert prog.conv_delivery is not None
    # conv_kernel_i is the HWIO filter with an appended all-ones COUNT
    # output channel (arrival counting); scale only the weight channels
    base_kernel = np.asarray(prog.arrays["conv_kernel_0"])
    over = np.stack([base_kernel.copy() for _ in range(3)])
    for i, s in enumerate((0.0, 1.0, 3.0)):
        over[i, ..., :-1] *= s
    out = ParameterSweep(chip, {"conv_kernel_0": over}).run(15)
    # zeroed weights -> g1 never crosses threshold -> fewer firings
    assert out["neurons_fired"][0] < out["neurons_fired"][2]
    # scale 1.0 must match a plain sim
    r = chip.sim(15, timing_model="simple", heartbeat=0)
    assert out["neurons_fired"][1] == r["neurons_fired"]


def test_dynamics_sweep_keeps_fusion_and_matches():
    """Dynamics-only overrides (threshold) keep the fused roll-up engaged
    in float32 and still match per-sample sequential runs on counters."""
    import jax

    jax.config.update("jax_enable_x64", False)
    try:
        arch, net, chip = _build()
        thresholds = np.array([1.5, 4.0])
        over = expand_group_values(
            chip.compiled, "threshold", {"a": thresholds}
        )
        sweep = ParameterSweep(chip, {"threshold": over})
        assert sweep.prog.fused_rollup  # fusion stays on for dynamics
        out = sweep.run(25)
        for i, th in enumerate(thresholds):
            _, _, chip_i = _build(threshold=float(th))
            r = chip_i.sim(25, timing_model="simple", heartbeat=0)
            assert out["spikes"][i] == r["spikes"], th
            assert out["neurons_fired"][i] == r["neurons_fired"], th
    finally:
        jax.config.update("jax_enable_x64", True)
