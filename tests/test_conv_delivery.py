"""Structured conv2d spike delivery (ops/step.py ConvDelivery).

The reference expands conv2d hyperedges into individual edges
(src/network.cpp:377-528); the structured path instead runs each hyperedge
as one strided convolution on the device, keeping the flat edge arrays for
axons/counters/timing. These tests require the conv path to match the
block-matmul path EXACTLY in float64 (integer-valued weights make the
accumulation order irrelevant in f64 for these fixtures).
"""

import os

import numpy as np
import pytest

import sanafe_tpu as sf
from sanafe_tpu import network as netmod
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.network import Conv2DParameters, NeuronConfiguration
from sanafe_tpu.ops.step import build_conv_delivery, make_device_program

from helpers import build_arch


@pytest.fixture()
def low_bulk_threshold(monkeypatch):
    """Force even tiny conv hyperedges through the bulk (structured)
    lowering so the conv delivery path builds."""
    monkeypatch.setattr(netmod, "BULK_EDGE_THRESHOLD", 1)


def _sim_both(arch, net, timesteps=30, **kw):
    os.environ["SANAFE_CONV_DELIVERY"] = "0"
    try:
        c1 = sf.SpikingChip(arch)
        c1.load(net)
        a = c1.sim(timesteps, heartbeat=0, **kw)
    finally:
        os.environ["SANAFE_CONV_DELIVERY"] = "1"
    c2 = sf.SpikingChip(arch)
    c2.load(net)
    assert c2.compiled.conv_specs, "expected structured conv specs"
    b = c2.sim(timesteps, heartbeat=0, **kw)
    return a, b


def _assert_exact(a, b):
    for k in ("spikes", "neurons_fired", "neurons_updated", "packets_sent"):
        assert a[k] == b[k], k
    assert a["energy"]["total"] == b["energy"]["total"]
    assert a["sim_time"] == b["sim_time"]


def _raster(result):
    return [
        [(n.group_name, n.neuron_offset) for n in step]
        for step in result["spike_trace"].data
    ]


def _build_conv_net(rng, in_w=6, in_h=6, in_c=2, k=3, out_c=3, stride=1,
                    dense_tail=True):
    """input grid -> conv -> conv(stride) -> optional small dense head,
    integer weights; biases make layer 0 fire on its own."""
    net = sf.Network()
    n_in = in_w * in_h * in_c
    g0 = net.create_neuron_group(
        "g0", n_in,
        NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(2.0),
                "reset": Attribute(0.0),
                "bias": Attribute(1.0),
                "leak_decay": Attribute(1.0),
            }
        ),
    )
    out_w = (in_w - k) // stride + 1
    out_h = (in_h - k) // stride + 1
    g1 = net.create_neuron_group(
        "g1", out_w * out_h * out_c,
        NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(5.0),
                "reset": Attribute(0.0),
                "bias": Attribute(0.0),
                "leak_decay": Attribute(1.0),
            }
        ),
    )
    wts = rng.integers(-3, 4, size=k * k * in_c * out_c).astype(float)
    g0.connect_neurons_conv2d(
        g1,
        {"weight": [Attribute(float(w)) for w in wts]},
        Conv2DParameters(
            input_width=in_w, input_height=in_h, input_channels=in_c,
            kernel_width=k, kernel_height=k, kernel_count=out_c,
            stride_width=stride, stride_height=stride,
        ),
    )
    groups = [g0, g1]
    if dense_tail:
        g2 = net.create_neuron_group(
            "g2", 4,
            NeuronConfiguration(
                model_attributes={
                    "threshold": Attribute(3.0),
                    "reset": Attribute(0.0),
                    "bias": Attribute(0.0),
                    "leak_decay": Attribute(1.0),
                }
            ),
        )
        dw = rng.integers(-2, 3, size=len(g1) * 4).astype(float)
        g1.connect_neurons_dense(
            g2, {"weight": [Attribute(float(w)) for w in dw]}
        )
        groups.append(g2)
    return net, groups


def _map_all(arch, groups, spread=True):
    cores = arch.cores()
    i = 0
    for g in groups:
        for neuron in g:
            neuron.map_to_core(cores[i % len(cores)] if spread else cores[0])
            i += 1


def test_conv_vs_block_exact(low_bulk_threshold):
    """conv + dense-tail net: counters, energy, timing, raster all equal."""
    arch = build_arch(n_tiles=2, cores_per_tile=2, max_neurons=256)
    rng = np.random.default_rng(7)
    net, groups = _build_conv_net(rng)
    _map_all(arch, groups)
    a, b = _sim_both(arch, net, timing_model="detailed", spike_trace=True)
    _assert_exact(a, b)
    assert _raster(a) == _raster(b)
    assert a["spikes"] > 0


def test_conv_strided_no_tail(low_bulk_threshold):
    """stride-2 conv without the dense head (no leftover edges at all)."""
    arch = build_arch(n_tiles=2, cores_per_tile=2, max_neurons=256)
    rng = np.random.default_rng(11)
    net, groups = _build_conv_net(rng, in_w=8, in_h=8, stride=2,
                                  dense_tail=False)
    _map_all(arch, groups)
    a, b = _sim_both(arch, net, timing_model="simple", spike_trace=True)
    _assert_exact(a, b)
    assert _raster(a) == _raster(b)


def test_scattered_mapping(low_bulk_threshold):
    """Interleaved core mapping fragments the slot runs; the run-sliced
    gather/assembly must still be exact."""
    arch = build_arch(n_tiles=2, cores_per_tile=2, max_neurons=256)
    rng = np.random.default_rng(3)
    net, groups = _build_conv_net(rng, in_w=5, in_h=5)
    # round-robin across cores => many short slot runs per group
    _map_all(arch, groups, spread=True)
    a, b = _sim_both(arch, net, timing_model="detailed", spike_trace=True)
    _assert_exact(a, b)
    assert _raster(a) == _raster(b)


def test_delay_dendrite_ineligible(low_bulk_threshold):
    """Per-edge delay state keeps the scatter path: no conv delivery."""
    arch = build_arch(dendrite_model="accumulator_with_delay")
    rng = np.random.default_rng(5)
    net, groups = _build_conv_net(rng, in_w=4, in_h=4, in_c=1, out_c=2,
                                  dense_tail=False)
    _map_all(arch, groups, spread=False)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    assert chip.compiled.conv_specs  # structure was recorded...
    prog = make_device_program(chip.compiled)
    assert prog.conv_delivery is None  # ...but the program declines it
    assert build_conv_delivery(chip.compiled) is None


@pytest.mark.slow
def test_dvs_conv_vs_block_exact():
    """Flagship DVS-gesture net: 4 conv specs cover 3.55M of 3.56M edges;
    20 detailed steps must match the block path bit-for-bit."""
    if not os.path.exists("/root/reference/snn/dvs.yaml"):
        pytest.skip("reference fixtures absent")
    arch = sf.load_arch("/root/reference/arch/loihi.yaml")
    net = sf.load_net("/root/reference/snn/dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    assert len(chip.compiled.conv_specs) == 4
    assert int(chip.compiled.edge_from_conv.sum()) == 3554640
    a, b = _sim_both(arch, net, timesteps=20, timing_model="detailed",
                     spike_trace=True)
    _assert_exact(a, b)
    assert _raster(a) == _raster(b)


def test_conv_chip_cycle_timing(low_bulk_threshold):
    """The flit-level cycle tier consumes the conv path's packed masks;
    its per-step times must be >= the sync floor and the run must agree
    with the block path exactly."""
    arch = build_arch(n_tiles=2, cores_per_tile=2, max_neurons=256)
    rng = np.random.default_rng(13)
    net, groups = _build_conv_net(rng, in_w=5, in_h=5)
    _map_all(arch, groups)
    a, b = _sim_both(arch, net, timesteps=15, timing_model="cycle",
                     spike_trace=True)
    _assert_exact(a, b)
    assert _raster(a) == _raster(b)
    assert a["sim_time"] > 0
