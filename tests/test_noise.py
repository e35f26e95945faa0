"""Stochastic model parity: LIF noise streams, TrueNorth LFSR, Poisson.

RNG replicas themselves are validated against libc / known-answer vectors;
these tests validate the end-to-end plumbing through the chip pipeline
(reference: src/models.cpp:578-651, 745-760, 863-903)."""

import ctypes

import pytest

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.utils.rng import GlibcRand, MT19937, mask_loihi_noise

from helpers import build_arch, potentials_of, spike_steps_of
from test_models import lif_trajectory


def test_glibc_rand_matches_libc():
    libc = ctypes.CDLL("libc.so.6")
    libc.srand(1)
    ours = GlibcRand(1)
    assert [libc.rand() for _ in range(500)] == ours.next_n(500)


def test_mt19937_known_answer():
    mt = MT19937(5489)
    values = [mt.next_u32() for _ in range(10000)]
    assert values[9999] == 4123659995


def test_mask_loihi_noise_sign_extension():
    assert mask_loihi_noise(0x7F) == 127
    assert mask_loihi_noise(0x180) == -128
    assert mask_loihi_noise(0x1FF) == -1
    assert mask_loihi_noise(0x42) == 0x42
    # narrower noise widths keep the fixed 0x100 sign bit (reference quirk)
    assert mask_loihi_noise(0x10F, noise_bits=4) == 15 | ~15


def test_lif_noise_stream(tmp_path):
    noise_file = tmp_path / "noise.txt"
    raw = [64, 0x180, 0, 32, 0x1FF, 5, 64, 0, 0, 16, 8, 4]
    noise_file.write_text("\n".join(str(v) for v in raw) + "\n")
    arch = build_arch(soma_attrs={"noise": str(noise_file)})
    net = sf.Network()
    group = net.create_neuron_group(
        "g",
        1,
        sf.NeuronConfiguration(
            model_attributes={"threshold": Attribute(1e6)},
            log_potential=True,
            log_spikes=True,
        ),
    )
    group[0].map_to_core(arch.cores()[0])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(8, timing_model="simple", heartbeat=0,
                      potential_trace=True, spike_trace=True)
    # mirror: v += masked_noise each step after quantization; no bias
    masked = [mask_loihi_noise(v) for v in raw]
    v = 0.0
    expect = []
    for t in range(8):
        v = int(v * 64.0) / 64.0
        v += masked[t]
        expect.append(v)
    assert potentials_of(result) == pytest.approx(expect, abs=1e-12)


def test_truenorth_lfsr_threshold_noise():
    arch = build_arch(soma_model="truenorth")
    net = sf.Network()
    group = net.create_neuron_group(
        "g",
        1,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(20000.0),
                "random_mask": Attribute(0x7FFF),
                "bias": Attribute(1.0),
            },
            log_potential=True,
            log_spikes=True,
        ),
    )
    group[0].map_to_core(arch.cores()[0])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    steps = 12
    result = chip.sim(steps, timing_model="simple", heartbeat=0,
                      potential_trace=True, spike_trace=True)
    # mirror: v' = v + bias; fired iff v' + (rand() & mask) >= threshold;
    # hard reset applies to the stored (un-noised) potential
    rand = GlibcRand(1)
    v = 0.0
    expect_v, expect_fired = [], []
    for _ in range(steps):
        v += 1.0
        noisy = v + float(rand.next() & 0x7FFF)
        if noisy >= 20000.0:
            v = 0.0
            expect_fired.append(True)
        else:
            expect_fired.append(False)
        expect_v.append(v)
    assert potentials_of(result) == pytest.approx(expect_v, abs=1e-12)
    assert spike_steps_of(result) == [
        i + 1 for i, f in enumerate(expect_fired) if f
    ]
    assert any(expect_fired), "mask should cause some noisy spikes"


def test_poisson_input_spikes():
    arch = build_arch()
    core = arch.cores()[0]
    from sanafe_tpu.arch import ModelInfo

    inp = core.create_hardware_unit("input_unit", ModelInfo("input"))
    inp.implements_soma = True
    net = sf.Network()
    group = net.create_neuron_group(
        "in",
        2,
        sf.NeuronConfiguration(
            model_attributes={"poisson": Attribute(0.5)},
            soma_hw_name="input_unit",
            log_spikes=True,
        ),
    )
    group[0].map_to_core(core)
    group[1].map_to_core(core)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    steps = 20
    result = chip.sim(steps, timing_model="simple", heartbeat=0,
                      spike_trace=True)
    # mirror: unit instance counter starts at 1 for the first input unit;
    # both neurons draw from the same generator in slot order each step
    rng = MT19937(1)
    expect = []
    for t in range(steps):
        fired_this_step = []
        for neuron in range(2):
            if 0.5 > rng.uniform_real():
                fired_this_step.append(neuron)
        expect.append(fired_this_step)
    got = [
        [addr.neuron_offset for addr in row]
        for row in result["spike_trace"].data
    ]
    assert got == expect
    assert sum(len(row) for row in expect) > 5  # statistically certain
