"""On-device detailed-timing sweep (ops/device_sweep.py) vs the exact host
sweep.

The device tier must reproduce the host sweep's per-timestep sim_time up to
float round-off from its two documented deviations (tie order, rolling-mean
accumulation order); in float64 on configs without exact sent-timestamp
ties it is bit-exact. Spike rasters and energies never depend on the
timing tier, so only sim_time is compared.
"""

import os

import numpy as np
import pytest

import sanafe_tpu as sf

from pathlib import Path

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "arch").exists(), reason="reference fixtures unavailable"
)


def _sim_times(chip, steps, **kwargs):
    res = chip.sim(steps, timing_model="detailed", heartbeat=0,
                   perf_trace=True, **kwargs)
    return np.asarray(res["perf_trace"]["sim_time"], dtype=np.float64)


def _build(arch_name, snn_name):
    arch = sf.load_arch(REF / "arch" / arch_name)
    net = sf.load_net(REF / "snn" / snn_name, arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    return arch, net, chip


@pytest.mark.parametrize(
    "arch_name,snn_name,steps",
    [
        ("example_chip.yaml", "example_snn.yaml", 100),
        ("loihi.yaml", "conv.yaml", 50),
    ],
)
def test_device_sweep_matches_host(arch_name, snn_name, steps):
    arch, net, chip = _build(arch_name, snn_name)
    host = _sim_times(chip, steps)
    _, _, chip2 = _build(arch_name, snn_name)
    dev = _sim_times(chip2, steps, device_sweep=True)
    np.testing.assert_allclose(dev, host, rtol=1e-9)


def test_device_sweep_energy_and_raster_unchanged(tmp_path):
    arch, net, chip = _build("example_chip.yaml", "example_snn.yaml")
    r1 = chip.sim(100, timing_model="detailed", heartbeat=0,
                  spike_trace=str(tmp_path / "a.csv"))
    _, _, chip2 = _build("example_chip.yaml", "example_snn.yaml")
    r2 = chip2.sim(100, timing_model="detailed", heartbeat=0,
                   device_sweep=True, spike_trace=str(tmp_path / "b.csv"))
    chip.close()
    chip2.close()
    assert r1["energy"] == r2["energy"]
    assert (tmp_path / "a.csv").read_bytes() == (
        tmp_path / "b.csv"
    ).read_bytes()


def test_overflow_falls_back_to_host_sweep(monkeypatch):
    """Steps over the message capacity must be re-swept exactly on the
    host (per-step fallback): those steps are bit-identical to the host
    tier, the rest stay within the device tier's round-off band."""
    monkeypatch.setenv("SANAFE_TPU_SWEEP_CAP", "4")
    arch, net, chip = _build("loihi.yaml", "conv.yaml")
    host = _sim_times(chip, 20)
    _, _, chip2 = _build("loihi.yaml", "conv.yaml")
    dev = _sim_times(chip2, 20, device_sweep=True)
    np.testing.assert_allclose(dev, host, rtol=1e-9)
    # the busy steps (>4 messages) went through the exact host sweep
    busy = host > np.median(host)
    assert busy.any()
    np.testing.assert_array_equal(dev[busy], host[busy])


def test_message_trace_disables_device_sweep(tmp_path):
    """messages.csv needs per-message fields that only the host sweep
    produces; requesting both must transparently use the host tier."""
    arch, net, chip = _build("example_chip.yaml", "example_snn.yaml")
    out = tmp_path / "messages.csv"
    res = chip.sim(10, timing_model="detailed", heartbeat=0,
                   device_sweep=True, message_trace=str(out))
    chip.close()
    assert out.stat().st_size > 0
    assert res["sim_time"] > 0


@pytest.mark.slow
def test_device_sweep_dvs_100():
    """The device tier's congested-workload contract (see the
    ops/merge_sweep.py module docstring): the blocking heuristic is a
    hinge, so summation/tie/retire-order round-off flips it on congested
    steps and moves those steps' sim_time by up to a few percent in either
    direction. Uncongested steps (the majority) match to round-off and the
    signed deviations cancel: the 100-step total must stay well inside the
    1% north-star budget."""
    arch, net, chip = _build("loihi.yaml", "dvs.yaml")
    host = _sim_times(chip, 100)
    _, _, chip2 = _build("loihi.yaml", "dvs.yaml")
    dev = _sim_times(chip2, 100, device_sweep=True)
    np.testing.assert_allclose(dev, host, rtol=5e-2)
    rel = np.abs(dev - host) / host
    assert np.median(rel) < 1e-9
    assert abs(dev.sum() - host.sum()) / host.sum() < 1e-3


def test_merge_sweep_float32_band():
    """The TPU executes the merge kernel in float32 (mosaic argmin/argmax
    lower f32 only). Run the interpret-mode kernel at float32 on the conv
    config and check it stays inside the documented band of the float64
    tier: uncongested steps to f32 round-off, totals well under the 1%
    north-star budget."""
    import jax.numpy as jnp

    from sanafe_tpu.ops.device_sweep import unpack_masks
    from sanafe_tpu.ops.merge_sweep import make_merge_sweep
    from sanafe_tpu.ops.step import make_device_program

    arch, net, chip = _build("loihi.yaml", "conv.yaml")
    prog = make_device_program(chip.compiled, record_fired_axons=True)
    run = prog.make_scan(30)
    _, outputs = run(prog.init_state(), np.int64(1))
    fired, updated = unpack_masks(
        outputs["masks_packed"], chip.compiled.n_neurons
    )
    sim64, need64 = make_merge_sweep(
        chip.compiled, prog.sync_delay, dtype=jnp.float64, interpret=True
    )(fired, updated)
    sim32, need32 = make_merge_sweep(
        chip.compiled, prog.sync_delay, dtype=jnp.float32, interpret=True
    )(fired, updated)
    assert not np.asarray(need64).any()
    assert not np.asarray(need32).any()
    s64 = np.asarray(sim64, dtype=np.float64)
    s32 = np.asarray(sim32, dtype=np.float64)
    np.testing.assert_allclose(s32, s64, rtol=5e-2)
    rel = np.abs(s32 - s64) / s64
    assert np.median(rel) < 1e-5
    assert abs(s32.sum() - s64.sum()) / s64.sum() < 1e-3


def test_device_sweep_stochastic_config():
    """Regression: a fired neuron WITHOUT axons must not reset the
    generation-delay accumulator (its latency flows into the next message
    or the placeholder, src/chip.cpp:624-654)."""
    import os

    fixtures = Path(__file__).parent / "golden_ref" / "fixtures"
    prev = os.getcwd()
    os.chdir(fixtures)  # noise files are cwd-relative
    try:
        def run(flag):
            arch = sf.load_arch(fixtures / "arch_stoch.yaml")
            net = sf.load_net(fixtures / "snn_stoch.yaml", arch)
            chip = sf.SpikingChip(arch)
            chip.load(net)
            return _sim_times(chip, 100, device_sweep=flag)

        host = run(False)
        dev = run(True)
    finally:
        os.chdir(prev)
    np.testing.assert_allclose(dev, host, rtol=1e-12)
