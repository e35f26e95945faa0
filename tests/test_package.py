"""High-level package tests: layers, data converters, viz, examples
(reference sanafe/layers.py, sanafe/data.py, sanafe/viz, sanafe/_examples.py).
"""

import matplotlib

matplotlib.use("Agg")

from pathlib import Path

import numpy as np
import pytest

import sanafe_tpu as sf
from sanafe_tpu.data import (
    messages_to_dataframe,
    performance_to_dataframe,
    potentials_to_dataframe,
    spikes_to_dataframe,
    spikes_to_raster,
)
from sanafe_tpu.layers import Conv2D, Dense, Input2D


@pytest.fixture(scope="module")
def example_result():
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(
        16,
        timing_model="detailed",
        spike_trace=True,
        potential_trace=True,
        perf_trace=True,
        message_trace=True,
        heartbeat=0,
    )
    return result


def test_example_runs(example_result):
    assert example_result["spikes"] > 0
    assert example_result["energy"]["total"] > 0
    assert example_result["sim_time"] > 0


def test_layers_build_network():
    net = sf.Network()
    inputs = Input2D(net, 4, 4, 1, threshold=1.0)
    weights = np.full((2, 2, 1, 3), 0.5)
    conv = Conv2D(net, inputs, weights, threshold=2.0)
    assert (conv.width, conv.height, conv.channels) == (3, 3, 3)
    assert len(conv) == 27
    dense = Dense(net, conv, 5, np.ones((27, 5)), threshold=3.0)
    assert len(dense) == 5
    # conv edges: 9 positions x 3 filters x 4 kernel entries each
    conv_edges = sum(len(n.edges_out) for n in inputs.group)
    assert conv_edges == 9 * 3 * 4
    dense_edges = sum(len(n.edges_out) for n in conv.group)
    assert dense_edges == 27 * 5
    # weights landed on synapse attributes
    edge = inputs.group[0].edges_out[0]
    assert edge.synapse_attributes["w"].as_float() == 0.5


def test_layers_validation():
    net = sf.Network()
    inputs = Input2D(net, 4, 4, 1)
    with pytest.raises(ValueError, match="4 dimensions"):
        Conv2D(net, inputs, np.ones((2, 2, 1)))
    with pytest.raises(ValueError, match="padding"):
        Conv2D(net, inputs, np.ones((2, 2, 1, 1)), pad_width=1)
    with pytest.raises(ValueError, match="channels mismatch"):
        Conv2D(net, inputs, np.ones((2, 2, 3, 1)))
    with pytest.raises(ValueError, match="shape"):
        Dense(net, inputs, 5, np.ones((3, 5)))


def test_spikes_converters(example_result):
    df = spikes_to_dataframe(example_result)
    assert set(df.columns) == {
        "timestep", "group", "neuron_offset", "neuron_id",
    }
    raster, labels, steps = spikes_to_raster(example_result, n_timesteps=16)
    assert raster.shape == (len(labels), 16)
    assert raster.sum() == len(df)


def test_potentials_converter(example_result):
    df = potentials_to_dataframe(example_result)
    assert df.index.name == "timestep"
    assert len(df) == 16
    assert df.shape[1] == 5  # 4 hidden + 1 out log_potential neurons


def test_performance_converter(example_result):
    df = performance_to_dataframe(example_result)
    assert "sim_time" in df.columns and len(df) == 16


def test_messages_converter(example_result):
    df = messages_to_dataframe(example_result)
    assert {"src_neuron", "src_hw", "dest_hw"}.issubset(df.columns)
    assert (df["mid"] >= -1).all()


def test_viz_plots(example_result, tmp_path):
    from sanafe_tpu.viz import (
        plot_energy,
        plot_message_latency,
        plot_potential_lines,
        plot_raster,
        plot_throughput,
        PUBLICATION_STYLE,
    )

    ax = plot_raster(example_result, style=PUBLICATION_STYLE)
    ax.figure.savefig(tmp_path / "raster.png")
    ax = plot_potential_lines(example_result)
    ax.figure.savefig(tmp_path / "potentials.png")
    ax = plot_energy(example_result)
    ax.figure.savefig(tmp_path / "energy.png")
    ax = plot_throughput(example_result, window=4)
    ax.figure.savefig(tmp_path / "throughput.png")
    ax = plot_message_latency(example_result)
    ax.figure.savefig(tmp_path / "latency.png")
    assert (tmp_path / "raster.png").stat().st_size > 0


def test_example_loaders():
    loihi = sf.load_loihi()
    assert loihi.core_count == 128
    assert loihi.noc_width_in_tiles == 8 and loihi.noc_height_in_tiles == 4


def test_mapped_neuron_runtime_updates():
    """MappedNeuron.set_attributes mutates a loaded chip between sim()
    calls (src/pymodule.cpp:502-527); reset() zeroes all model state."""
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(3, timing_model="simple", heartbeat=0)
    neuron = chip.mapped_neuron_groups["out"][0]
    neuron.set_attributes(
        model_attributes={"potential": 5.0, "bias": 1.0, "threshold": 100.0}
    )
    assert neuron.get_potential() == 5.0
    chip.sim(1, timing_model="simple", heartbeat=0)
    # v + bias + the persisting synaptic input current from the hidden layer
    assert neuron.get_potential() > 6.0
    chip.reset()
    assert neuron.get_potential() == 0.0
    # simulation must run cleanly after a reset: the zeroed state has to
    # keep its dtypes (a bool buffer promoted to int broke the scan carry)
    result = chip.sim(2, timing_model="simple", heartbeat=0)
    assert result["timesteps_executed"] == 2


def test_checkpoint_resume(tmp_path):
    """save_state/load_state round-trips the full device state; resumed
    simulation matches an uninterrupted one exactly."""
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(5, timing_model="simple", heartbeat=0)
    chip.save_state(tmp_path / "ckpt.npz")
    r_direct = chip.sim(5, timing_model="simple", heartbeat=0,
                        potential_trace=True)
    direct = [row for row in r_direct["potential_trace"].data]

    arch2, net2 = sf.load_example()
    chip2 = sf.SpikingChip(arch2)
    chip2.load(net2)
    chip2.load_state(tmp_path / "ckpt.npz")
    assert chip2.total_timesteps == 5
    r_resumed = chip2.sim(5, timing_model="simple", heartbeat=0,
                          potential_trace=True)
    resumed = [row for row in r_resumed["potential_trace"].data]
    assert resumed == direct


def test_checkpoint_resume_orbax(tmp_path):
    """Non-.npz paths use orbax: per-shard directory checkpoints that
    restore with each array's current sharding (the multi-host path)."""
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(5, timing_model="simple", heartbeat=0)
    chip.save_state(tmp_path / "ckpt_orbax")
    r_direct = chip.sim(5, timing_model="simple", heartbeat=0,
                        potential_trace=True)
    direct = [row for row in r_direct["potential_trace"].data]

    arch2, net2 = sf.load_example()
    chip2 = sf.SpikingChip(arch2)
    chip2.load(net2)
    chip2.load_state(tmp_path / "ckpt_orbax")
    assert chip2.total_timesteps == 5
    r_resumed = chip2.sim(5, timing_model="simple", heartbeat=0,
                          potential_trace=True)
    resumed = [row for row in r_resumed["potential_trace"].data]
    assert resumed == direct


def test_checkpoint_orbax_sharded(tmp_path):
    """Sharded device state round-trips through orbax with its
    NamedSharding intact."""
    import jax
    from jax.sharding import Mesh, NamedSharding

    from sanafe_tpu.parallel import shard_state

    from helpers import build_arch
    from sanafe_tpu.attributes import Attribute

    arch = build_arch(n_tiles=2, cores_per_tile=2, max_neurons=8)
    net = sf.Network()
    group = net.create_neuron_group(
        "g", 16,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(2.0),
                "bias": Attribute(1.0),
                "leak_decay": Attribute(0.9),
                "reset": Attribute(0.0),
            }
        ),
    )
    cores = arch.cores()
    for i, neuron in enumerate(group):
        neuron.map_to_core(cores[i % 4])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(3, timing_model="simple", heartbeat=0)
    devices = jax.devices("cpu")[:4]
    mesh = Mesh(np.array(devices), ("cores",))
    # shard the live state over the mesh, checkpoint, restore
    state = chip._device_state
    chip._device_state = shard_state(state, mesh)
    chip.save_state(tmp_path / "ckpt_sharded")
    before = {k: np.asarray(v) for k, v in chip._device_state.items()}
    chip2 = sf.SpikingChip(arch)
    chip2.load(net)
    chip2._device_state = shard_state(
        {k: jax.numpy.zeros_like(v) for k, v in state.items()}, mesh
    )
    chip2.load_state(tmp_path / "ckpt_sharded")
    for k, v in chip2._device_state.items():
        assert isinstance(v.sharding, NamedSharding), k
        assert np.array_equal(np.asarray(v), before[k]), k
    assert chip2.total_timesteps == 3


def test_load_augments_chip():
    """load(net, overwrite=False) maps an extra network onto remaining
    slots while preserving live state (src/chip.cpp:129-184)."""
    from sanafe_tpu.attributes import Attribute

    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(4, timing_model="simple", heartbeat=0)
    pot_before = chip.mapped_neuron_groups["out"][0].get_potential()

    net2 = sf.Network()
    extra = net2.create_neuron_group(
        "extra", 2,
        sf.NeuronConfiguration(
            model_attributes={
                "bias": Attribute(0.4), "threshold": Attribute(1.0),
            },
            log_spikes=True,
        ),
    )
    for neuron in extra:
        neuron.map_to_core(arch.cores()[5])
    chip.load(net2, overwrite=False)
    assert chip.mapped_neuron_groups["out"][0].get_potential() == pot_before
    result = chip.sim(4, timing_model="simple", heartbeat=0,
                      spike_trace=True)
    extra_spikes = [
        address
        for row in result["spike_trace"].data
        for address in row
        if address.group_name == "extra"
    ]
    assert extra_spikes
    # duplicate group names are rejected
    net3 = sf.Network()
    net3.create_neuron_group("extra", 1)
    with pytest.raises(ValueError, match="unique group names"):
        chip.load(net3, overwrite=False)


def test_optional_perf_columns():
    """Per-tile/core/unit energy+latency perf columns appear when
    log_energy/log_latency flags are set (src/chip.cpp:1520-1555)."""
    import io
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import build_arch
    from sanafe_tpu.attributes import Attribute

    arch = build_arch(
        soma_costs={
            "energy_access_neuron": 1e-12, "energy_update_neuron": 2e-12,
            "energy_spike_out": 3e-12, "latency_access_neuron": 1e-9,
            "latency_update_neuron": 0.0, "latency_spike_out": 0.0,
        },
        synapse_costs={"energy_process_spike": 5e-12},
    )
    core = arch.cores()[0]
    for unit in core.pipeline_hw:
        unit.model_info.log_energy = True
    core.pipeline.log_energy = True
    arch.tiles[0].power_metrics.log_energy = True
    net = sf.Network()
    group = net.create_neuron_group(
        "g", 2,
        sf.NeuronConfiguration(
            model_attributes={
                "bias": Attribute(1.1), "threshold": Attribute(1.0),
            }
        ),
    )
    group[0].connect_to_neuron(group[1], {"weight": 0.1})
    for neuron in group:
        neuron.map_to_core(core)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    buf = io.StringIO()
    chip.sim(3, timing_model="simple", heartbeat=0, perf_trace=buf)
    header = buf.getvalue().splitlines()[0].split(",")
    assert "tile0.core0.soma.energy" in header
    assert "tile0.energy" in header

    chip2 = sf.SpikingChip(arch)
    chip2.load(net)
    result = chip2.sim(3, timing_model="simple", heartbeat=0,
                       perf_trace=True)
    # both neurons fire every step: 2 x (access 1 + update 2 + spike 3) pJ
    assert result["perf_trace"].data["tile0.core0.soma.energy"] == (
        pytest.approx([1.2e-11] * 3)
    )


def test_cycle_model_with_message_trace():
    """Cycle timing + message tracing coexist (records carry the simple
    model's per-message delays while sim_time comes from the NoC model)."""
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(8, timing_model="cycle", message_trace=True,
                      heartbeat=0)
    rows = [m for step in result["message_trace"].data for m in step]
    assert rows
    assert all(m["mid"] >= -1 for m in rows)
    assert result["sim_time"] > 0


def test_checkpoint_covers_delay_ring_state(tmp_path):
    """save_state round-trips per-edge model state (delay rings)."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import build_arch
    from sanafe_tpu.attributes import Attribute

    arch = build_arch(dendrite_model="accumulator_with_delay")
    net = sf.Network()
    pre = net.create_neuron_group(
        "pre", 1,
        sf.NeuronConfiguration(
            model_attributes={
                "bias": Attribute(1.1), "threshold": Attribute(1.0),
            }
        ),
    )
    post = net.create_neuron_group(
        "post", 1,
        sf.NeuronConfiguration(
            model_attributes={"threshold": Attribute(1e6)},
            log_potential=True,
        ),
    )
    edge_id = pre[0].connect_to_neuron(post[0], {"weight": 1.0, "delay": 3})
    del edge_id
    core = arch.cores()[0]
    pre[0].map_to_core(core)
    post[0].map_to_core(core)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(2, timing_model="simple", heartbeat=0)
    chip.save_state(tmp_path / "ring.npz")
    r_direct = chip.sim(6, timing_model="simple", heartbeat=0,
                        potential_trace=True)

    chip2 = sf.SpikingChip(arch)
    chip2.load(net)
    chip2.load_state(tmp_path / "ring.npz")
    r_resumed = chip2.sim(6, timing_model="simple", heartbeat=0,
                          potential_trace=True)
    assert r_resumed["potential_trace"].data == r_direct["potential_trace"].data


def test_keyboard_interrupt_flushes_traces(tmp_path):
    """Ctrl-C between device chunks stops the run but leaves consistent
    totals and flushed trace files (the reference polls SIGINT every
    100 ms; src/pymodule.cpp:638-652)."""
    import pytest

    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    original = chip._build_feeds
    calls = {"n": 0}

    def interrupting_feeds(length):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return original(length)

    chip._build_feeds = interrupting_feeds
    spike_path = tmp_path / "spikes.csv"
    with pytest.raises(KeyboardInterrupt):
        chip.sim(100, chunk=10, spike_trace=spike_path, heartbeat=0)
    # two chunks (20 steps) were issued and drained before the interrupt
    assert chip.total_timesteps == 20
    text = spike_path.read_text()
    assert text.startswith("neuron,timestep")
    assert all(
        int(line.split(",")[1]) <= 20
        for line in text.splitlines()[1:]
        if line
    )
    # the chip remains usable afterwards
    chip._build_feeds = original
    result = chip.sim(10, heartbeat=0)
    assert result["timesteps_executed"] == 10


def test_wire_consolidation_roundtrip_f32():
    """The single-fetch wire buffer (f32 path) must decode to the same
    traces the float64 named-output path produces."""
    import jax

    jax.config.update("jax_enable_x64", False)
    try:
        arch, net = sf.load_example()
        chip = sf.SpikingChip(arch)
        chip.load(net)
        import os

        os.environ["SANAFE_PALLAS_CHUNK"] = "0"  # force the scan+wire path
        try:
            r = chip.sim(50, timing_model="detailed", heartbeat=0,
                         spike_trace=True, potential_trace=True)
        finally:
            del os.environ["SANAFE_PALLAS_CHUNK"]
    finally:
        jax.config.update("jax_enable_x64", True)
    arch2, net2 = sf.load_example()
    chip2 = sf.SpikingChip(arch2)
    chip2.load(net2)
    r2 = chip2.sim(50, timing_model="detailed", heartbeat=0,
                   spike_trace=True, potential_trace=True)
    assert r["spikes"] == r2["spikes"]
    assert r["neurons_fired"] == r2["neurons_fired"]
    a = [[(n.group_name, n.neuron_offset) for n in s]
         for s in r["spike_trace"].data]
    b = [[(n.group_name, n.neuron_offset) for n in s]
         for s in r2["spike_trace"].data]
    assert a == b
    pa = np.asarray(r["potential_trace"].data)
    pb = np.asarray(r2["potential_trace"].data)
    assert np.allclose(pa, pb, atol=1e-5)


def _sparse_spike_chip():
    """8192-neuron chip with log_spikes on every neuron: one group fires
    every step (100 spikes), one every 3rd step (300 more), the rest are
    silent — step counts alternate 100/400 so a small K exercises both the
    index path and the overflow fallback."""
    from helpers import build_arch

    from sanafe_tpu.attributes import Attribute
    from sanafe_tpu.network import NeuronConfiguration

    arch = build_arch(n_tiles=4, cores_per_tile=2, max_neurons=1024)
    net = sf.Network()

    def group(name, n, bias):
        return net.create_neuron_group(
            name, n,
            NeuronConfiguration(
                model_attributes={
                    "threshold": Attribute(1.0),
                    "reset": Attribute(0.0),
                    "bias": Attribute(bias),
                    "leak_decay": Attribute(1.0),
                },
                log_spikes=True,
            ),
        )

    groups = [group("fast", 100, 1.2), group("slow", 300, 0.4),
              group("quiet", 7792, 0.0)]
    cores = arch.cores()
    i = 0
    for g in groups:
        for neuron in g:
            neuron.map_to_core(cores[i % len(cores)])
            i += 1
    chip = sf.SpikingChip(arch)
    chip.load(net)
    return chip, net


def _sparse_spike_run(tmp_path, name, sparse_k, **sim_kw):
    import os

    import jax

    chip, _ = _sparse_spike_chip()
    out = tmp_path / f"{name}.csv"
    os.environ["SANAFE_TPU_SPARSE_SPIKES"] = str(sparse_k)
    os.environ["SANAFE_PALLAS_CHUNK"] = "0"
    jax.config.update("jax_enable_x64", False)
    try:
        chip.sim(40, heartbeat=0, spike_trace=str(out), chunk=20,
                 **sim_kw)
        chip.close()
    finally:
        jax.config.update("jax_enable_x64", True)
        del os.environ["SANAFE_TPU_SPARSE_SPIKES"]
        del os.environ["SANAFE_PALLAS_CHUNK"]
    return out.read_bytes()


def test_sparse_spike_wire_matches_packed(tmp_path):
    """The sparse spike wire (fixed-K index rows + device-resident
    fallback plane, ops/step.py sparse_spike_k) must reproduce spikes.csv
    byte-for-byte against the packed-plane wire, including when most
    steps overflow K (K=16 < every step's count) and on the device-sweep
    tier whose fallback unpacks from masks_device."""
    packed = _sparse_spike_run(tmp_path, "packed", 0)
    assert packed.count(b"\n") > 4000  # real spike volume
    sparse = _sparse_spike_run(tmp_path, "sparse", 512)
    assert sparse == packed
    overflow = _sparse_spike_run(tmp_path, "overflow", 16)
    assert overflow == packed
    sweep = _sparse_spike_run(
        tmp_path, "sweep", 16, timing_model="detailed", device_sweep=True
    )
    assert sweep == packed
    # burst-plane budget smaller than the overflow count: the remainder
    # must fall back to the device gather path and still match
    import os

    os.environ["SANAFE_TPU_SPARSE_OVER"] = "2"
    try:
        tight = _sparse_spike_run(tmp_path, "tight_over", 16)
        os.environ["SANAFE_TPU_SPARSE_OVER"] = "0"
        no_over = _sparse_spike_run(tmp_path, "no_over", 16)
    finally:
        del os.environ["SANAFE_TPU_SPARSE_OVER"]
    assert tight == packed
    assert no_over == packed


def _trace_run(tmp_path, name, env: dict, **sim_kw):
    import os

    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    out = tmp_path / f"{name}.csv"
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        chip.sim(60, heartbeat=0, timing_model="detailed",
                 spike_trace=str(out), **sim_kw)
        chip.close()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return out.read_bytes()


def test_async_trace_writer_byte_identical(tmp_path):
    """spikes.csv written through the background writer thread
    (chip._AsyncTraceWriter) must be byte-identical to the synchronous
    path, including ordering across chunk boundaries."""
    sync = _trace_run(tmp_path, "sync", {"SANAFE_TPU_ASYNC_TRACE": "0"},
                      chunk=16)
    async_ = _trace_run(tmp_path, "async", {"SANAFE_TPU_ASYNC_TRACE": "1"},
                        chunk=16)
    assert len(sync) > 0
    assert async_ == sync


def test_head_taper_chunk_invariance(tmp_path):
    """The tapered first chunk (SANAFE_TPU_HEAD_CHUNK) only re-slices the
    scan; results and trace bytes must not change."""
    tapered = _trace_run(tmp_path, "taper", {"SANAFE_TPU_HEAD_CHUNK": "8"},
                         chunk=30)
    flat = _trace_run(tmp_path, "flat", {"SANAFE_TPU_HEAD_CHUNK": "0"},
                      chunk=30)
    one = _trace_run(tmp_path, "one", {"SANAFE_TPU_HEAD_CHUNK": "0"},
                     chunk=60)
    assert tapered == flat == one


def test_async_trace_writer_propagates_sink_errors():
    """A sink that fails on the writer thread must surface the error from
    sim() (at drain time), not swallow it."""
    class _BrokenStream:
        def write(self, text):
            raise OSError("disk full")

        def flush(self):
            pass

    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    with pytest.raises(OSError, match="disk full"):
        chip.sim(40, heartbeat=0, timing_model="detailed",
                 spike_trace=_BrokenStream(), chunk=16)
    chip.close()
