"""Multi-device SPMD tests over the virtual 8-device CPU mesh
(sanafe_tpu/parallel; conftest sets xla_force_host_platform_device_count=8).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import sanafe_tpu as sf
from sanafe_tpu.ops.step import make_device_program
from sanafe_tpu.parallel import pad_compiled, shard_program, shard_state


@pytest.fixture(scope="module")
def example_chip():
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    return chip


def _run_chunk(prog, steps):
    state = prog.init_state()
    run = prog.make_scan(steps)
    state, outputs = run(state, np.int64(1))
    jax.block_until_ready(outputs)
    return np.asarray(outputs["stats"], dtype=np.float64)


def test_sharded_matches_single_device(example_chip):
    """The 8-way sharded kernel produces identical per-step stats."""
    n_devices = len(jax.devices())
    assert n_devices == 8
    baseline = _run_chunk(make_device_program(example_chip.compiled), 12)

    padded = pad_compiled(example_chip.compiled, multiple=n_devices)
    prog = make_device_program(padded)
    mesh = Mesh(np.array(jax.devices()), ("cores",))
    with mesh:
        shard_program(prog, mesh)
        state = shard_state(prog.init_state(), mesh)
        run = prog.make_scan(12)
        state, outputs = run(state, np.int64(1))
        jax.block_until_ready(outputs)
    sharded = np.asarray(outputs["stats"], dtype=np.float64)
    # counters exact; energies/latencies to float tolerance (reduction
    # order differs across shards)
    assert np.array_equal(sharded[:, :5], baseline[:, :5])
    np.testing.assert_allclose(sharded[:, 5:], baseline[:, 5:], rtol=1e-12)


def test_padding_slots_are_inert(example_chip):
    """Padding to a non-divisor multiple leaves every reduction unchanged."""
    baseline = _run_chunk(make_device_program(example_chip.compiled), 8)
    padded = pad_compiled(example_chip.compiled, multiple=7)
    padded_stats = _run_chunk(make_device_program(padded), 8)
    assert np.array_equal(padded_stats[:, :5], baseline[:, :5])
    np.testing.assert_allclose(
        padded_stats[:, 5:], baseline[:, 5:], rtol=1e-12
    )


def test_pallas_delivery_interpret_matches_einsum():
    """The activity-gated pallas delivery kernel (interpret mode on CPU)
    matches the dense einsum + segment-sum path exactly."""
    import jax.numpy as jnp

    from sanafe_tpu.ops.pallas_delivery import make_delivery_fn
    from sanafe_tpu.ops.step import build_block_delivery

    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    block = build_block_delivery(chip.compiled)
    assert block is not None and block.weights.shape[0] > 0
    delivery = make_delivery_fn(block, jnp.float64, interpret=True)
    weights = jnp.asarray(block.weights, dtype=jnp.float64)

    rng = np.random.default_rng(7)
    for trial in range(3):
        fired = rng.random((block.n_tiles, block.tile)) < (
            0.0 if trial == 0 else 0.2 * trial
        )
        tiles = jnp.asarray(fired, dtype=jnp.float64)
        got = np.asarray(delivery(tiles, weights))
        xs = tiles[np.asarray(block.src_tiles)]
        y = jnp.einsum("bi,bij->bj", xs, weights)
        expect = np.zeros((block.n_tiles, block.tile))
        np.add.at(expect, np.asarray(block.dest_tiles), np.asarray(y))
        np.testing.assert_allclose(got, expect, rtol=1e-12, atol=0)


def test_sharded_conv_chip_matches_conv_path():
    """A conv-structured chip padded for sharding KEEPS its conv specs
    (pad slots become zero delivery pieces) and must match the
    single-device structured conv path exactly."""
    from sanafe_tpu import network as netmod
    from sanafe_tpu.attributes import Attribute
    from sanafe_tpu.network import Conv2DParameters, NeuronConfiguration

    from helpers import build_arch

    old_threshold = netmod.BULK_EDGE_THRESHOLD
    netmod.BULK_EDGE_THRESHOLD = 1
    try:
        arch = build_arch(n_tiles=2, cores_per_tile=2, max_neurons=128)
        net = sf.Network()
        rng = np.random.default_rng(21)
        g0 = net.create_neuron_group(
            "g0", 4 * 4 * 2,
            NeuronConfiguration(
                model_attributes={
                    "threshold": Attribute(2.0), "reset": Attribute(0.0),
                    "bias": Attribute(1.0), "leak_decay": Attribute(1.0),
                }
            ),
        )
        g1 = net.create_neuron_group(
            "g1", 2 * 2 * 3,
            NeuronConfiguration(
                model_attributes={
                    "threshold": Attribute(4.0), "reset": Attribute(0.0),
                    "bias": Attribute(0.0), "leak_decay": Attribute(1.0),
                }
            ),
        )
        wts = rng.integers(-3, 4, size=3 * 3 * 2 * 3).astype(float)
        g0.connect_neurons_conv2d(
            g1, {"weight": [Attribute(float(w)) for w in wts]},
            Conv2DParameters(
                input_width=4, input_height=4, input_channels=2,
                kernel_width=3, kernel_height=3, kernel_count=3,
            ),
        )
        cores = arch.cores()
        for i, neuron in enumerate(list(g0) + list(g1)):
            neuron.map_to_core(cores[i % len(cores)])
        chip = sf.SpikingChip(arch)
        chip.load(net)
    finally:
        netmod.BULK_EDGE_THRESHOLD = old_threshold

    assert chip.compiled.conv_specs
    prog = make_device_program(chip.compiled)
    assert prog.conv_delivery is not None
    baseline = _run_chunk(prog, 10)

    padded = pad_compiled(chip.compiled, multiple=8)
    assert padded.conv_specs
    prog_p = make_device_program(padded)
    assert prog_p.conv_delivery is not None
    mesh = Mesh(np.array(jax.devices()), ("cores",))
    with mesh:
        shard_program(prog_p, mesh)
        state = shard_state(prog_p.init_state(), mesh)
        run = prog_p.make_scan(10)
        state, outputs = run(state, np.int64(1))
        jax.block_until_ready(outputs)
    sharded = np.asarray(outputs["stats"], dtype=np.float64)
    assert np.array_equal(sharded[:, :5], baseline[:, :5])
    np.testing.assert_allclose(sharded[:, 5:], baseline[:, 5:], rtol=1e-12)


@pytest.mark.slow
def test_sharded_dvs_scale_memory_and_parity():
    """DVS-gesture sharded over the virtual 8-device mesh: the conv
    delivery survives (few-KB filters replicated), the leftover block
    weights and every neuron/edge-sized buffer shard ~8x, and the stats
    match the single-device run."""
    from pathlib import Path

    ref = Path("/root/reference")
    if not (ref / "snn/dvs.yaml").exists():
        pytest.skip("reference fixtures absent")
    arch = sf.load_arch(ref / "arch/loihi.yaml")
    net = sf.load_net(ref / "snn/dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    steps = 5

    baseline = _run_chunk(make_device_program(chip.compiled), steps)

    n_devices = len(jax.devices())
    padded = pad_compiled(chip.compiled, multiple=n_devices)
    assert padded.conv_specs, "conv structure must survive padding"
    prog = make_device_program(padded)
    assert prog.conv_delivery is not None
    mesh = Mesh(np.array(jax.devices()), ("cores",))
    with mesh:
        shard_program(prog, mesh)
        # per-device footprint: every sharded axis holds ~1/n of the rows
        for name, arr in prog.arrays.items():
            shard = arr.addressable_shards[0].data
            if arr.shape and arr.shape[0] >= n_devices and (
                shard.shape[0] * n_devices == arr.shape[0]
            ):
                continue  # sharded ~1/n
            # replicated arrays must be small (indices, filters, costs)
            assert arr.nbytes < 32 * 2**20, (
                f"{name} replicated at {arr.nbytes / 2**20:.1f} MiB"
            )
        if "block_weights" in prog.arrays:
            bw = prog.arrays["block_weights"]
            shard = bw.addressable_shards[0].data
            assert shard.shape[0] * n_devices == bw.shape[0]
        state = shard_state(prog.init_state(), mesh)
        run = prog.make_scan(steps)
        state, outputs = run(state, np.int64(1))
        jax.block_until_ready(outputs)
    sharded = np.asarray(outputs["stats"], dtype=np.float64)
    assert np.array_equal(sharded[:, :5], baseline[:, :5])
    np.testing.assert_allclose(sharded[:, 5:], baseline[:, 5:], rtol=1e-9)
