"""TCAD'25 experiment scripts (scripts/tcad2025/)."""

import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).parent.parent / "scripts" / "tcad2025"
sys.path.insert(0, str(SCRIPTS))

pytestmark = pytest.mark.skipif(
    not Path("/root/reference/arch/loihi_with_noise.yaml").exists(),
    reason="reference fixtures absent",
)


def test_latin_square_small(tmp_path):
    """N=4 solves with the stochastic-LIF WTA dynamics end to end."""
    import sanafe_tpu as sf
    from latin_squares import (
        build_noisy_loihi,
        decode_solution,
        is_latin,
        latin_square_network,
    )

    arch = build_noisy_loihi(tmp_path)
    net = latin_square_network(4, arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(512, timing_model="simple", spike_trace=True,
                      heartbeat=0)
    square = decode_solution(4, result["spike_trace"].data)
    assert square.shape == (4, 4)
    assert is_latin(square), square


def test_is_latin():
    from latin_squares import is_latin

    assert is_latin(np.array([[0, 1], [1, 0]]))
    assert not is_latin(np.array([[0, 1], [0, 1]]))


def test_design_patch():
    from design_space_exploration import patch_arch_text

    text = Path("/root/reference/arch/loihi.yaml").read_text()
    patched = patch_arch_text(text, cores=32, compartments=4096, width=2,
                              height=4)
    assert "loihi_tile[0..7]" in patched
    assert "max_neurons_supported: 4096" in patched
    assert "width: 2" in patched

    import sanafe_tpu as sf

    path = Path("/tmp/_dse_patch_test.yaml")
    path.write_text(patched)
    arch = sf.load_arch(path)
    assert arch.core_count == 32


def test_demo_truenorth_phasic(tmp_path):
    """The phasic experiment spikes on input onsets and holds the
    post-reset saturation floor."""
    import sanafe_tpu as sf
    from demo_truenorth import ARCH, PHASIC, PHASIC_EDGES, build

    arch = sf.load_arch(ARCH)
    net = build(arch, PHASIC, PHASIC_EDGES)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    r = chip.sim(450, timing_model="simple", heartbeat=0, spike_trace=True,
                 potential_trace=True)
    spikes = [(a.group_name, t + 1)
              for t, step in enumerate(r["spike_trace"].data) for a in step]
    # pacemaker (group 0) fires every 200 ticks; neuron 1 phasic-fires
    assert ("0", 200) in spikes and ("0", 400) in spikes
    assert any(g == "1" for g, _ in spikes)
    pots = np.asarray(r["potential_trace"].data)
    assert pots.min() == -15.0  # hard reset value reached


def test_compress_spiketrain(tmp_path):
    sys.path.insert(0, str(SCRIPTS.parent))
    from compress_spiketrain import compress

    src = tmp_path / "spikes.csv"
    src.write_text("neuron,timestep\n1.3,5\n0.2,1\n1.1,2\n")
    out = tmp_path / "train.csv"
    compress(str(src), "1", str(out))
    rows = out.read_text().strip().splitlines()
    assert rows[0].split(",") == ["1", "3"]
    assert rows[1].split(",") == ["2", "5"]


def test_compare_nemo_network_statistics():
    """The randomized NeMo workload: full cores, every neuron one
    outgoing synapse, ~80% of them to a different core."""
    import sanafe_tpu as sf
    from compare_nemo_perf import TRUENORTH_COMPARTMENTS, create_nemo_network

    arch = sf.load_arch("/root/reference/arch/truenorth.yaml")
    net = create_nemo_network(arch, core_count=4, seed=7)
    group = net.groups["tn"]
    n = 4 * TRUENORTH_COMPARTMENTS
    assert len(group.neurons) == n
    edges = [
        (src.offset, edge.post_neuron.neuron_offset)
        for src in group.neurons
        for edge in src.edges_out
    ]
    assert len(edges) == n
    src = np.array([e[0] for e in edges])
    dest = np.array([e[1] for e in edges])
    cross = (src // TRUENORTH_COMPARTMENTS) != (
        dest // TRUENORTH_COMPARTMENTS
    )
    assert 0.7 < cross.mean() < 0.9


def test_compare_nemo_end_to_end(tmp_path):
    from compare_nemo_perf import main

    rc = main([
        "--out-dir", str(tmp_path), "--core-counts", "4",
        "--timesteps", "2", "--plot",
    ])
    assert rc == 0
    assert (tmp_path / "compare_sanafe_nemo.csv").exists()
    assert (tmp_path / "compare_sanafe_nemo.png").stat().st_size > 0
