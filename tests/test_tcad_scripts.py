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
