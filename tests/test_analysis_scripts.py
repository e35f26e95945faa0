"""End-to-end smoke tests for the analysis/utility scripts (scripts/),
driven on the committed reference-binary golden traces."""

import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).parent.parent / "scripts"
GOLDEN = Path(__file__).parent / "golden_ref"
sys.path.insert(0, str(SCRIPTS))


def test_compare_spiketrains_identical(capsys):
    from compare_spiketrains import main

    rc = main([
        str(GOLDEN / "cfg1_detailed/spikes.csv"),
        str(GOLDEN / "cfg1_detailed/spikes.csv"),
    ])
    assert rc == 0


def test_compare_spiketrains_differs():
    from compare_spiketrains import main

    rc = main([
        str(GOLDEN / "cfg1_detailed/spikes.csv"),
        str(GOLDEN / "cfg_stochastic/spikes.csv"),
    ])
    assert rc != 0


def test_net_to_yaml_roundtrip(tmp_path):
    from net_to_yaml import main

    ref = Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference fixtures absent")
    out = tmp_path / "example.yaml"
    rc = main([
        str(ref / "arch/example_chip.yaml"),
        str(ref / "snn/example.net"),
        str(out),
    ])
    assert rc == 0
    import sanafe_tpu as sf

    arch = sf.load_arch(ref / "arch/example_chip.yaml")
    net = sf.load_net(out, arch)
    assert len(net.groups) > 0


def test_message_analysis(capsys):
    from message_analysis import main

    rc = main([str(GOLDEN / "cfg_stochastic/messages.csv")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "message" in out.lower() or "latency" in out.lower()


def test_plot_messages(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from plot_messages import main

    out = tmp_path / "messages.png"
    rc = main([
        str(GOLDEN / "cfg_stochastic/messages.csv"),
        "--width", "2", "--height", "1", "-o", str(out),
    ])
    assert rc == 0
    assert out.stat().st_size > 0


def test_plot_raster(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from plot_raster import main

    out = tmp_path / "raster.png"
    rc = main([
        str(GOLDEN / "cfg_stochastic/spikes.csv"), "-o", str(out),
    ])
    assert rc == 0
    assert out.stat().st_size > 0
