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


def test_misc_dvs_conversion(tmp_path):
    import numpy as np

    from misc_dvs_conversion import main

    npz = tmp_path / "filters.npz"
    np.savez(
        npz,
        conv1=np.arange(8).reshape(2, 2, 1, 2),
        conv2=np.ones((2, 2, 2, 1)),
        inputs=np.array([3, 1, 4]),
    )
    out = tmp_path / "out.yaml"
    rc = main(["snn.yaml", str(npz), str(out)])
    assert rc == 0
    import yaml

    doc = yaml.safe_load(out.read_text())
    edges = doc["network"]["edges"]
    assert edges[0]["0 -> 1"]["type"] == "conv2d"
    assert edges[0]["0 -> 1"]["weight"] == list(range(8))
    assert doc["neurons"][0] == {0: {"bias": 3}}


def test_queue_transient(tmp_path):
    from queue_transient import main

    out = tmp_path / "queue.png"
    rc = main(["--messages", "50", "--out", str(out)])
    assert rc == 0
    assert out.stat().st_size > 0


def test_queue_transient_bounded():
    from queue_transient import simulate

    # 10 arrivals at t=1..10, service takes 100: the 5-slot buffer fills
    # and stays full (arrivals beyond capacity are dropped)
    times, sizes = simulate([1.0] * 10, [100.0] * 10, buffer_size=5)
    assert max(sizes) == 5
