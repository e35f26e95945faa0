"""Quickstart: build a small SNN programmatically, simulate, and plot.

Run:  python examples/quickstart.py [output_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")

import sanafe_tpu as sf
from sanafe_tpu.viz import plot_energy, plot_raster


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("quickstart_out")
    out.mkdir(parents=True, exist_ok=True)

    # A bundled demo chip (2 tiles x 4 cores) + 3-layer SNN
    arch, net = sf.load_example()
    chip = sf.SpikingChip(arch)
    chip.load(net)

    results = chip.sim(
        64,
        timing_model="detailed",
        spike_trace=True,
        potential_trace=True,
        perf_trace=True,
        heartbeat=0,
    )
    print("energy:", results["energy"])
    print("simulated chip time:", results["sim_time"], "s")
    print("spikes:", results["spikes"], "fired:", results["neurons_fired"])

    ax = plot_raster(results)
    ax.figure.savefig(out / "raster.png", bbox_inches="tight")
    ax = plot_energy(results)
    ax.figure.savefig(out / "energy.png", bbox_inches="tight")
    chip.sim_output_run_summary(out, results)
    print(f"wrote {out}/raster.png, energy.png, run_summary.yaml")


if __name__ == "__main__":
    main()
