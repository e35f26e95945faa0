"""NeMo head-to-head throughput benchmark (TCAD'25 experiment).

TPU-native rewrite of /root/reference/scripts/tcad2025/compare_nemo_perf.py:
builds the same randomized TrueNorth workload (every 256-compartment core
full, every neuron forced to fire each tick, one outgoing synapse per
neuron — 80% to a random OTHER core, 20% to its own), times this
simulator on increasing core counts, optionally shells out to a NeMo
binary for the other bar, writes the cores/SANA-FE/NeMo CSV, and renders
the grouped throughput bar chart.

The reference builds the network one `connect_to_neuron` call at a time
(its ~260k-neuron top case takes minutes in Python); here the same
statistics come from one vectorized sparse hyperedge, so the largest
configuration builds in seconds.

Usage:
  python scripts/tcad2025/compare_nemo_perf.py --out-dir /tmp/nemo \
      [--core-counts 32,64,128] [--timesteps 10] [--nemo-bin PATH] [--plot]
"""

from __future__ import annotations

import argparse
import csv
import subprocess
import time
from pathlib import Path

import numpy as np

import sanafe_tpu as sf

TRUENORTH_COMPARTMENTS = 256
TRUENORTH_AXONS = TRUENORTH_COMPARTMENTS
SPIKE_INTRA_CORE_PROB = 0.8  # kept the reference's (inverted) name
REF_ARCH = Path("/root/reference/arch/truenorth.yaml")


def create_nemo_network(arch, core_count: int, seed: int = 1):
    """The reference's randomized network, statistically: neuron n on core
    c sends one weight-1 synapse to a random axon on a random other core
    with probability 0.8, else to its own core
    (compare_nemo_perf.py:52-101)."""
    rng = np.random.default_rng(seed)
    n = core_count * TRUENORTH_COMPARTMENTS
    net = sf.Network()
    group = net.create_neuron_group(
        "tn", n,
        {
            "log_spikes": False,
            "log_potential": False,
            "force_update": True,
            "threshold": 0.0,
            "reset": -1.0,
            "leak": 0.0,
            "soma_hw_name": "core_soma",
            "synapse_hw_name": "core_synapses",  # the unit's actual name in arch/truenorth.yaml:44 (the reference script's "core_synapse" fails its own get_hw lookup, src/core.cpp:85-95)
        },
    )
    src = np.arange(n)
    src_core = src // TRUENORTH_AXONS
    other = rng.random(n) < SPIKE_INTRA_CORE_PROB
    # a random core excluding the source core: draw 0..count-2 and step
    # over the source core index
    draw = rng.integers(0, max(core_count - 1, 1), size=n)
    dest_core = np.where(other, draw + (draw >= src_core), src_core)
    dest_axon = rng.integers(0, TRUENORTH_AXONS, size=n)
    dest = dest_core * TRUENORTH_AXONS + dest_axon
    group.connect_neurons_sparse(
        group,
        {"weight": np.ones(n).tolist()},
        list(zip(src.tolist(), dest.tolist())),
    )

    cores = [
        core
        for tile in arch.tiles
        for core in tile.cores
    ]
    for i, neuron in enumerate(group.neurons):
        neuron.map_to_core(cores[i // TRUENORTH_COMPARTMENTS])
    return net


def run_sim_sanafe(arch_path: Path, core_count: int, timesteps: int) -> float:
    arch = sf.load_arch(arch_path)
    snn = create_nemo_network(arch, core_count)
    chip = sf.SpikingChip(arch)
    chip.load(snn)
    start = time.time()
    chip.sim(timesteps, heartbeat=0)
    run_time = time.time() - start
    print(f"sanafe runtime for {core_count} cores was {run_time} s")
    return run_time


def run_sim_nemo(nemo_bin: str, core_count: int, timesteps: int) -> float:
    """Shell out to a NeMo build (compare_nemo_perf.py:123-146); only
    meaningful on a machine that has one."""
    cmd = [
        "mpirun", "-np", "12", nemo_bin, f"--core_count={core_count}",
        f"--end={timesteps}", "--sync=3", "--rand",
    ]
    print("NeMo command:", " ".join(cmd))
    start = time.time()
    subprocess.call(cmd)
    run_time = time.time() - start
    print(f"nemo runtime for {core_count} cores was {run_time} s")
    return run_time


def plot_results(csv_path: Path, out_dir: Path, timesteps: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    rows = list(csv.DictReader(csv_path.open()))
    cores = [int(r["cores"]) for r in rows]
    sanafe_t = np.array([float(r["SANA-FE"]) for r in rows])
    nemo_t = np.array([float(r["NeMo"]) for r in rows])
    entries = len(cores)
    plt.rcParams.update({"font.size": 6, "lines.markersize": 1})
    plt.figure(figsize=(3.7, 1.4))
    with np.errstate(divide="ignore"):
        nemo_thr = np.where(nemo_t > 0, timesteps / nemo_t, 0.0)
        sanafe_thr = np.where(sanafe_t > 0, timesteps / sanafe_t, 0.0)
    bars = [
        plt.bar(np.arange(entries) - 0.15, nemo_thr, width=0.3),
        plt.bar(np.arange(entries) + 0.15, sanafe_thr, width=0.3,
                alpha=0.99),
    ]
    plt.legend(("NeMo", "SANA-FE"))
    for bar, thr in zip(bars, (nemo_thr, sanafe_thr)):
        for rect, value in zip(bar, thr):
            plt.text(rect.get_x() + rect.get_width() / 2.0,
                     rect.get_height(), f"{value:.1f}",
                     ha="center", va="bottom")
    ax = plt.gca()
    plt.xlabel("TrueNorth Core Count / Total Neurons")
    ax.set_xticks(np.arange(entries))
    ax.set_xticklabels(
        f"{c}/{c * TRUENORTH_COMPARTMENTS // 1000}k" for c in cores
    )
    plt.ylabel("Throughput (steps per s)")
    plt.tight_layout(pad=0.3)
    plt.savefig(out_dir / "compare_sanafe_nemo.png")
    plt.savefig(out_dir / "compare_sanafe_nemo.pdf")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arch", type=Path, default=REF_ARCH)
    parser.add_argument("--out-dir", type=Path, default=Path("runs/nemo"))
    parser.add_argument("--core-counts", default="32,64,128,256,512,1024")
    parser.add_argument("--timesteps", type=int, default=10)
    parser.add_argument("--nemo-bin", default=None,
                        help="path to a NeMo binary for the second bar")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args(argv)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    core_counts = [int(c) for c in args.core_counts.split(",")]

    csv_path = args.out_dir / "compare_sanafe_nemo.csv"
    with csv_path.open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(("cores", "SANA-FE", "NeMo"))
        for cores in core_counts:
            print(f"Running simulation of {cores} cores")
            sanafe_time = run_sim_sanafe(args.arch, cores, args.timesteps)
            nemo_time = (
                run_sim_nemo(args.nemo_bin, cores, args.timesteps)
                if args.nemo_bin
                else 0.0
            )
            writer.writerow((cores, sanafe_time, nemo_time))
    print(f"Saved results to {csv_path}")
    if args.plot:
        plot_results(csv_path, args.out_dir, args.timesteps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
