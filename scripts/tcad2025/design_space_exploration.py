"""Architecture design-space exploration (TCAD'25 experiment).

TPU-native rewrite of the reference's core-count sweep
(/root/reference/scripts/tcad2025/design_space_exploration.py): for a
fixed total compartment budget, vary the number of cores on a Loihi-style
chip (8 .. 512 cores) and record each design point's total energy and
simulated latency on the Latin-squares CSP workload (and optionally the
DVS-gesture network, remapped greedily per design).

The arch description is patched in-memory — tile range and NoC
width/height — exactly as the reference script edits the parsed YAML.

Usage:
  python scripts/tcad2025/design_space_exploration.py \
      [--n 9] [--steps 512] [--dvs] [--out dse_results.csv]
"""

from __future__ import annotations

import argparse
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

import sanafe_tpu as sf
from latin_squares import build_noisy_loihi, latin_square_network

REF = Path("/root/reference")

# (cores, compartments/core, noc width, noc height) — constant total
# compartment budget, as in the paper
DESIGNS = [
    (8, 16384, 1, 4),
    (16, 8192, 1, 4),
    (32, 4096, 2, 4),
    (64, 2048, 4, 4),
    (128, 1024, 8, 4),
    (256, 512, 16, 4),
    (512, 256, 32, 4),
]
CORES_PER_TILE = 4


def patch_arch_text(text: str, cores: int, compartments: int, width: int,
                    height: int) -> str:
    """Rewrite the tile range, NoC dimensions, and per-core compartment
    budget of a Loihi-style arch description."""
    tiles = cores // CORES_PER_TILE
    text = re.sub(
        r"name: loihi_tile\[0\.\.\d+\]",
        f"name: loihi_tile[0..{tiles - 1}]",
        text,
    )
    text = re.sub(r"width: \d+", f"width: {width}", text, count=1)
    text = re.sub(r"height: \d+", f"height: {height}", text, count=1)
    text = re.sub(
        r"max_neurons_supported: \d+",
        f"max_neurons_supported: {compartments}",
        text,
    )
    return text


def build_design_arch(workdir: Path, base_text: str, cores, compartments,
                      width, height):
    path = workdir / f"loihi_{cores}c.yaml"
    path.write_text(
        patch_arch_text(base_text, cores, compartments, width, height)
    )
    return sf.load_arch(path)


def run_latin(arch, n: int, steps: int, compartments: int):
    net = latin_square_network(n, arch, max_compartments=compartments)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(steps, timing_model="detailed", heartbeat=0)
    return result["energy"]["total"], result["sim_time"]


def load_dvs_unmapped(workdir: Path):
    """The packaged DVS net is mapped for the 128-core Loihi; strip its
    mappings so each design point can remap it greedily."""
    text = (REF / "snn/dvs.yaml").read_text()
    cut = text.find("mappings:")
    if cut != -1:
        text = text[:cut]
    path = workdir / "dvs_unmapped.yaml"
    path.write_text(text)
    return path


def run_dvs(arch, dvs_path: Path, steps: int, compartments: int):
    net = sf.load_net(dvs_path, arch)
    cores = arch.cores()
    core_idx, used = 0, 0
    for group in net.groups.values():
        for neuron in group.neurons:
            if used >= compartments:
                core_idx += 1
                used = 0
            neuron.map_to_core(cores[core_idx])
            used += 1
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(steps, timing_model="detailed", heartbeat=0)
    return result["energy"]["total"], result["sim_time"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9,
                    help="latin square order (paper: 15)")
    ap.add_argument("--steps", type=int, default=512,
                    help="timesteps per design point (paper: 3000)")
    ap.add_argument("--dvs", action="store_true",
                    help="also sweep the DVS-gesture workload")
    ap.add_argument("--out", default="dse_results.csv")
    ap.add_argument(
        "--params", action="store_true",
        help="also run a batched hardware-cost sweep on the 128-core "
             "design (B parameterizations in one device program via "
             "sanafe_tpu.ParameterSweep)",
    )
    args = ap.parse_args()

    rows = ["workload,cores,compartments,energy,latency,wall_s"]
    with tempfile.TemporaryDirectory() as tmp:
        workdir = Path(tmp)
        # Latin runs use the stochastic arch; patch per design
        build_noisy_loihi(workdir)  # writes the patched noise file + arch
        noise_text = (workdir / "loihi_noise_patched.yaml").read_text()
        dvs_text = (REF / "arch/loihi.yaml").read_text()
        dvs_path = load_dvs_unmapped(workdir) if args.dvs else None

        for cores, compartments, width, height in DESIGNS:
            if args.n * args.n * args.n > cores * compartments:
                continue
            arch = build_design_arch(
                workdir, noise_text, cores, compartments, width, height
            )
            t0 = time.perf_counter()
            energy, latency = run_latin(
                arch, args.n, args.steps, compartments
            )
            wall = time.perf_counter() - t0
            rows.append(
                f"latin,{cores},{compartments},{energy:.6e},"
                f"{latency:.6e},{wall:.1f}"
            )
            print(rows[-1])

            if args.dvs:
                arch = build_design_arch(
                    workdir, dvs_text, cores, compartments, width, height
                )
                t0 = time.perf_counter()
                energy, latency = run_dvs(
                    arch, dvs_path, args.steps, compartments
                )
                wall = time.perf_counter() - t0
                rows.append(
                    f"dvs,{cores},{compartments},{energy:.6e},"
                    f"{latency:.6e},{wall:.1f}"
                )
                print(rows[-1])

    Path(args.out).write_text("\n".join(rows) + "\n")
    print(f"wrote {args.out}")

    if args.params:
        # The orthogonal DSE axis: hardware-cost parameterizations of ONE
        # design, batched over a sample axis so all B candidates share a
        # single device program (per-step weights are read once for all).
        with tempfile.TemporaryDirectory() as tmp:
            workdir = Path(tmp)
            build_noisy_loihi(workdir)
            arch = sf.load_arch(workdir / "loihi_noise_patched.yaml")
            net = latin_square_network(args.n, arch)
            chip = sf.SpikingChip(arch)
            chip.load(net)
            c = chip.compiled
            B = 16
            scales = np.linspace(0.25, 4.0, B)
            base = np.asarray(c.soma_energy_update)
            sweep = sf.ParameterSweep(
                chip,
                {"soma_energy_update": base[None, :] * scales[:, None]},
            )
            out = sweep.run(args.steps)
            print("scale,total_energy,sim_time")
            for s, e, t in zip(scales, out["energy"]["total"],
                               out["sim_time"]):
                print(f"{s:.2f},{e:.6e},{t:.6e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
